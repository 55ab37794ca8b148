"""Ahead-of-time model export for serving (jax.export / StableHLO).

The reference's only deployment artifact is a pickled torch checkpoint that
must be reloaded through the full model code (reload.py:35-111).  The
TPU-native serving story is an ahead-of-time compiled artifact: the jitted
RGB -> hand+object-mesh inference function — device-fused preprocessing,
encoder, MANO, AtlasNet — serialized as versioned StableHLO with the
weights baked in as constants.  The artifact is self-contained: it can be
deserialized and executed WITHOUT the model code, the checkpoint, or the
config, on any of the platforms it was lowered for.

Exports default to a *symbolic* batch dimension, so one artifact serves any
batch size; pass ``batch_size`` to pin a static batch instead (some very
old jax runtimes cannot ingest symbolic shapes).

Typical use::

    model = DemoModel(exp_dir="checkpoints/exp")
    export_model(model, "model.jaxexp", platforms=("tpu", "cpu"))
    ...
    serve = load_exported("model.jaxexp")
    out = serve(frames_u8, sides, flip)   # dict of verts/joints/objpoints3d
"""

from __future__ import annotations

import os
from typing import Optional, Sequence


def _serve_fn(model):
    """Close the demo inference function over its weights so the export
    bakes them in as constants (the artifact then needs no checkpoint)."""
    import jax

    infer = model._infer
    variables = model._variables

    def serve(frames_u8, sides, flip):
        return infer(variables, frames_u8, sides, flip)

    return jax.jit(serve)


def export_model(
    model,
    out_path: str,
    platforms: Optional[Sequence[str]] = None,
    batch_size: Optional[int] = None,
) -> dict:
    """Serialize ``DemoModel``'s inference function to ``out_path``.

    Args:
      model: a ``DemoModel`` (weights already restored).
      out_path: file to write the serialized artifact to.
      platforms: lowering platforms, e.g. ``("tpu", "cpu")``; defaults to
        the current backend.
      batch_size: pin a static batch; ``None`` exports a symbolic batch
        dimension ``b`` (one artifact, any batch size).
    Returns:
      an info dict (platforms, batch, bytes written).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    size = model.image_size
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    specs = (
        jax.ShapeDtypeStruct((b, size, size, 3), jnp.uint8),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.bool_),
    )
    exp = jexport.export(
        _serve_fn(model),
        platforms=list(platforms) if platforms is not None else None,
    )(*specs)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return {
        "platforms": list(exp.platforms),
        "batch": "symbolic" if batch_size is None else batch_size,
        "image_size": size,
        "bytes": len(blob),
        "out_path": out_path,
    }


def load_exported(path: str):
    """Deserialize an exported artifact into a callable
    ``serve(frames_u8, sides, flip) -> results dict``.

    Needs only jax — no model code, config, or checkpoint."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call
