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

``export_model`` also writes a ``<out>.meta.json`` sidecar (image size +
hand/object mesh faces), which lets ``ExportedModel`` stand in for a full
``DemoModel`` in the demos (``--from_export``) with no checkpoint, config,
or MANO assets on the serving host — and no trace/compile at startup.
"""

from __future__ import annotations

import json
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
    info = {
        "platforms": list(exp.platforms),
        "batch": "symbolic" if batch_size is None else batch_size,
        "image_size": size,
        "bytes": len(blob),
        "out_path": out_path,
    }
    # Demo-rendering sidecar: faces are tiny (1538 hand + ~1.3k object
    # triangles) and make the artifact pair fully self-contained — the
    # serving host needs neither MANO assets nor the atlas config.
    import numpy as np

    meta = {
        "image_size": size,
        "platforms": info["platforms"],
        "batch": info["batch"],
        "hand_faces": np.asarray(model.hand_faces).tolist(),
        "obj_faces": np.asarray(model.obj_faces).tolist(),
    }
    with open(out_path + ".meta.json", "w") as f:
        json.dump(meta, f)
    return info


def load_exported(path: str):
    """Deserialize an exported artifact into a callable
    ``serve(frames_u8, sides, flip) -> results dict``.

    Needs only jax — no model code, config, or checkpoint."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


class ExportedModel:
    """Checkpoint-free demo model backed by a jax.export artifact.

    Drop-in for the surface the demos use from ``DemoModel`` —
    ``predict`` / ``predict_dual`` / ``_infer`` / ``image_size`` /
    ``hand_faces`` / ``obj_faces`` — but built from the serialized
    StableHLO (weights baked in) + its ``.meta.json`` sidecar, so startup
    skips checkpoint restore, model construction, AND the trace/compile of
    a fresh jit (the reference's demos re-instantiate torch from opt.pkl
    every launch, image_demo.py:54-56).  Attention maps need encoder
    intermediates that the artifact does not expose; callers degrade.
    """

    def __init__(self, path: str):
        meta_path = path + ".meta.json"
        if not os.path.exists(meta_path):
            raise FileNotFoundError(
                f"{meta_path} not found: --from_export needs the sidecar "
                "cli.export writes next to the artifact (re-export with a "
                "current cli.export)"
            )
        import numpy as np

        with open(meta_path) as f:
            meta = json.load(f)
        self.image_size = int(meta["image_size"])
        self.batch = meta.get("batch", "symbolic")
        self.hand_faces = np.asarray(meta["hand_faces"], np.int32)
        self.obj_faces = np.asarray(meta["obj_faces"], np.int32)
        serve = load_exported(path)
        # _variables is a placeholder so ``model._infer(model._variables,
        # frames, sides, flip)`` call sites work unchanged for both classes.
        self._variables = None
        self._infer = lambda _variables, frames, sides, flip: serve(
            frames, sides, flip
        )

    # predict/predict_dual only touch self._infer/_variables, so the
    # DemoModel implementations (incl. the batched-input misuse guard)
    # apply verbatim — bound lazily to avoid importing the full model
    # stack when only export/load is used.
    def predict(self, frame, hand_side: str = "left", flip: bool = False):
        from obman_train_tpu.demo.inference import DemoModel

        return DemoModel.predict(self, frame, hand_side=hand_side, flip=flip)

    def predict_dual(self, frame, hand_side: str = "left"):
        from obman_train_tpu.demo.inference import DemoModel

        return DemoModel.predict_dual(self, frame, hand_side=hand_side)
