"""jax.export serving artifacts: serialize, reload, and match the live model.

The exported function is the full device-fused inference path (uint8 frames
-> preprocessing -> encoder -> MANO + AtlasNet heads) with weights baked in;
``load_exported`` must reproduce the live ``DemoModel._infer`` outputs with
no model code or checkpoint.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def demo_model():
    from obman_train_tpu.config import ExperimentConfig
    from obman_train_tpu.demo import DemoModel

    return DemoModel(config=ExperimentConfig(), mano_assets="synthetic",
                     image_size=64)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _call_both(model, serve, batch, rng):
    frames = rng.integers(0, 255, (batch, 64, 64, 3)).astype(np.uint8)
    sides = rng.integers(0, 2, (batch,)).astype(np.int32)
    flip = rng.integers(0, 2, (batch,)).astype(bool)
    live = model._infer(model._variables, frames, sides, flip)
    exported = serve(frames, sides, flip)
    assert sorted(exported) == sorted(live)
    for k in live:
        # exported StableHLO fuses slightly differently than the live jit:
        # allow ~1e-4 float noise on mm-scale outputs
        np.testing.assert_allclose(
            np.asarray(exported[k]), np.asarray(live[k]),
            rtol=1e-5, atol=2e-3, err_msg=k,
        )


def test_export_symbolic_batch_roundtrip(demo_model, rng, tmp_path):
    """One symbolic-batch artifact serves multiple batch sizes and matches
    the live model."""
    from obman_train_tpu.demo.export import export_model, load_exported

    path = str(tmp_path / "model.jaxexp")
    info = export_model(demo_model, path)
    assert info["batch"] == "symbolic"
    assert info["bytes"] > 1000
    serve = load_exported(path)
    for batch in (1, 3):
        _call_both(demo_model, serve, batch, rng)


def test_export_static_batch(demo_model, rng, tmp_path):
    from obman_train_tpu.demo.export import export_model, load_exported

    path = str(tmp_path / "model_b2.jaxexp")
    info = export_model(demo_model, path, batch_size=2)
    assert info["batch"] == 2
    serve = load_exported(path)
    _call_both(demo_model, serve, 2, rng)
    # wrong batch must be rejected, not silently miscomputed
    bad = rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    with pytest.raises(Exception):
        serve(bad, np.zeros((3,), np.int32), np.zeros((3,), bool))
