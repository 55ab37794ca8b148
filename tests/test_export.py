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


def test_exported_model_serves_demos(demo_model, rng, tmp_path):
    """ExportedModel (artifact + .meta.json sidecar) stands in for
    DemoModel in the demos: same predict/predict_dual outputs, faces and
    image size recovered without checkpoint/config/MANO assets, and both
    demo CLIs run end-to-end with --from_export."""
    from obman_train_tpu.demo.export import ExportedModel, export_model

    path = str(tmp_path / "model.jaxexp")
    export_model(demo_model, path)

    model = ExportedModel(path)
    assert model.image_size == demo_model.image_size
    np.testing.assert_array_equal(model.hand_faces, demo_model.hand_faces)
    np.testing.assert_array_equal(model.obj_faces, demo_model.obj_faces)

    frame = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    live = demo_model.predict_dual(frame)
    served = model.predict_dual(frame)
    assert sorted(served) == sorted(live)
    for k in live:
        np.testing.assert_allclose(
            served[k], live[k], rtol=1e-5, atol=2e-3, err_msg=k
        )
    # the misuse guard travels with the borrowed method
    with pytest.raises(ValueError, match="ONE"):
        model.predict(frame[None])

    from PIL import Image

    img_path = str(tmp_path / "in.png")
    Image.fromarray(frame).save(img_path)
    out_png = str(tmp_path / "out.png")
    from obman_train_tpu.cli import image_demo

    image_demo.main(
        ["--image", img_path, "--from_export", path, "--output", out_png]
    )
    assert np.asarray(Image.open(out_png)).size > 0

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        ).save(str(frames_dir / f"f{i}.png"))
    from obman_train_tpu.cli import video_demo

    out_dir = tmp_path / "vid_out"
    with pytest.warns(UserWarning, match="attention"):
        video_demo.main(
            ["--frames_dir", str(frames_dir), "--from_export", path,
             "--out_dir", str(out_dir), "--batch", "2", "--attention"]
        )
    assert len(list(out_dir.glob("*.npz"))) == 3


def test_exported_model_missing_sidecar_errors(demo_model, tmp_path):
    """A bare artifact without the sidecar must fail fast with the
    re-export hint, not an opaque KeyError later."""
    from obman_train_tpu.demo.export import ExportedModel, export_model
    import os

    path = str(tmp_path / "model.jaxexp")
    export_model(demo_model, path)
    os.remove(path + ".meta.json")
    with pytest.raises(FileNotFoundError, match="meta.json"):
        ExportedModel(path)


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
