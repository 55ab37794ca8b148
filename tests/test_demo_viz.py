import os

import numpy as np
import pytest


def test_device_preproc_matches_host(rng):
    import jax.numpy as jnp

    from obman_train_tpu.ops.image import (
        affine_warp,
        center_crop_square,
        normalize_frames,
        preprocess_frames,
    )
    from obman_train_tpu.data import transforms as T

    frames = rng.integers(0, 255, (2, 100, 140, 3), np.uint8)
    out = preprocess_frames(jnp.asarray(frames), size=64)
    assert out.shape == (2, 64, 64, 3)
    assert float(out.min()) >= -0.5 and float(out.max()) <= 0.5

    # center crop matches manual slice
    cropped = center_crop_square(jnp.asarray(frames))
    np.testing.assert_array_equal(
        np.asarray(cropped), frames[:, :, 20:120]
    )

    norm = normalize_frames(jnp.asarray(frames))
    np.testing.assert_allclose(
        np.asarray(norm), frames.astype(np.float32) / 255 - 0.5, atol=1e-6
    )

    # device affine warp matches host transform_img
    img = rng.random((80, 80, 3)).astype(np.float32)
    aff, _ = T.get_affine_transform(
        np.array([40.0, 42.0]), 60.0, (64, 64), rot=0.3
    )
    host = T.transform_img(img, aff, (64, 64))
    dev = np.asarray(
        affine_warp(jnp.asarray(img)[None], jnp.asarray(aff)[None], 64)
    )[0]
    np.testing.assert_allclose(dev, host, atol=2e-2)


def test_flip_horizontal():
    import jax.numpy as jnp

    from obman_train_tpu.ops.image import flip_horizontal

    x = jnp.arange(2 * 2 * 3 * 1, dtype=jnp.float32).reshape(2, 2, 3, 1)
    out = flip_horizontal(x, jnp.asarray([True, False]))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0, :, ::-1]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1]))


@pytest.fixture(scope="module")
def demo_model():
    from obman_train_tpu.config import ExperimentConfig
    from obman_train_tpu.demo import DemoModel

    return DemoModel(config=ExperimentConfig(), mano_assets="synthetic",
                     image_size=128)


def test_demo_predict(demo_model, rng):
    frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
    out = demo_model.predict(frame, hand_side="left")
    assert out["verts"].shape == (1, 778, 3)
    assert out["joints"].shape == (1, 21, 3)
    assert out["objpoints3d"].shape == (1, 642, 3)
    dual = demo_model.predict_dual(frame)
    assert dual["verts"].shape == (2, 778, 3)
    # flipped copy must give a different prediction than unflipped
    assert not np.allclose(dual["verts"][0], dual["verts"][1])


def test_attention_maps(rng):
    from obman_train_tpu.demo.attention import attention_overlay, stage_attention

    inters = [
        rng.random((1, 8, 8, 16)).astype(np.float32),
        rng.random((1, 4, 4, 32)).astype(np.float32),
    ]
    att = stage_attention(inters, (32, 32))
    assert att.shape == (1, 32, 32)
    assert att.min() >= 0 and att.max() <= 1 + 1e-6
    frame = rng.integers(0, 255, (32, 32, 3), np.uint8)
    blended = attention_overlay(frame, att[0])
    assert blended.shape == (32, 32, 3) and blended.dtype == np.uint8


def test_visualize_batch_and_pck(tmp_path, rng):
    from obman_train_tpu.assets import icosphere, synthetic_mano_assets
    from obman_train_tpu.visualize import save_pck_img, visualize_batch

    assets = synthetic_mano_assets("right")
    overts, ofaces = icosphere(3)
    batch = {
        "images": rng.random((2, 64, 64, 3)).astype(np.float32) - 0.5,
        "verts3d": rng.normal(0, 30, (2, 778, 3)).astype(np.float32),
        "objpoints3d": rng.normal(0, 30, (2, 600, 3)).astype(np.float32),
    }
    results = {
        "verts": rng.normal(0, 30, (2, 778, 3)).astype(np.float32),
        "objpoints3d": np.broadcast_to(overts * 30, (2, 642, 3)),
        "joints2d": rng.uniform(0, 64, (2, 21, 2)).astype(np.float32),
    }
    p = visualize_batch(
        str(tmp_path / "batch.png"), batch, results, assets.faces, ofaces
    )
    assert os.path.getsize(p) > 1000
    p2 = save_pck_img(
        np.linspace(0, 50, 20), np.linspace(0, 1, 20), 0.5,
        str(tmp_path / "pck.png"), overlay="stereo_test",
    )
    assert os.path.getsize(p2) > 1000


def test_device_color_jitter_matches_host(rng):
    """In-graph jitter ops match the host transforms for the same factors."""
    import jax.numpy as jnp

    from obman_train_tpu.data import transforms as T
    from obman_train_tpu.ops import image as I

    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    for dev_op, host_op, f in [
        (I.adjust_brightness_batch, T.adjust_brightness, 1.3),
        (I.adjust_contrast_batch, T.adjust_contrast, 0.7),
        (I.adjust_saturation_batch, T.adjust_saturation, 1.4),
    ]:
        dev = np.asarray(dev_op(jnp.asarray(img), jnp.full((2,), f)))
        host = np.stack([host_op(im, f) for im in img])
        np.testing.assert_allclose(dev, host, atol=1e-5)
    # hue: device path matches the numpy (continuous) host path
    import builtins

    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError
        return real_import(name, *a, **k)

    builtins.__import__ = no_cv2
    try:
        host_hue = np.stack([T.adjust_hue(im, 0.1) for im in img])
    finally:
        builtins.__import__ = real_import
    dev_hue = np.asarray(
        I.adjust_hue_batch(jnp.asarray(img), jnp.full((2,), 0.1))
    )
    np.testing.assert_allclose(dev_hue, host_hue, atol=1e-4)


def test_batched_color_jitter_order(rng):
    import jax.numpy as jnp

    from obman_train_tpu.ops.image import batched_color_jitter

    img = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    factors = jnp.asarray([[1.5, 0.5, 0.2, 0.6], [1.0, 1.0, 0.0, 1.0]])
    out0 = np.asarray(batched_color_jitter(img, factors, jnp.int32(0)))
    out7 = np.asarray(batched_color_jitter(img, factors, jnp.int32(7)))
    # different orders compose differently on the jittered sample...
    assert not np.allclose(out0[0], out7[0])
    # ...and neutral factors are identity regardless of order
    np.testing.assert_allclose(out0[1], np.asarray(img[1]), atol=1e-5)


def test_visualize_batch_contact_segments(tmp_path, rng):
    """Contact attraction/repulsion segment panels render when contact_info
    is present (reference displaymano.py:21-63, 270-330)."""
    import jax.numpy as jnp

    from obman_train_tpu.assets import icosphere, synthetic_mano_assets
    from obman_train_tpu.ops.contact import compute_contact_loss
    from obman_train_tpu.visualize import visualize_batch

    assets = synthetic_mano_assets("right")
    overts, ofaces = icosphere(3)
    verts = rng.normal(0, 25, (2, 778, 3)).astype(np.float32)
    obj = np.broadcast_to(overts * 30, (2, 642, 3)).astype(np.float32)
    _m, _p, info, _met = compute_contact_loss(
        jnp.asarray(verts), jnp.asarray(obj), jnp.asarray(ofaces),
        contact_mode="dist_tanh", contact_zones="zones",
    )
    assert np.asarray(info["attraction_masks"]).any()
    assert np.asarray(info["repulsion_masks"]).any()
    batch = {"images": rng.random((2, 64, 64, 3)).astype(np.float32) - 0.5}
    results = {
        "verts": verts,
        "objpoints3d": obj,
        "contact_info": {k: np.asarray(v) for k, v in info.items()},
    }
    p = visualize_batch(
        str(tmp_path / "contact.png"), batch, results, assets.faces, ofaces
    )
    assert os.path.getsize(p) > 1000
