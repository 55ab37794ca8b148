import numpy as np
import pytest

from obman_train_tpu.data import (
    BaseQueries,
    BatchLoader,
    ConcatLoader,
    HandDataset,
    SyntheticDataset,
    TransQueries,
    get_trans_queries,
)
from obman_train_tpu.data.loader import derive_spec, loader_meta, to_model_batch
from obman_train_tpu.data import transforms as T

pytestmark = pytest.mark.fast


def all_queries(ds):
    return ds.all_queries


def make_hand_dataset(train=True, **kw):
    pose = SyntheticDataset(size=16)
    defaults = dict(
        queries=[
            BaseQueries.sides,
            TransQueries.images,
            TransQueries.joints2d,
            TransQueries.joints3d,
            TransQueries.verts3d,
            TransQueries.objpoints3d,
            TransQueries.camintrs,
            TransQueries.center3d,
            TransQueries.affinetrans,
        ],
        train=train,
        sides="both",
    )
    defaults.update(kw)
    return HandDataset(pose, **defaults)


def test_get_trans_queries():
    base = [BaseQueries.images, BaseQueries.joints3d, BaseQueries.camintrs]
    trans = get_trans_queries(base)
    assert TransQueries.images in trans
    assert TransQueries.joints3d in trans
    assert TransQueries.center3d in trans
    assert TransQueries.camintrs in trans
    assert TransQueries.objpoints3d not in trans


def test_sample_shapes_and_normalization():
    ds = make_hand_dataset(train=False)
    s = ds[0]
    img = s[TransQueries.images]
    assert img.shape == (256, 256, 3)
    assert img.min() >= -0.5 - 1e-6 and img.max() <= 0.5 + 1e-6
    assert s[TransQueries.joints3d].shape == (21, 3)
    assert s[TransQueries.verts3d].shape == (778, 3)
    assert s[TransQueries.objpoints3d].shape == (600, 3)
    # centered on joint 9
    np.testing.assert_allclose(s[TransQueries.joints3d][9], 0, atol=1e-4)


def test_eval_mode_projection_consistency():
    """Without augmentation, transformed joints2d must equal the pinhole
    projection of (uncentered) joints3d under the transformed intrinsics."""
    ds = make_hand_dataset(train=False)
    s = ds.get_sample(3)
    j3d = s[TransQueries.joints3d] + s[TransQueries.center3d]
    proj = j3d @ s[TransQueries.camintrs].T
    proj = proj[:, :2] / proj[:, 2:3]
    # reference transform_coords rounds to int -> tolerance ~1px
    np.testing.assert_allclose(proj, s[TransQueries.joints2d], atol=1.5)


def test_train_rotation_equivariance():
    """The rotation applied to 3D must match the 2D affine: reprojecting the
    rotated joints3d with the post-rot intrinsics stays on the 2D joints."""
    ds = make_hand_dataset(train=True)
    s = ds.get_sample(5)
    j3d = s[TransQueries.joints3d] + s[TransQueries.center3d]
    proj = j3d @ s[TransQueries.camintrs].T
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(proj, s[TransQueries.joints2d], atol=2.0)


def test_side_flip():
    ds_left = make_hand_dataset(train=False, sides="left")
    ds_right = make_hand_dataset(train=False, sides="right")
    s_l = ds_left.get_sample(1)
    s_r = ds_right.get_sample(1)
    # synthetic dataset emits left hands; "right" mode flips them
    assert s_l[BaseQueries.sides] == "left"
    assert s_r[BaseQueries.sides] == "right"
    # x-coordinates mirrored in 3D
    np.testing.assert_allclose(
        s_r[TransQueries.joints3d][:, 1:],
        s_l[TransQueries.joints3d][:, 1:],
        atol=1e-4,
    )


def test_batch_loader_and_spec():
    ds = make_hand_dataset(train=True)
    loader = BatchLoader(ds, batch_size=4, num_workers=2, seed=0)
    assert len(loader) == 4
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["images"].shape == (4, 256, 256, 3)
    assert b["sides"].dtype == np.int32
    spec = derive_spec(b)
    assert spec.has_joints3d and spec.has_objpoints3d and spec.has_camintrs
    # distinct epochs shuffle differently but keep fixed shapes
    batches2 = list(loader)
    assert len(batches2) == 4


def test_concat_loader_round_robin():
    ds = make_hand_dataset(train=False)
    l1 = BatchLoader(ds, batch_size=4, num_workers=1, shuffle=False)
    l2 = BatchLoader(ds, batch_size=4, num_workers=1, shuffle=False)
    cat = ConcatLoader(
        [l1, l2], metas=[loader_meta("obman", "train"), loader_meta("stereohands", "train")]
    )
    assert len(cat) == 8
    roots = [b["root"] for b in cat]
    assert roots[:4] == ["wrist", "palm", "wrist", "palm"]


def test_affine_transform_invertibility(rng):
    center = np.array([120.0, 130.0])
    scale = 180.0
    aff, post = T.get_affine_transform(center, scale, (256, 256), rot=0.4)
    pts = rng.uniform(50, 200, (10, 2))
    out = T.transform_coords(pts, aff)
    back = T.transform_coords(out.astype(np.float64), aff, invert=True)
    np.testing.assert_allclose(back, pts, atol=2.0)


def test_transform_img_identity():
    img = (np.arange(64 * 64 * 3).reshape(64, 64, 3) % 255).astype(np.uint8)
    out = T.transform_img(img, np.eye(3), (64, 64))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_points_from_mesh_on_surface(rng):
    from obman_train_tpu.assets import icosphere

    verts, faces = icosphere(1)
    pts = T.points_from_mesh(faces, verts, vertex_nb=500, rng=rng)
    # sampled points lie within the unit sphere shell (chords are inside)
    norms = np.linalg.norm(pts, axis=1)
    assert norms.max() <= 1.0 + 1e-5
    assert norms.min() > 0.8


def test_color_jitter_bounds(rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    out = T.color_jitter(img, rng, brightness=0.5, contrast=0.5,
                         saturation=0.5, hue=0.15)
    assert out.min() >= 0 and out.max() <= 1


def test_getitem_retries_on_error(monkeypatch):
    ds = make_hand_dataset(train=False)
    orig = ds.get_sample
    calls = {"n": 0}

    def flaky(idx, query=None, rng=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return orig(idx, query, rng)

    monkeypatch.setattr(ds, "get_sample", flaky)
    s = ds[0]
    assert TransQueries.images in s
    assert calls["n"] == 2


def test_native_warp_parity(rng):
    """C++ warp must match the numpy warp bit-for-bit-ish."""
    from obman_train_tpu.native.build import load_imageproc_lib

    if load_imageproc_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    img = rng.integers(0, 255, (120, 90, 3)).astype(np.uint8)
    aff, _ = T.get_affine_transform(np.array([50.0, 60.0]), 80.0, (64, 64),
                                    rot=-0.7)
    a = T.transform_img(img, aff, (64, 64), use_native=True)
    b = T.transform_img(img, aff, (64, 64), use_native=False)
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_uint8_fast_chain_matches_float_chain(rng):
    """The uint8/cv2 photometric+warp fast path (the default bilinear
    pipeline) stays within quantization tolerance of the float reference
    implementations."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    img_u8 = rng.integers(0, 255, (120, 90, 3)).astype(np.uint8)
    img_f = img_u8.astype(np.float32) / 255.0

    # per-op parity (uint8 quantizes per op; allow 2 LSB)
    for u8_fn, f_fn, fac in (
        (T.adjust_brightness_u8, T.adjust_brightness, 1.3),
        (T.adjust_brightness_u8, T.adjust_brightness, 0.6),
        (T.adjust_contrast_u8, T.adjust_contrast, 0.7),
        (T.adjust_contrast_u8, T.adjust_contrast, 1.4),
        (T.adjust_saturation_u8, T.adjust_saturation, 1.5),
        (T.adjust_saturation_u8, T.adjust_saturation, 0.5),
    ):
        a = u8_fn(img_u8, fac).astype(np.float32) / 255.0
        b = f_fn(img_f, fac)
        assert np.abs(a - b).max() <= 2.5 / 255.0, (u8_fn.__name__, fac)
    # hue: the float path routes through the same cv2 uint8 kernel
    a = T.adjust_hue_u8(img_u8, 0.12).astype(np.float32) / 255.0
    b = T.adjust_hue(img_f, 0.12)
    np.testing.assert_allclose(a, b, atol=1e-6)

    # same rng consumption -> same factor draws in both jitter twins
    kw = dict(brightness=0.3, contrast=0.3, saturation=0.3, hue=0.1)
    a = T.color_jitter_u8(
        img_u8, np.random.default_rng(7), **kw
    ).astype(np.float32) / 255.0
    b = T.color_jitter(img_f, np.random.default_rng(7), **kw)
    assert np.abs(a - b).max() <= 6.0 / 255.0  # 4 chained quantized ops

    # warp: cv2 5-bit fixed-point interpolation vs exact float bilinear
    aff, _ = T.get_affine_transform(np.array([50.0, 60.0]), 80.0, (64, 64),
                                    rot=0.35)
    a = T.warp_affine_u8(img_u8, aff, (64, 64)).astype(np.float32)
    b = T.transform_img(img_u8, aff, (64, 64), use_native=False)
    assert np.abs(a - b).max() <= 3.0


def test_augmentation_deterministic_and_epoch_varying():
    """Samples are deterministic per (seed, epoch, idx) — safe under
    concurrent prefetch threads — and vary across epochs."""
    ds = make_hand_dataset(train=True)
    a1 = ds.get_sample(3)[TransQueries.joints3d]
    a2 = ds.get_sample(3)[TransQueries.joints3d]
    np.testing.assert_array_equal(a1, a2)
    ds.reseed(1)
    b = ds.get_sample(3)[TransQueries.joints3d]
    assert not np.allclose(a1, b)


def test_aug_order_identical_across_ranks():
    """--distributed --device_augment: every rank must hold the SAME
    per-batch ``aug_order`` (it is replicated by shard_batch, and the
    in-graph jitter must match the single-process stream).  Rank slices
    start at different global rows, so a sample-0-derived order would
    diverge; BatchLoader derives it from (seed, epoch, batch_idx)."""
    def orders(rank, count):
        ds = make_hand_dataset(train=True, device_augment=True)
        ld = BatchLoader(
            ds, batch_size=8, num_workers=1, seed=3,
            process_rank=rank, process_count=count,
        )
        out = []
        for b in ld:
            # must be a 0-d ndarray: train.loop._to_device keeps only
            # np.ndarray leaves, so a numpy scalar would be dropped
            assert isinstance(b["aug_order"], np.ndarray)
            assert b["aug_order"].shape == ()
            out.append(int(b["aug_order"]))
        return out

    single = orders(0, 1)
    r0, r1 = orders(0, 2), orders(1, 2)
    assert r0 == r1 == single
    assert len(set(single)) > 1  # varies across batches


def test_device_augment_batch_survives_to_device():
    """Every leaf the model reads must survive train.loop._to_device,
    which keeps only np.ndarray leaves (dropping string metadata): the
    in-graph jitter needs BOTH aug_factors and the per-batch aug_order
    (handnet reads batch['aug_order'] whenever aug_factors is present, so
    a dropped leaf crashes --device_augment training at trace time)."""
    from obman_train_tpu.train.loop import _to_device

    ds = make_hand_dataset(train=True, device_augment=True)
    ld = BatchLoader(ds, batch_size=8, num_workers=1, seed=0)
    batch = next(iter(ld))
    batch["dataset"] = "synthetic"  # ConcatLoader-style string metadata
    dev = _to_device(batch)
    assert "aug_factors" in dev and "aug_order" in dev
    assert dev["aug_order"].shape == ()
    assert "dataset" not in dev


def test_loader_epochs_vary_augmentation():
    ds = make_hand_dataset(train=True)
    loader = BatchLoader(ds, batch_size=4, num_workers=2, shuffle=False, seed=0)
    e1 = next(iter(loader))["joints3d"]
    e2 = next(iter(loader))["joints3d"]
    assert not np.allclose(e1, e2)


def test_uint8_pipeline_matches_float(rng):
    """uint8 emission + device normalization == float emission up to 8-bit
    quantization (<=1/255/2 per channel)."""
    ds_f = make_hand_dataset(train=False)
    ds_u = make_hand_dataset(train=False, emit_uint8=True)
    f = ds_f.get_sample(2)[TransQueries.images]
    u = ds_u.get_sample(2)[TransQueries.images]
    assert u.dtype == np.uint8
    back = u.astype(np.float32) / 255.0 - 0.5
    np.testing.assert_allclose(back, f, atol=1 / 255 / 2 + 1e-6)


def test_dataset_visualizers(tmp_path):
    """The four dataset sanity harnesses render on the synthetic adapter
    (reference handataset.py:425-629)."""
    import os

    from obman_train_tpu.data.factory import get_dataset
    from obman_train_tpu.data.visualize import (
        visualize_3d_proj,
        visualize_3d_transformed,
        visualize_original,
        visualize_transformed,
    )

    ds = get_dataset("synthetic", "train", meta={"size": 4})
    ds.reseed(1)
    for fn in (visualize_original, visualize_transformed,
               visualize_3d_transformed, visualize_3d_proj):
        p = fn(ds, 1, str(tmp_path / f"{fn.__name__}.png"))
        assert os.path.getsize(p) > 1000, fn.__name__


def test_process_worker_loader():
    """use_processes=True: spawned jax-free workers produce batches
    identical in structure (and deterministic content) to the thread path."""
    from obman_train_tpu.data.factory import get_dataset
    from obman_train_tpu.data.loader import BatchLoader

    def batches(use_processes):
        ds = get_dataset("synthetic", "train", meta={"size": 8})
        loader = BatchLoader(
            ds, batch_size=4, num_workers=2, seed=0, shuffle=True,
            use_processes=use_processes,
        )
        out = list(loader)
        loader.close()
        return out

    threaded = batches(False)
    processed = batches(True)
    assert len(threaded) == len(processed) == 2
    for bt, bp in zip(threaded, processed):
        assert set(bt) == set(bp)
        for k in bt:
            np.testing.assert_array_equal(np.asarray(bt[k]), np.asarray(bp[k]))
