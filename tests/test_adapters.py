"""Adapter tests against tiny fabricated on-disk fixtures (no real datasets
needed): ObMan meta pkls + ShapeNet pkls, FHB skeleton/split/pose files + PLY
models, StereoHands .mat labels."""

import os
import pickle

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

pytestmark = pytest.mark.fast


def write_jpg(path, size=(256, 256)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
    ).save(path)


# --------------------------------------------------------------------------
# ObMan fixture
# --------------------------------------------------------------------------


@pytest.fixture
def obman_root(tmp_path):
    root = tmp_path / "obman"
    shapenet = tmp_path / "shapenet"
    rng = np.random.default_rng(0)
    meta_dir = root / "train" / "meta"
    meta_dir.mkdir(parents=True)
    (tmp_path / "cache").mkdir(exist_ok=True)
    model_dir = shapenet / "02880940" / "abc123" / "models"
    model_dir.mkdir(parents=True)
    verts = rng.random((40, 3)) - 0.5
    faces = rng.integers(0, 40, (60, 3))
    with open(model_dir / "model_normalized.pkl", "wb") as f:
        pickle.dump({"vertices": verts, "faces": faces}, f)
    with open(model_dir / "surface_points.pkl", "wb") as f:
        pickle.dump(rng.random((800, 3)) - 0.5, f)
    for i in range(3):
        prefix = f"{i:08d}"
        meta = {
            "coords_2d": rng.uniform(40, 200, (21, 2)),
            "coords_3d": rng.normal(0, 0.1, (21, 3)) + [0, 0, 0.5],
            "verts_3d": rng.normal(0, 0.1, (778, 3)) + [0, 0, 0.5],
            "side": "left",
            "hand_pose": rng.normal(0, 1, 45),
            "pca_pose": rng.normal(0, 1, 30),
            "depth_min": 0.3, "depth_max": 0.9,
            "hand_depth_min": 0.3, "hand_depth_max": 0.8,
            "obj_depth_min": 0.4, "obj_depth_max": 0.9,
            "class_id": "02880940",
            "sample_id": "abc123",
            "affine_transform": np.eye(4),
            "obj_scale": 0.2,
        }
        with open(meta_dir / f"{prefix}.pkl", "wb") as f:
            pickle.dump(meta, f)
        write_jpg(str(root / "train" / "rgb" / f"{prefix}.jpg"))
    return str(root), str(shapenet), str(tmp_path / "cache")


def test_obman_adapter(obman_root):
    from obman_train_tpu.data.obman import ObMan

    root, shapenet, cache = obman_root
    ds = ObMan(
        split="train", mode="all", obman_root=root, shapenet_root=shapenet,
        cache_folder=cache, use_cache=False,
    )
    assert len(ds) == 3
    img = ds.get_image(0)
    assert img.shape == (256, 256, 3)
    j3d = ds.get_joints3d(0)
    assert j3d.shape == (21, 3)
    # extrinsic y/z flip: z must be negative (camera looks along -z), mm scale
    assert j3d[:, 2].mean() < -300
    v3d = ds.get_verts3d(0)
    assert v3d.shape == (778, 3)
    pts = ds.get_objpoints3d(0, point_nb=128)
    assert pts.shape == (128, 3)
    verts, faces = ds.get_obj_verts_faces(0)
    assert verts.shape == (40, 3) and faces.shape == (60, 3)
    center, scale = ds.get_center_scale(0)
    assert scale > 0
    assert ds.get_sides(0) == "left"


def test_obman_in_hand_dataset(obman_root):
    from obman_train_tpu.data.dataset import HandDataset
    from obman_train_tpu.data.obman import ObMan
    from obman_train_tpu.data.queries import BaseQueries, TransQueries

    root, shapenet, cache = obman_root
    pose = ObMan(
        split="train", mode="all", obman_root=root, shapenet_root=shapenet,
        cache_folder=cache, use_cache=False,
    )
    ds = HandDataset(
        pose,
        queries=[
            BaseQueries.sides, TransQueries.images, TransQueries.joints3d,
            TransQueries.verts3d, TransQueries.objpoints3d,
            TransQueries.camintrs, TransQueries.center3d,
        ],
        train=True,
    )
    s = ds[0]
    assert s[TransQueries.images].shape == (256, 256, 3)
    assert s[TransQueries.objpoints3d].shape == (600, 3)
    np.testing.assert_allclose(s[TransQueries.joints3d][9], 0, atol=1e-3)


def test_obman_cache_keyed_by_root(tmp_path):
    """The annotation cache must not serve one tree's absolute paths to a
    same-named split under a different root (the reference keys only by
    split/mini_factor/mode, obman.py:143-150; regression: a fabricated
    tree in a fresh tmp dir read a previous run's cached rgb paths)."""
    pytest.importorskip("cv2")
    from obman_train_tpu.data.fabricate import fabricate_obman
    from obman_train_tpu.data.obman import ObMan

    cache = str(tmp_path / "shared_cache")
    roots = []
    for name, n in (("a", 3), ("b", 5)):
        obman_root, shapenet_root = fabricate_obman(
            str(tmp_path / name), n, write_segm=False
        )
        roots.append((obman_root, shapenet_root, n))
    for obman_root, shapenet_root, n in roots + roots:  # 2nd pass = cache hits
        ds = ObMan(
            split="train", obman_root=obman_root,
            shapenet_root=shapenet_root, cache_folder=cache, use_cache=True,
        )
        assert len(ds) == n
        assert all(p.startswith(obman_root) for p in ds.image_names)
        assert ds.get_image(0).shape == (256, 256, 3)


def test_fabricate_obman_tree_loads(tmp_path):
    """data/fabricate.py writes a real-file mini-ObMan tree (JPEGs + meta
    pickles) that the ObMan adapter + factory + loader consume end to end —
    the fixture bench.py's input_pipeline_real_decode entry measures."""
    pytest.importorskip("cv2")
    from obman_train_tpu.data.fabricate import fabricate_obman
    from obman_train_tpu.data.factory import get_dataset
    from obman_train_tpu.data.loader import BatchLoader

    obman_root, shapenet_root = fabricate_obman(str(tmp_path), 6)
    assert len(os.listdir(os.path.join(obman_root, "train", "rgb"))) == 6
    ds = get_dataset(
        "obman", "train",
        meta={"obman_root": obman_root, "shapenet_root": shapenet_root},
        device_augment=True,
    )
    assert len(ds) == 6
    loader = BatchLoader(ds, batch_size=3, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    img = batches[0]["images"]
    assert img.shape[1:] == (256, 256, 3)
    # real decoded JPEG content, not a constant fill
    assert np.asarray(img).std() > 1.0


# --------------------------------------------------------------------------
# FHB fixture
# --------------------------------------------------------------------------


@pytest.fixture
def fhb_root(tmp_path):
    root = tmp_path / "fhb"
    rng = np.random.default_rng(0)
    subjects = [f"Subject_{i}" for i in range(1, 7)]
    info_dir = root / "Subjects_info"
    info_dir.mkdir(parents=True)
    # one action sequence per subject, 2 frames each
    seqs = {}
    # build 599 train + 575 test sequence entries in the split file while
    # only materializing a few on disk
    lines = ["Training 1\n"]
    n_train, n_test = 599, 575
    per_subject_train = n_train // 6
    per_subject_test = n_test // 6
    for si, subject in enumerate(subjects):
        entries = []
        count_train = per_subject_train + (1 if si < n_train % 6 else 0)
        count_test = per_subject_test + (1 if si < n_test % 6 else 0)
        for a in range(count_train + count_test):
            entries.append((f"pour_juice_bottle", str(a)))
        seqs[subject] = entries
        with open(info_dir / f"{subject}_info.txt", "w") as f:
            f.write("header\nheader\nheader\n")
            for action, seq_idx in entries:
                f.write(f"{action} {seq_idx} 2\n")
    # split file
    test_lines = []
    for si, subject in enumerate(subjects):
        count_train = per_subject_train + (1 if si < n_train % 6 else 0)
        for action, seq_idx in seqs[subject][:count_train]:
            lines.append(f"{subject}/{action}/{seq_idx} 1\n")
        for action, seq_idx in seqs[subject][count_train:]:
            test_lines.append(f"{subject}/{action}/{seq_idx} 1\n")
    lines.append("Test 1\n")
    lines.extend(test_lines)
    with open(root / "data_split_action_recognition.txt", "w") as f:
        f.writelines(lines)
    # skeletons (only for sequences we'll touch — all, tiny)
    for subject in subjects:
        for action, seq_idx in seqs[subject]:
            d = root / "Hand_pose_annotation_v1" / subject / action / seq_idx
            d.mkdir(parents=True)
            rows = np.concatenate(
                [np.arange(2)[:, None],
                 rng.normal(0, 50, (2, 63)) + 300], axis=1
            )
            np.savetxt(d / "skeleton.txt", rows)
    # object model (ascii ply)
    obj_dir = root / "Object_models" / "juice_bottle_model"
    obj_dir.mkdir(parents=True)
    ply = [
        "ply", "format ascii 1.0",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
        "0 0 0", "0.1 0 0", "0 0.1 0", "0 0 0.1",
        "3 0 1 2", "3 0 2 3",
    ]
    with open(obj_dir / "juice_bottle_model.ply", "w") as f:
        f.write("\n".join(ply) + "\n")
    # 6-DoF poses for subject 1 seq 0 frames
    pose_dir = (
        root / "Object_6D_pose_annotation_v1" / "Subject_1"
        / "pour_juice_bottle" / "0"
    )
    pose_dir.mkdir(parents=True)
    with open(pose_dir / "object_pose.txt", "w") as f:
        for frame in range(2):
            mat = np.eye(4)[:, :].T.reshape(-1)
            f.write(str(frame) + " " + " ".join(map(str, mat)) + "\n")
    # rgb frames
    for frame in range(2):
        write_jpg(
            str(
                root / "process_yana" / "videos_480" / "Subject_1"
                / "pour_juice_bottle" / "0" / "color"
                / f"color_{frame:04d}.jpeg"
            ),
            size=(480, 270),
        )
    return str(root)


def test_fhb_adapter(fhb_root, tmp_path):
    from obman_train_tpu.data.fhbhands import FHBHands

    ds = FHBHands(
        split="train", split_type="action", root=fhb_root,
        cache_folder=str(tmp_path / "fhb_cache"), use_cache=False,
        filter_no_contact=False, filter_object="juice_bottle",
    )
    # only Subject_1/seq 0 has object pose annots -> 2 frames survive
    assert len(ds) == 2
    assert ds.get_sides(0) == "right"
    j3d = ds.get_joints3d(0)
    assert j3d.shape == (21, 3)
    j2d = ds.get_joints2d(0)   # quarter scale
    hom = ds.cam_intr.dot(j3d.T).T
    np.testing.assert_allclose(
        j2d, (hom[:, :2] / hom[:, 2:]) / 4, atol=1e-3
    )
    verts, faces = ds.get_obj_verts_faces(0)
    assert faces.shape == (2, 3)
    img = ds.get_image(0)
    assert img.shape == (270, 480, 3)


def test_fhb_split_invariant_violation(fhb_root, tmp_path):
    """Mangled split file must trip the 599/575 assertion."""
    bad = os.path.join(fhb_root, "data_split_action_recognition.txt")
    with open(bad) as f:
        lines = f.readlines()
    with open(bad, "w") as f:
        f.writelines(lines[:-3])  # drop some test sequences
    from obman_train_tpu.data.fhbhands import FHBHands

    with pytest.raises(AssertionError, match="575"):
        FHBHands(
            split="train", split_type="action", root=fhb_root,
            cache_folder=str(tmp_path / "fhb_cache2"), use_cache=False,
            filter_no_contact=False, filter_object="juice_bottle",
        )


# --------------------------------------------------------------------------
# StereoHands fixture
# --------------------------------------------------------------------------


def test_stereohands_adapter(tmp_path):
    from scipy.io import savemat

    root = tmp_path / "stereo"
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for seq in ["B1Counting", "B1Random"]:
        hand_para = rng.normal(0, 50, (3, 21, 1500)) + 400
        savemat(str(root / "labels" / f"{seq}_BB.mat"), {"handPara": hand_para})
        (root / "images" / seq).mkdir(parents=True)
    from obman_train_tpu.data.stereohands import StereoHands

    ds = StereoHands(
        split="test", root=str(root), use_cache=False, gt_detections=True,
        cache_folder=str(tmp_path / "st_cache"),
    )
    assert len(ds) == 3000
    assert ds.get_sides(0) == "left"
    assert ds.get_manoidxs(0) == list(range(1, 21))
    j3d = ds.get_joints3d(0)
    j2d = ds.get_joints2d(0)
    hom = ds.cam_intr.dot(j3d.astype(np.float64).T).T
    np.testing.assert_allclose(j2d, (hom / hom[:, 2:])[:, :2], rtol=1e-5)
    center, scale = ds.get_center_scale(0)
    assert scale > 0


def test_ply_roundtrip_binary(tmp_path):
    from obman_train_tpu.data.plyio import load_ply

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = [[0, 1, 2], [0, 2, 3]]
    path = tmp_path / "m.ply"
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            "element vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 2\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode())
        f.write(verts.astype("<f4").tobytes())
        for face in faces:
            f.write(np.uint8(3).tobytes())
            f.write(np.asarray(face, "<i4").tobytes())
    v, fc = load_ply(str(path))
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(fc, faces)


def test_obman_obj_mode_center_scale(obman_root, tmp_path):
    """obj mode: crops come from the object-segmentation bbox
    (obman.py:545-566) and queries shrink to the object-only set."""
    from obman_train_tpu.data.obman import ObMan
    from obman_train_tpu.data.queries import BaseQueries

    root, shapenet, cache = obman_root
    # fabricate segm pngs: channel-coded labels (hand=21/23 left, obj=100)
    segm_dir = os.path.join(root, "train", "segm")
    os.makedirs(segm_dir, exist_ok=True)
    for i in range(3):
        seg = np.zeros((256, 256, 3), np.uint8)
        seg[60:120, 80:160, 2] = 100   # object blob in the obj channel
        seg[140:200, 80:160, 2] = 21   # left-hand labels
        Image.fromarray(seg).save(os.path.join(segm_dir, f"{i:08d}.png"))
        # obj-mode rgb folder
        write_jpg(os.path.join(root, "train", "rgb_obj", f"{i:08d}.jpg"))
    ds = ObMan(
        split="train", mode="obj", obman_root=root, shapenet_root=shapenet,
        cache_folder=str(tmp_path / "cache_obj"), use_cache=False,
    )
    assert BaseQueries.joints3d not in ds.all_queries
    center, scale = ds.get_center_scale(0)
    # object bbox: x in [80,160), y in [60,120) -> center ~(119.5, 89.5)
    np.testing.assert_allclose(center, [119.5, 89.5], atol=1.0)
    assert scale == pytest.approx(2.2 * 80, rel=0.05)
    segm = ds.get_segm(0)
    assert segm.shape == (256, 256, 3)
    assert segm[:, :, 1].max() == 255  # obj channel hit
