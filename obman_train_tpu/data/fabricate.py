"""Fabricate an ObMan-layout dataset tree on disk (real JPEG/PNG files).

The synthetic dataset (data/synthetic.py) generates samples in memory, so
pipeline benchmarks over it *fake* the image-decode cost.  This module
writes an actual mini ObMan tree — per-sample meta pickles, JPEG rgb
frames, PNG segmentation maps, and a shared ShapeNet-style model pickle —
in the exact layout the ObMan adapter reads
(data/obman.py; reference layout: handobjectdatasets/obman.py:61-132), so
the real loader path (JPEG decode -> crop/warp/jitter -> batch) can be
measured and tested hermetically.

Used by bench.py's ``input_pipeline_real_decode`` entry and the adapter
tests.  Images are smooth low-frequency fields + mild noise so JPEG
decode cost resembles photographic content (pure noise both compresses
and decodes unrealistically).
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def _smooth_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """Photographic-ish uint8 RGB: upsampled low-res noise + fine noise."""
    import cv2

    low = rng.integers(0, 255, (16, 16, 3), np.uint8)
    img = cv2.resize(low, (size, size), interpolation=cv2.INTER_CUBIC)
    noise = rng.integers(0, 24, (size, size, 3), np.uint8)
    return cv2.add(img, noise)


def fabricate_obman(
    root_dir: str,
    n_samples: int,
    split: str = "train",
    img_size: int = 256,
    seed: int = 0,
    write_segm: bool = True,
) -> tuple:
    """Write ``n_samples`` ObMan-layout samples under ``root_dir``.

    Returns ``(obman_root, shapenet_root)`` suitable for
    ``get_dataset("obman", split, meta={...})``.
    """
    import cv2

    rng = np.random.default_rng(seed)
    obman_root = os.path.join(root_dir, "obman")
    shapenet_root = os.path.join(root_dir, "shapenet")
    split_dir = os.path.join(obman_root, split)
    meta_dir = os.path.join(split_dir, "meta")
    rgb_dir = os.path.join(split_dir, "rgb")
    segm_dir = os.path.join(split_dir, "segm")
    for d in (meta_dir, rgb_dir) + ((segm_dir,) if write_segm else ()):
        os.makedirs(d, exist_ok=True)

    # One shared ShapeNet-style model (the adapter resolves models by
    # class_id/sample_id, so every sample can point at it).
    class_id, sample_id = "02880940", "fab0001"
    model_dir = os.path.join(shapenet_root, class_id, sample_id, "models")
    os.makedirs(model_dir, exist_ok=True)
    verts = rng.random((60, 3)) - 0.5
    faces = rng.integers(0, 60, (96, 3))
    with open(os.path.join(model_dir, "model_normalized.pkl"), "wb") as f:
        pickle.dump({"vertices": verts, "faces": faces}, f)
    with open(os.path.join(model_dir, "surface_points.pkl"), "wb") as f:
        pickle.dump(rng.random((800, 3)) - 0.5, f)

    for i in range(n_samples):
        prefix = f"{i:08d}"
        meta = {
            "coords_2d": rng.uniform(40, img_size - 56, (21, 2)),
            "coords_3d": rng.normal(0, 0.1, (21, 3)) + [0, 0, 0.5],
            "verts_3d": rng.normal(0, 0.1, (778, 3)) + [0, 0, 0.5],
            "side": "left" if i % 2 else "right",
            "hand_pose": rng.normal(0, 1, 45),
            "pca_pose": rng.normal(0, 1, 30),
            "depth_min": 0.3, "depth_max": 0.9,
            "hand_depth_min": 0.3, "hand_depth_max": 0.8,
            "obj_depth_min": 0.4, "obj_depth_max": 0.9,
            "class_id": class_id,
            "sample_id": sample_id,
            "affine_transform": np.eye(4),
            "obj_scale": 0.2,
        }
        with open(os.path.join(meta_dir, f"{prefix}.pkl"), "wb") as f:
            pickle.dump(meta, f)
        img = _smooth_image(rng, img_size)
        cv2.imwrite(
            os.path.join(rgb_dir, f"{prefix}.jpg"), img[:, :, ::-1],
            [cv2.IMWRITE_JPEG_QUALITY, 90],
        )
        if write_segm:
            segm = np.zeros((img_size, img_size, 3), np.uint8)
            cx, cy = meta["coords_2d"].mean(0).astype(int)
            cv2.circle(segm, (int(cx), int(cy)), img_size // 5, (0, 255, 0), -1)
            cv2.circle(segm, (int(cx) + 20, int(cy)), img_size // 8,
                       (255, 0, 0), -1)
            cv2.imwrite(os.path.join(segm_dir, f"{prefix}.png"),
                        segm[:, :, ::-1])
    return obman_root, shapenet_root
