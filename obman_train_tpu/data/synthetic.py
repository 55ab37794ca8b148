"""Procedural synthetic dataset for hermetic tests and demos.

Plays the role of the reference's minimal adapters (core50.py/yanademo.py
show the adapter contract) but with geometrically consistent annotations:
per-index deterministic RNG generates a camera-space hand point set whose 2D
joints are the exact pinhole projection, so augmentation-equivariance can be
tested end to end without any dataset on disk.
"""

from __future__ import annotations

import numpy as np

from obman_train_tpu.data.queries import BaseQueries, get_trans_queries


class SyntheticDataset:
    name = "synthetic"

    def __init__(
        self,
        size: int = 64,
        img_res: int = 256,
        split: str = "train",
        seed: int = 17,
        side: str = "left",
    ):
        self._size = size
        self.img_res = img_res
        self.split = split
        self._seed = seed
        self._side = side
        # ObMan-like fixed intrinsics (obman.py:104-106)
        f = 480.0 * img_res / 256.0
        c = img_res / 2.0
        self.cam_intr = np.array(
            [[f, 0, c], [0, f, c], [0, 0, 1]], dtype=np.float32
        )
        self.all_queries = [
            BaseQueries.images,
            BaseQueries.joints2d,
            BaseQueries.joints3d,
            BaseQueries.verts3d,
            BaseQueries.objpoints3d,
            BaseQueries.sides,
            BaseQueries.camintrs,
            BaseQueries.meta,
        ]
        self.all_queries += get_trans_queries(self.all_queries)

    def __len__(self):
        return self._size

    def _rng(self, idx):
        return np.random.default_rng(self._seed * 100003 + idx)

    def _scene(self, idx):
        # Memoized: the adapter contract calls several accessors per sample
        # (joints3d/verts3d/objpoints3d/joints2d/center_scale) and
        # regenerating the scene each time dominated the host pipeline.
        # Scenes are deterministic per (seed, idx); dict ops are GIL-atomic
        # so this is safe under the threaded BatchLoader.
        cache = getattr(self, "_scene_memo", None)
        if cache is None:
            cache = self._scene_memo = {}
        hit = cache.get(idx)
        if hit is not None:
            return hit
        rng = self._rng(idx)
        # Hand joints in camera space (mm), in front of the camera.
        root = np.array([0.0, 0.0, 500.0]) + rng.normal(0, 40, 3)
        joints3d = root + rng.normal(0, 40, (21, 3))
        joints3d[:, 2] = np.abs(joints3d[:, 2] - root[2]) * 0.3 + root[2]
        verts3d = root + rng.normal(0, 45, (778, 3))
        verts3d[:, 2] = np.abs(verts3d[:, 2] - root[2]) * 0.3 + root[2]
        obj_center = root + np.array([30.0, 0.0, 20.0])
        objpoints3d = obj_center + rng.normal(0, 25, (2048, 3))
        out = (
            joints3d.astype(np.float32),
            verts3d.astype(np.float32),
            objpoints3d.astype(np.float32),
        )
        cache[idx] = out
        return out

    def _project(self, pts3d):
        p = pts3d @ self.cam_intr.T
        return (p[:, :2] / p[:, 2:3]).astype(np.float32)

    # -- adapter contract ----------------------------------------------------

    def get_image(self, idx):
        rng = self._rng(idx)
        # Raw-byte draw + shift (dark noise in 0..63): bounded integers use
        # per-byte rejection sampling (~1 ms at 256^2x3) and the fixture's
        # cost should resemble a real image decode, not bound the pipeline
        # bench.
        img = (
            np.frombuffer(rng.bytes(self.img_res * self.img_res * 3), np.uint8)
            .reshape(self.img_res, self.img_res, 3)
            >> 2
        )
        joints2d = self.get_joints2d(idx)
        for x, y in joints2d.astype(int):
            if 1 <= x < self.img_res - 1 and 1 <= y < self.img_res - 1:
                img[y - 1 : y + 2, x - 1 : x + 2] = 255
        return img

    def get_joints3d(self, idx):
        return self._scene(idx)[0]

    def get_verts3d(self, idx):
        return self._scene(idx)[1]

    def get_objpoints3d(self, idx, point_nb=600):
        pts = self._scene(idx)[2]
        ids = self._rng(idx ^ 0x5EED).choice(len(pts), point_nb, replace=False)
        return pts[ids]

    def get_joints2d(self, idx):
        return self._project(self.get_joints3d(idx))

    def get_camintr(self, idx):
        return self.cam_intr

    def get_sides(self, idx):
        return self._side

    def get_center_scale(self, idx):
        j2d = self.get_joints2d(idx)
        mins, maxs = j2d.min(0), j2d.max(0)
        center = ((mins + maxs) / 2).astype(int).astype(np.float64)
        scale = float(max(maxs - mins) * 2.2)
        return center, scale

    def get_meta(self, idx):
        return {"objname": f"synth_{idx}"}
