"""Hand-object intersection volume via voxelization.

Equivalent of mano_train/netscripts/intersect.py:18-114: voxelize both
meshes at a fixed pitch (reference default 0.005 m = 5 mm on metre-scale
meshes) over their overlapping bounding box and count doubly-occupied
voxels.  Occupancy uses the same ray-parity inside test as the contact loss
(trimesh-free), batched over voxel centers.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def _occupancy(points: np.ndarray, verts: np.ndarray, faces: np.ndarray,
               chunk: int = 8192) -> np.ndarray:
    import jax.numpy as jnp

    from obman_train_tpu.ops.inside import batch_mesh_contains_points

    tri = jnp.asarray(verts, jnp.float32)[np.asarray(faces)][None]
    out = np.zeros(len(points), bool)
    for i in range(0, len(points), chunk):
        pts = jnp.asarray(points[i : i + chunk], jnp.float32)[None]
        ext = np.asarray(batch_mesh_contains_points(pts, tri))[0]
        out[i : i + chunk] = ~ext
    return out


def intersect_vox(
    hand_verts: np.ndarray,
    hand_faces: np.ndarray,
    obj_verts: np.ndarray,
    obj_faces: np.ndarray,
    pitch: float = 0.005,
) -> float:
    """Intersection volume (units: pitch-cubed x voxel count, e.g. m^3 for
    metre meshes at 5 mm pitch)."""
    lo = np.maximum(hand_verts.min(0), obj_verts.min(0)) - pitch
    hi = np.minimum(hand_verts.max(0), obj_verts.max(0)) + pitch
    if (hi <= lo).any():
        return 0.0
    axes = [np.arange(lo[d], hi[d] + pitch, pitch) for d in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    if len(grid) == 0:
        return 0.0
    occ_h = _occupancy(grid, hand_verts, hand_faces)
    if not occ_h.any():
        return 0.0
    occ_o = _occupancy(grid[occ_h], obj_verts, obj_faces)
    return float(occ_o.sum()) * pitch**3


def full_intersect(
    exp_id: str, pitch: float = 0.005, workers: int = 0
) -> Dict:
    """Aggregate intersection volumes over an epoch's saved batches
    (netscripts/intersect.py:53-114); meshes are mm -> converted to m."""
    from obman_train_tpu.simulation.savemano import load_batch_info

    volumes = []
    for name in sorted(os.listdir(exp_id)):
        if not (name.startswith("batch_") and name.endswith(".pkl")):
            continue
        for s in load_batch_info(os.path.join(exp_id, name),
                                 compute_depth=False):
            if s["obj_faces"] is None:
                continue
            volumes.append(
                intersect_vox(
                    s["hand_verts"] * 0.001, s["hand_faces"],
                    s["obj_verts"] * 0.001, s["obj_faces"], pitch=pitch,
                )
            )
    summary = {
        "mean_volume": float(np.mean(volumes)) if volumes else 0.0,
        "std_volume": float(np.std(volumes)) if volumes else 0.0,
        "sample_nb": len(volumes),
        "pitch": pitch,
    }
    out_dir = os.path.join(exp_id, "intersect_results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary
