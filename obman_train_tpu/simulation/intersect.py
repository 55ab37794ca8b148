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


def intersect_engines(
    hand_verts: np.ndarray,
    hand_faces: np.ndarray,
    obj_verts: np.ndarray,
    obj_faces: np.ndarray,
) -> Optional[float]:
    """Exact boolean intersection volume, the reference's ``mode="engines"``
    (netscripts/intersect.py:82-111): scad first, blender fallback, None
    (counted as skipped) for a non-watertight result or when both engines
    error.  Requires trimesh + openscad/blender in the image — gated like
    the pybullet simulation backend (this image ships neither; tests
    auto-skip); a missing trimesh raises a clean RuntimeError."""
    try:
        import trimesh
    except ImportError as e:
        raise RuntimeError(
            "--intersect_mode engines needs trimesh (+ openscad or "
            "blender); use the default voxel mode in this image"
        ) from e

    obj_mesh = trimesh.Trimesh(vertices=obj_verts, faces=obj_faces)
    hand_mesh = trimesh.Trimesh(vertices=hand_verts, faces=hand_faces)
    trimesh.repair.fix_normals(obj_mesh)

    def _try(engine):
        inter = obj_mesh.intersection(hand_mesh, engine=engine)
        if inter.vertices.shape[0] == 0:
            return 0.0
        return float(inter.volume) if inter.is_watertight else None

    try:
        vol = _try("scad")
        if vol is not None:
            return vol
    except Exception:
        pass
    try:
        return _try("blender")
    except Exception as e:
        # an engine failure must not abort the whole epoch aggregation —
        # count the sample as skipped like a non-watertight boolean
        import warnings

        warnings.warn(f"boolean engines failed ({e}); sample skipped")
        return None


def full_intersect(
    exp_id: str, pitch: float = 0.005, workers: int = 0,
    mode: str = "voxels",
) -> Dict:
    """Aggregate intersection volumes over an epoch's saved batches
    (netscripts/intersect.py:53-114); meshes are mm -> converted to m.

    ``mode="voxels"`` (reference default) counts doubly-occupied voxels at
    ``pitch``; ``mode="engines"`` uses exact trimesh booleans when trimesh
    is importable and skips samples whose boolean comes back
    non-watertight (the reference counted those as skipped too)."""
    from obman_train_tpu.simulation.savemano import load_batch_info

    if mode not in ("voxels", "engines"):
        raise ValueError(f"unknown intersect mode {mode!r}")
    if mode == "engines":
        import importlib.util

        if importlib.util.find_spec("trimesh") is None:
            raise RuntimeError(  # fail BEFORE scanning an epoch of batches
                "--intersect_mode engines needs trimesh (+ openscad or "
                "blender); use the default voxel mode in this image"
            )
    volumes = []
    skipped = 0
    for name in sorted(os.listdir(exp_id)):
        if not (name.startswith("batch_") and name.endswith(".pkl")):
            continue
        for s in load_batch_info(os.path.join(exp_id, name),
                                 compute_depth=False):
            if s["obj_faces"] is None:
                continue
            if mode == "engines":
                vol = intersect_engines(
                    s["hand_verts"] * 0.001, s["hand_faces"],
                    s["obj_verts"] * 0.001, s["obj_faces"],
                )
                if vol is None:
                    skipped += 1
                    continue
                volumes.append(vol)
            else:
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
        "skipped": skipped,
        "mode": mode,
        "pitch": pitch,
    }
    out_dir = os.path.join(exp_id, "intersect_results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary
