"""(De)serialization of evaluation results for the simulation pipeline.

Equivalent of mano_train/netscripts/savemano.py: the training loop saves
per-batch ``{'batch', 'results'}`` pickles (train/loop.py save_results);
``load_batch_info`` reconstructs per-sample hand/object meshes (with the
correct per-side faces) and the max penetration depth the reference
computes with trimesh.proximity (savemano.py:8-54) — here via the same
ray-parity + closest-point ops used by the contact loss, on host numpy.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional

import numpy as np


def save_obj(path: str, verts: np.ndarray, faces: Optional[np.ndarray]):
    """Wavefront writer (reference: netscripts/reload.py:16-21)."""
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if faces is not None:
            for face in np.asarray(faces):
                f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def max_penetration_depth(
    hand_verts: np.ndarray, obj_verts: np.ndarray, obj_faces: np.ndarray
) -> float:
    """Max depth of hand vertices inside the object mesh (mm)."""
    import jax.numpy as jnp

    from obman_train_tpu.ops.chamfer import chamfer_min_sqdist
    from obman_train_tpu.ops.inside import batch_mesh_contains_points

    hv = jnp.asarray(hand_verts, jnp.float32)[None]
    ov = jnp.asarray(obj_verts, jnp.float32)[None]
    tri = ov[:, np.asarray(obj_faces)]
    exterior = np.asarray(batch_mesh_contains_points(hv, tri))[0]
    min_sq = np.asarray(chamfer_min_sqdist(hv, ov)[0])[0]
    depths = np.sqrt(np.maximum(min_sq, 0)) * (~exterior)
    return float(depths.max()) if depths.size else 0.0


def load_batch_info(path: str, compute_depth: bool = True) -> List[Dict]:
    """Per-sample dicts {'hand_verts', 'hand_faces', 'obj_verts',
    'obj_faces', 'max_depth', 'sample_id'} from a saved batch pickle."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    results = payload["results"]
    if "verts" not in results or "objpoints3d" not in results:
        return []
    from obman_train_tpu.assets.icosphere import icosphere

    hand_faces = _hand_faces()
    n_obj = results["objpoints3d"].shape[1]
    # icosphere template faces by vertex count
    obj_faces = None
    for sub in (1, 2, 3, 4):
        verts, faces = icosphere(sub)
        if len(verts) == n_obj:
            obj_faces = faces
            break
    samples = []
    for i in range(results["verts"].shape[0]):
        sample = {
            "sample_id": f"{path}:{i}",
            "hand_verts": np.asarray(results["verts"][i]),
            "hand_faces": hand_faces,
            "obj_verts": np.asarray(results["objpoints3d"][i]),
            "obj_faces": obj_faces,
        }
        if compute_depth and obj_faces is not None:
            sample["max_depth"] = max_penetration_depth(
                sample["hand_verts"], sample["obj_verts"], obj_faces
            )
        samples.append(sample)
    return samples


def _hand_faces() -> np.ndarray:
    """MANO topology from the contact-zones asset (same 1538 faces)."""
    import os

    from obman_train_tpu.assets.contact_zones import _DATA

    data = np.load(_DATA)
    return data["faces"].astype(np.int32)
