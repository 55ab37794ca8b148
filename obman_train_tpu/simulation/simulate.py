"""Grasp-stability simulation.

Equivalent of the reference's pybullet pipeline
(mano_train/simulation/simulate.py:111-345 + netscripts/simulate.py:12-89):
load predicted hand + object meshes (mm -> m), drop the object under
gravity (+9.8 y) with the hand static, run 35 steps at 1/240 s, and report
the object's center displacement.  Where the reference shells out to the
V-HACD executable and pybullet's C++ solver, this framework ships its own
compact C++ rigid-body stepper (native/physics.cpp) loaded via ctypes; if
pybullet happens to be installed, ``backend="pybullet"`` reproduces the
reference setup verbatim.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

# Reference simulation constants (simulate.py:117-145, 258-291)
DT = 1.0 / 240.0
N_STEPS = 35
GRAVITY_Y = 9.8
HAND_FRICTION = 3.0
OBJ_FRICTION = 3.0
RESTITUTION = 0.5
SUBSTEPS = 4
CONTACT_MARGIN = 0.002  # 2 mm


def run_simulation(
    hand_verts: np.ndarray,
    hand_faces: np.ndarray,
    obj_verts: np.ndarray,
    obj_faces: Optional[np.ndarray] = None,
    vhacd_exe: Optional[str] = None,
    backend: str = "native",
    return_trajectory: bool = False,
):
    """Simulate and return the object displacement in metres.

    Args:
      hand_verts: (778, 3) in mm; hand_faces (F, 3).
      obj_verts: (V, 3) in mm; obj_faces optional (only pybullet uses them).
    """
    hand_verts = np.asarray(hand_verts, np.float64) * 0.001
    obj_verts = np.asarray(obj_verts, np.float64) * 0.001
    if backend == "pybullet":
        return _run_pybullet(
            hand_verts, hand_faces, obj_verts, obj_faces, vhacd_exe
        )

    from obman_train_tpu.native import load_physics_lib

    lib = load_physics_lib()
    if lib is None:
        return _run_numpy(
            hand_verts, hand_faces, obj_verts, return_trajectory
        )
    import ctypes

    hv = np.ascontiguousarray(hand_verts, np.float64)
    hf = np.ascontiguousarray(hand_faces, np.int32)
    ov = np.ascontiguousarray(obj_verts, np.float64)
    disp = ctypes.c_double(0.0)
    traj = (
        np.zeros((N_STEPS, 3), np.float64) if return_trajectory else None
    )
    ret = lib.run_grasp_simulation(
        hv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(hv),
        hf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(hf),
        ov.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(ov),
        DT, N_STEPS, SUBSTEPS,
        GRAVITY_Y, (HAND_FRICTION * OBJ_FRICTION) ** 0.5, RESTITUTION,
        CONTACT_MARGIN,
        ctypes.byref(disp),
        traj.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        if traj is not None
        else None,
    )
    if ret != 0:
        raise RuntimeError(f"run_grasp_simulation failed with code {ret}")
    if return_trajectory:
        return float(disp.value), traj
    return float(disp.value)


def _run_numpy(hand_verts, hand_faces, obj_verts, return_trajectory):
    """Pure-numpy fallback of the native stepper (translational only —
    sufficient for environments without a C++ toolchain)."""
    tri = hand_verts[hand_faces]  # (F, 3, 3)
    com = obj_verts.mean(0)
    local = obj_verts - com
    x = com.copy()
    v = np.zeros(3)
    g = np.array([0.0, GRAVITY_Y, 0.0])
    h = DT / SUBSTEPS
    traj = []
    tri_a, tri_b, tri_c = tri[:, 0], tri[:, 1], tri[:, 2]
    normals = np.cross(tri_b - tri_a, tri_c - tri_a)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
    for step in range(N_STEPS):
        for _ in range(SUBSTEPS):
            v = v + g * h
            pts = x + local
            # coarse contacts against a subsample of triangle planes
            d = pts[:, None, :] - tri_a[None, ::8, :]
            dist = np.einsum("pfd,fd->pf", d, normals[::8])
            inside = dist < CONTACT_MARGIN
            if inside.any():
                p_idx, f_idx = np.nonzero(inside)
                n = normals[::8][f_idx].mean(0)
                n /= max(np.linalg.norm(n), 1e-12)
                vn = np.dot(v, n)
                if vn < 0:
                    v = v - (1 + RESTITUTION) * vn * n
                    vt = v - np.dot(v, n) * n
                    v = v - np.clip(np.linalg.norm(vt), 0, 1) * 0.5 * vt
            x = x + v * h
        traj.append(x.copy())
    disp = float(np.linalg.norm(x - com))
    if return_trajectory:
        return disp, np.asarray(traj)
    return disp


def _run_pybullet(hand_verts, hand_faces, obj_verts, obj_faces, vhacd_exe):
    """Reference-faithful pybullet path (simulate.py:111-293), used when
    pybullet is installed."""
    import tempfile

    import pybullet as p

    from obman_train_tpu.simulation.savemano import save_obj

    conn = p.connect(p.DIRECT)
    p.setGravity(0, GRAVITY_Y, 0)
    tmpdir = tempfile.mkdtemp()
    hand_path = os.path.join(tmpdir, "hand.obj")
    obj_path = os.path.join(tmpdir, "obj.obj")
    save_obj(hand_path, hand_verts, hand_faces)
    save_obj(obj_path, obj_verts, obj_faces)
    final_obj_path = obj_path
    if vhacd_exe is not None:
        vhacd_out = os.path.join(tmpdir, "obj_vhacd.obj")
        import subprocess

        subprocess.run(
            [vhacd_exe, "--input", obj_path, "--output", vhacd_out],
            check=True, capture_output=True,
        )
        final_obj_path = vhacd_out
    hand_col = p.createCollisionShape(
        p.GEOM_MESH, fileName=hand_path,
        flags=p.GEOM_FORCE_CONCAVE_TRIMESH,
    )
    p.createMultiBody(
        baseMass=0, baseCollisionShapeIndex=hand_col,
    )
    obj_col = p.createCollisionShape(p.GEOM_MESH, fileName=final_obj_path)
    obj_id = p.createMultiBody(baseMass=1, baseCollisionShapeIndex=obj_col)
    p.changeDynamics(
        obj_id, -1, lateralFriction=OBJ_FRICTION, restitution=RESTITUTION
    )
    start = np.asarray(p.getBasePositionAndOrientation(obj_id)[0])
    for _ in range(N_STEPS):
        p.stepSimulation()
    end = np.asarray(p.getBasePositionAndOrientation(obj_id)[0])
    p.disconnect(conn)
    return float(np.linalg.norm(end - start))


def process_sample(
    sample_idx: int,
    sample: Dict[str, np.ndarray],
    save_dir: Optional[str] = None,
    backend: str = "native",
    vhacd_exe: Optional[str] = None,
) -> Dict:
    """One sample -> {'idx', 'distance', ...} (simulate.process_sample)."""
    dist = run_simulation(
        sample["hand_verts"], sample["hand_faces"],
        sample["obj_verts"], sample.get("obj_faces"),
        backend=backend, vhacd_exe=vhacd_exe,
    )
    out = {"sample_idx": sample_idx, "simulation_distance": dist}
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, f"{sample_idx:06d}.json"), "w") as f:
            json.dump(out, f)
    return out


def _worker(args):
    idx, sample, save_dir, backend, vhacd_exe = args
    return process_sample(idx, sample, save_dir, backend, vhacd_exe)


def full_simul(
    exp_id: str,
    workers: int = 8,
    backend: str = "native",
    vhacd_exe: Optional[str] = None,
    save_gifs: bool = False,
) -> Dict:
    """Driver: read the epoch's saved batch pickles, fan the per-sample
    simulations over a process pool, aggregate mean/std displacement + max
    penetration depth to results.json (netscripts/simulate.py:12-89)."""
    from obman_train_tpu.simulation.savemano import load_batch_info

    samples = []
    for name in sorted(os.listdir(exp_id)):
        if name.startswith("batch_") and name.endswith(".pkl"):
            samples.extend(load_batch_info(os.path.join(exp_id, name)))
    if not samples:
        raise ValueError(f"No batch_*.pkl files under {exp_id}")

    save_dir = os.path.join(exp_id, "simulation_results")
    os.makedirs(save_dir, exist_ok=True)
    if vhacd_exe is not None:
        backend = "pybullet"  # V-HACD only applies to the pybullet path
    jobs = [(i, s, None, backend, vhacd_exe) for i, s in enumerate(samples)]
    if workers > 1:
        # Threads, not processes: the native stepper releases the GIL for
        # the duration of the ctypes call, so threads parallelize it, and
        # forking a multithreaded JAX parent risks deadlock (the reference
        # used joblib process pools under torch, netscripts/simulate.py:43-73).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(workers) as pool:
            results = list(pool.map(_worker, jobs))
    else:
        results = [_worker(j) for j in jobs]

    dists = np.asarray([r["simulation_distance"] for r in results])
    depths = np.asarray(
        [s.get("max_depth", 0.0) for s in samples], np.float64
    )
    summary = {
        "mean_dist": float(dists.mean()),
        "std_dist": float(dists.std()),
        "max_depths": float(depths.mean()),
        "sample_nb": int(len(dists)),
    }
    with open(os.path.join(save_dir, "results.json"), "w") as f:
        json.dump({"summary": summary, "per_sample": results}, f, indent=1)
    return summary
