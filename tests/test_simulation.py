import os

import numpy as np
import pytest

from obman_train_tpu.assets import icosphere


def make_bowl(radius=0.05, n=2):
    """Static open 'bowl': lower hemisphere of an icosphere (concave up)."""
    verts, faces = icosphere(n)
    verts = verts * radius
    # keep faces whose centroid is in the lower half (y up corresponds to
    # gravity +y pulling down in our convention? gravity is +9.8 on y, so
    # "down" is +y; build the bowl opening toward -y)
    centroids = verts[faces].mean(1)
    keep = centroids[:, 1] > 0
    return verts, faces[keep]


def test_native_lib_builds():
    from obman_train_tpu.native import load_physics_lib

    lib = load_physics_lib()
    assert lib is not None, "g++ toolchain expected in this image"


def test_free_fall_displacement():
    """Object far from the hand mesh falls freely: d = g t^2 / 2."""
    from obman_train_tpu.simulation.simulate import (
        DT,
        GRAVITY_Y,
        N_STEPS,
        run_simulation,
    )

    hand_verts, hand_faces = icosphere(1)
    hand_verts = hand_verts * 10.0  # mm; tiny and far away
    obj_verts, _ = icosphere(1)
    obj_verts = obj_verts * 20.0 + np.array([500.0, 0, 0])  # mm, 0.5 m away
    dist = run_simulation(hand_verts, hand_faces, obj_verts)
    t = DT * N_STEPS
    expected = 0.5 * GRAVITY_Y * t**2
    assert dist == pytest.approx(expected, rel=0.15)


def test_supported_object_stays():
    """An object resting inside a bowl barely moves; without the bowl it
    falls — the stability metric separates the two."""
    from obman_train_tpu.simulation.simulate import run_simulation

    bowl_verts, bowl_faces = make_bowl(radius=0.08)
    bowl_mm = bowl_verts * 1000.0
    obj_verts, _ = icosphere(1)
    # ball of radius 30mm sitting at the bowl center (bowl radius 80mm,
    # opening toward -y, gravity pulls +y)
    ball_mm = obj_verts * 30.0 + np.array([0.0, 40.0, 0.0])
    d_support = run_simulation(bowl_mm, bowl_faces, ball_mm)

    far_hand = bowl_mm + np.array([1000.0, 0, 0])
    d_free = run_simulation(far_hand, bowl_faces, ball_mm)
    assert d_free > 5 * max(d_support, 1e-4)
    assert d_support < 0.03  # stays within 3 cm


def test_full_simul_pipeline(tmp_path):
    """End-to-end: batch pickle -> full_simul -> results.json."""
    import json
    import pickle

    from obman_train_tpu.simulation import full_simul

    rng = np.random.default_rng(0)
    overts, _ = icosphere(3)
    results = {
        "verts": rng.normal(0, 30, (2, 778, 3)).astype(np.float32)
        + np.array([500, 0, 0], np.float32),
        "objpoints3d": (overts * 30).astype(np.float32)[None].repeat(2, 0),
    }
    payload = {"batch": {}, "results": results, "root": "wrist"}
    with open(tmp_path / "batch_000000.pkl", "wb") as f:
        pickle.dump(payload, f)
    summary = full_simul(str(tmp_path), workers=1)
    assert summary["sample_nb"] == 2
    assert summary["mean_dist"] > 0
    with open(tmp_path / "simulation_results" / "results.json") as f:
        data = json.load(f)
    assert len(data["per_sample"]) == 2


def test_intersect_vox():
    from obman_train_tpu.simulation.intersect import intersect_vox

    verts, faces = icosphere(2)
    a = verts * 0.05  # 5 cm sphere
    # identical spheres -> volume ~ 4/3 pi r^3
    vol = intersect_vox(a, faces, a.copy(), faces, pitch=0.01)
    expected = 4 / 3 * np.pi * 0.05**3
    assert vol == pytest.approx(expected, rel=0.35)
    # disjoint spheres -> 0
    b = a + np.array([1.0, 0, 0])
    assert intersect_vox(a, faces, b, faces, pitch=0.01) == 0.0


def test_max_penetration_depth():
    from obman_train_tpu.simulation.savemano import max_penetration_depth

    overts, ofaces = icosphere(2)
    obj = overts * 50.0  # 50mm sphere
    inside_pts = np.array([[0.0, 0, 0], [10.0, 0, 0]])
    outside_pts = np.array([[200.0, 0, 0]])
    hand = np.concatenate([inside_pts, outside_pts])
    depth = max_penetration_depth(hand, obj, ofaces)
    # deepest interior point is the center: distance to surface ~= 50mm
    assert depth == pytest.approx(50.0, rel=0.1)


def test_save_obj_roundtrip(tmp_path):
    from obman_train_tpu.data.transforms import fast_load_obj
    from obman_train_tpu.simulation.savemano import save_obj

    verts, faces = icosphere(1)
    p = str(tmp_path / "m.obj")
    save_obj(p, verts, faces)
    mesh = fast_load_obj(p)[0]
    # the loader reorders vertices by lexicographic face-token sort (the
    # reference loadutils quirk) — compare geometry, not raw arrays
    np.testing.assert_allclose(
        mesh["vertices"][mesh["faces"]], verts[faces], atol=1e-6
    )


def _plane_mesh(y, half=0.1, n=8, tilt=0.0):
    """Triangulated plane at height y (gravity is +y), optionally tilted
    about the z axis by `tilt` radians; coordinates in metres."""
    xs = np.linspace(-half, half, n)
    zs = np.linspace(-half, half, n)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    gy = np.full_like(gx, y) + np.tan(tilt) * gx
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (
                i * n + j, (i + 1) * n + j, (i + 1) * n + j + 1, i * n + j + 1
            )
            faces.append([a, b, c])
            faces.append([a, c, d])
    return verts, np.asarray(faces, np.int32)


def test_restitution_bounce_heights():
    """Analytic restitution check: with per-body restitutions multiplying
    (pybullet combine), an elastic contact (1 x 1) rebounds most of the drop
    height while the reference protocol (hand 0 x obj 0.5 -> 0) kills the
    bounce entirely."""
    from obman_train_tpu.simulation.simulate import run_simulation

    plane_v, plane_f = _plane_mesh(y=0.023)  # metres; 3mm below the sphere
    ball, _ = icosphere(2)
    ball_mm = ball * 20.0  # 20mm sphere at the origin

    def min_y_after_contact(**kw):
        _, traj = run_simulation(
            plane_v * 1000.0, plane_f, ball_mm, return_trajectory=True, **kw
        )
        y = traj[:, 1]
        hit = int(np.argmax(y))  # deepest approach toward the plane (+y)
        return float(y[hit:].min()), float(y.max())

    rebound_el, peak_el = min_y_after_contact(
        hand_restitution=1.0, obj_restitution=1.0
    )
    rebound_ref, peak_ref = min_y_after_contact()  # reference: 0 x 0.5
    # elastic: returns most of the way to the start height (y=0)
    assert rebound_el < 0.4 * peak_el
    # inelastic: stays at the plane (no significant rebound)
    assert rebound_ref > 0.7 * peak_ref


def test_incline_friction():
    """A box on a 20-degree incline: the reference contact friction (3x3=9)
    holds it in place; zero friction lets it slide ~ g*sin(theta)*t^2/2."""
    from obman_train_tpu.simulation.simulate import (
        DT,
        GRAVITY_Y,
        N_STEPS,
        run_simulation,
    )

    tilt = np.deg2rad(20.0)
    plane_v, plane_f = _plane_mesh(y=0.0155, half=0.2, n=12, tilt=tilt)
    h = 0.015
    corners = np.array(
        [[sx * h, sy * h, sz * h]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    # rotate the box to lie flush on the incline
    c, s = np.cos(tilt), np.sin(tilt)
    rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]]).T
    box_mm = (corners @ rot.T) * 1000.0
    box_faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32,
    )

    d_grip = run_simulation(plane_v * 1000.0, plane_f, box_mm, box_faces)
    d_slide = run_simulation(
        plane_v * 1000.0, plane_f, box_mm, box_faces,
        hand_friction=0.0, obj_friction=0.0,
    )
    t = DT * N_STEPS
    expected_slide = 0.5 * GRAVITY_Y * np.sin(tilt) * t**2
    assert d_grip < 0.01  # holds (cm-level settle tolerance)
    assert d_slide > 0.5 * expected_slide
    assert d_slide > 3 * max(d_grip, 1e-4)


def test_rolling_sphere_inertia():
    """Angular analytic check: high friction cannot hold a SPHERE on an
    incline — it rolls, with solid-sphere acceleration g·sinθ/(1+2/5) =
    (5/7)·g·sinθ, strictly between 'held' (the box case,
    test_incline_friction) and frictionless sliding g·sinθ.  Exercises the
    friction-torque + inertia path of the impulse solver
    (native/physics.cpp resolve_contact: rxt/inv_inertia terms)."""
    from obman_train_tpu.simulation.simulate import (
        DT,
        GRAVITY_Y,
        N_STEPS,
        run_simulation,
    )

    tilt = np.deg2rad(25.0)
    # perpendicular clearance: the plane through (0, y0, 0) with slope tanθ
    # sits y0·cosθ below the sphere center — leave ~0.5 mm of true gap
    y0 = (0.020 + 0.0005) / np.cos(tilt)
    plane_v, plane_f = _plane_mesh(y=y0, half=0.25, n=14, tilt=tilt)
    ball, ball_f = icosphere(2)
    ball_mm = ball * 20.0  # 20 mm radius

    d_roll = run_simulation(plane_v * 1000.0, plane_f, ball_mm)
    d_slide = run_simulation(
        plane_v * 1000.0, plane_f, ball_mm,
        hand_friction=0.0, obj_friction=0.0,
    )
    t = DT * N_STEPS
    expected_slide = 0.5 * GRAVITY_Y * np.sin(tilt) * t**2
    # frictionless run reproduces the analytic slide (measured within 1%)
    assert d_slide == pytest.approx(expected_slide, rel=0.1)
    # rolling: moves substantially (not held like the box)...
    assert d_roll > 0.25 * d_slide
    # ...but slower than sliding (friction torque spins up the sphere;
    # ideal solid-sphere ratio 5/7 ≈ 0.71, measured ≈ 0.44 — the faceted
    # icosphere rocks vertex-to-vertex, dissipating beyond the smooth-case
    # bound)
    assert d_roll < 0.95 * d_slide


def test_grasp_displacement_fixture():
    """Regression guard for the first-party impulse solver: replay the 20
    deterministic synthetic grasps (simulation/fixtures.py) and match the
    committed displacements + final positions
    (tools/capture_grasp_goldens.py).  The solver is double-precision
    sequential C++, so reruns are deterministic; the tolerance only allows
    for compiler/libm variation across images."""
    from obman_train_tpu.simulation.fixtures import grasp_set
    from obman_train_tpu.simulation.simulate import run_simulation

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "goldens", "grasp_fixture.npz")
    )
    disps, finals = [], []
    for g in grasp_set():
        dist, traj = run_simulation(
            g["hand_verts"], g["hand_faces"], g["obj_verts"], g["obj_faces"],
            backend="native", return_trajectory=True,
        )
        disps.append(dist)
        finals.append(traj[-1])
    np.testing.assert_allclose(
        np.asarray(disps), golden["displacements"], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(finals), golden["final_positions"], rtol=1e-6, atol=1e-9
    )
    # the set spans regimes: settled grasps and clear free-falls
    assert np.asarray(disps).min() < 0.02
    assert np.asarray(disps).max() > 0.1


def test_intersect_engines_exact_volume():
    """`mode="engines"` (exact trimesh boolean, reference
    intersect.py:82-111) runs whenever trimesh is installed; auto-skips
    otherwise.  Two overlapping boxes have an analytic intersection."""
    pytest.importorskip("trimesh")
    from obman_train_tpu.simulation.intersect import intersect_engines

    corners = np.array(
        [[sx, sy, sz] for sx in (0, 1) for sy in (0, 1) for sz in (0, 1)],
        np.float64,
    )
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32,
    )
    vol = intersect_engines(
        corners, faces, corners + 0.5, faces
    )
    if vol is not None:  # engines may be absent even with trimesh present
        assert vol == pytest.approx(0.125, rel=1e-3)


def test_intersect_engines_missing_trimesh_errors_cleanly(tmp_path):
    """Without trimesh, engines mode must fail fast with a clean message
    BEFORE scanning an epoch of batches (not a raw ImportError after)."""
    import importlib.util

    if importlib.util.find_spec("trimesh") is not None:
        pytest.skip("trimesh installed; the engines path runs for real")
    from obman_train_tpu.simulation.intersect import full_intersect

    with pytest.raises(RuntimeError, match="trimesh"):
        full_intersect(str(tmp_path), mode="engines")


def test_compare_solvers_machinery():
    """The pybullet-free parts of the cross-validation harness
    (tools/compare_solvers.py): random-grasp generation is deterministic
    and well-formed, and the dependency-free Spearman handles ties."""
    from obman_train_tpu.simulation.compare import _spearman, random_grasps

    a = random_grasps(5, seed=3)
    b = random_grasps(5, seed=3)
    assert len(a) == 5
    for ga, gb in zip(a, b):
        np.testing.assert_array_equal(ga["obj_verts"], gb["obj_verts"])
        assert ga["hand_verts"].shape[1] == 3
        assert ga["obj_faces"].dtype == np.int32
    assert _spearman(np.arange(10.0), np.arange(10.0) * 3 + 1) == \
        pytest.approx(1.0)
    assert _spearman(np.arange(10.0), -np.arange(10.0)) == pytest.approx(-1.0)
    # ties get averaged ranks, monotone otherwise -> still strongly positive
    assert _spearman(
        np.array([0.0, 0.0, 1.0, 2.0]), np.array([0.1, 0.2, 0.5, 0.9])
    ) > 0.9


def test_compare_solvers_cross_validation():
    """The turnkey native-vs-pybullet comparison (VERDICT r3 ask 7): runs
    for real whenever pybullet is installed; auto-skips otherwise.  The
    grasp-stability metric needs ordering + the settled/dropped split to
    agree, not trajectories."""
    pytest.importorskip("pybullet")
    from obman_train_tpu.simulation.compare import (
        compare_backends,
        random_grasps,
    )
    from obman_train_tpu.simulation.fixtures import grasp_set

    report = compare_backends(grasp_set() + random_grasps(10, seed=0))
    assert report["rank_correlation"] >= 0.8
    assert report["stability_agreement"] >= 0.9


def test_pybullet_backend_matches_protocol():
    """The verbatim-reference backend (simulate.py:181-230) runs whenever
    pybullet is installed in the image; auto-skips otherwise.  A cradled
    sphere must stay put and a clear drop must fall — the same regimes the
    native fixture pins."""
    pytest.importorskip("pybullet")
    from obman_train_tpu.simulation.fixtures import grasp_set
    from obman_train_tpu.simulation.simulate import run_simulation

    grasps = grasp_set()
    stable, falling = grasps[0], grasps[3]
    d_stable = run_simulation(
        stable["hand_verts"], stable["hand_faces"],
        stable["obj_verts"], stable["obj_faces"], backend="pybullet",
    )
    d_fall = run_simulation(
        falling["hand_verts"], falling["hand_faces"],
        falling["obj_verts"], falling["obj_faces"], backend="pybullet",
    )
    assert d_stable < 0.05
    assert d_fall > 0.08


def test_process_sample_artifacts(tmp_path):
    """save_artifacts writes obj dumps, the trajectory and a gif
    (reference simulate.py:43-108 saved per-sample obj + video)."""
    from obman_train_tpu.simulation.simulate import process_sample

    hand_v, hand_f = make_bowl(radius=0.08)
    obj_v, obj_f = icosphere(1)
    sample = {
        "hand_verts": hand_v * 1000.0,
        "hand_faces": hand_f,
        "obj_verts": obj_v * 30.0 + np.array([0.0, 40.0, 0.0]),
        "obj_faces": obj_f.astype(np.int32),
    }
    out = process_sample(
        7, sample, save_dir=str(tmp_path), save_artifacts=True
    )
    assert out["backend"] == "native"
    for suffix in (
        ".json", "_hand.obj", "_obj.obj", "_traj.npy", ".gif", ".mp4",
    ):
        assert (tmp_path / f"000007{suffix}").exists(), suffix
    traj = np.load(tmp_path / "000007_traj.npy")
    assert traj.shape == (35, 3)


def test_fast_load_obj_ngon_fan(tmp_path):
    """>4-corner faces fan-triangulate (the reference's blind (-1,3)
    reshape raises or misaligns there; documented divergence)."""
    from obman_train_tpu.data.transforms import fast_load_obj

    p = tmp_path / "pent.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0.5 1.5 0\nv 0 1 0\n"
        "f 1 2 3 4 5\n"
    )
    mesh = fast_load_obj(str(p))[0]
    assert mesh["faces"].shape == (3, 3)  # pentagon -> 3 fan triangles
    v, f = mesh["vertices"], mesh["faces"]
    # every fan triangle shares the pentagon's first corner (0,0,0)
    first = v[f[:, 0]]
    np.testing.assert_allclose(first, np.zeros((3, 3)), atol=1e-12)
