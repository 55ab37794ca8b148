import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obman_train_tpu.assets import synthetic_mano_assets
from obman_train_tpu.models.mano import mano_forward, mano_params_from_assets
from tests.reference_mano import mano_np


@pytest.fixture(scope="module")
def assets_right():
    return synthetic_mano_assets("right")


@pytest.fixture(scope="module")
def params_right(assets_right):
    return mano_params_from_assets(assets_right)


def test_mano_matches_numpy_reference(assets_right, params_right, rng):
    # f32 production path: the floor is set by float32 itself, not the math —
    # verts are O(100) mm, f32 eps 6e-8 and a ~16-matmul chain give ~1e-3 mm
    # of roundoff; test_mano_f64_matches_numpy_1e4 pins the exact math.
    B, ncomps = 4, 6
    pose = rng.normal(0, 0.5, (B, ncomps + 3)).astype(np.float32)
    betas = rng.normal(0, 1.0, (B, 10)).astype(np.float32)
    verts, joints = mano_forward(
        params_right, jnp.asarray(pose), jnp.asarray(betas), ncomps=ncomps
    )
    want_v, want_j = mano_np(assets_right, pose, betas, ncomps=ncomps)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-3)  # mm
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-3)


@pytest.mark.fast
@pytest.mark.parametrize("ncomps", [6, 30, 45])
def test_mano_f64_matches_numpy_1e4(assets_right, rng, ncomps):
    """In float64 the JAX layer matches the independent numpy implementation
    far below the 1e-4 mm target, for the release-model ncomps=30
    (reference reload.py:93) and the full 45-component basis."""
    B = 3
    pose = rng.normal(0, 0.5, (B, ncomps + 3))
    betas = rng.normal(0, 1.0, (B, 10))
    with jax.enable_x64(True):
        params64 = mano_params_from_assets(assets_right, dtype=jnp.float64)
        verts, joints = mano_forward(
            params64, jnp.asarray(pose), jnp.asarray(betas), ncomps=ncomps
        )
    want_v, want_j = mano_np(assets_right, pose, betas, ncomps=ncomps)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=1e-6)  # mm
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=1e-6)


@pytest.mark.fast
def test_mano_f32_floor_vs_f64(assets_right, rng):
    """Quantify the f32 floor: production f32 outputs stay within 2e-3 mm of
    the f64 ground truth (1e-4 mm absolute is unreachable in f32 for
    ~100 mm outputs — that is 1e-6 relative, below f32 eps accumulation)."""
    params32 = mano_params_from_assets(assets_right, dtype=jnp.float32)
    pose = rng.normal(0, 0.5, (4, 33))
    betas = rng.normal(0, 1.0, (4, 10))
    v32, j32 = mano_forward(
        params32,
        jnp.asarray(pose, jnp.float32),
        jnp.asarray(betas, jnp.float32),
        ncomps=30,
    )
    with jax.enable_x64(True):
        params64 = mano_params_from_assets(assets_right, dtype=jnp.float64)
        v64, j64 = mano_forward(
            params64, jnp.asarray(pose), jnp.asarray(betas), ncomps=30
        )
    assert float(jnp.max(jnp.abs(v32 - v64))) < 2e-3  # mm
    assert float(jnp.max(jnp.abs(j32 - j64))) < 2e-3


def _mirror_assets(assets):
    """Build the exact x-mirror of a right-hand model: the relation the real
    MANO_LEFT tables have to MANO_RIGHT (up to the known shapedirs data bug,
    covered by load_mano_assets(fix_left_shapedirs=True)).

    Mirroring across x: verts v' = M v with M = diag(-1,1,1); rotations
    R' = M R M, so axis-angles map (x,y,z) -> (x,-y,-z) and rotmat entries
    (R-I)[i,j] pick up sign M_ii*M_jj.
    """
    import dataclasses

    m = np.array([-1.0, 1.0, 1.0])
    sign_aa = np.tile([1.0, -1.0, -1.0], 15)           # (45,)
    sign_feat = (np.outer(m, m)).reshape(9)            # rotmat entry signs
    sign_feat = np.tile(sign_feat, 15)                 # (135,)
    return dataclasses.replace(
        assets,
        side="left",
        v_template=assets.v_template * m,
        shapedirs=assets.shapedirs * m[None, :, None],
        posedirs=assets.posedirs * m[None, :, None] * sign_feat[None, None, :],
        hands_components=assets.hands_components * sign_aa[None, :],
        hands_mean=assets.hands_mean * sign_aa,
    )


@pytest.mark.fast
def test_mano_left_hand_mirror_consistency(assets_right, rng):
    """Left-hand convention: feeding the mirrored pose to the mirrored
    (left) model must produce the x-mirror of the right-hand output — the
    invariant manopth's per-side ManoLayer construction relies on
    (manobranch.py:92-105)."""
    left_assets = _mirror_assets(assets_right)
    B, ncomps = 3, 30
    pose = rng.normal(0, 0.5, (B, ncomps + 3))
    betas = rng.normal(0, 1.0, (B, 10))
    pose_l = pose.copy()
    pose_l[:, 1:3] *= -1.0  # mirror the global axis-angle
    with jax.enable_x64(True):
        pr = mano_params_from_assets(assets_right, dtype=jnp.float64)
        pl = mano_params_from_assets(left_assets, dtype=jnp.float64)
        v_r, j_r = mano_forward(
            pr, jnp.asarray(pose), jnp.asarray(betas), ncomps=ncomps
        )
        v_l, j_l = mano_forward(
            pl, jnp.asarray(pose_l), jnp.asarray(betas), ncomps=ncomps
        )
    mirror = np.array([-1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(v_l), np.asarray(v_r) * mirror, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_l), np.asarray(j_r) * mirror, atol=1e-6)


@pytest.mark.fast
def test_mano_left_matches_numpy(rng):
    """The left-side model goes through the same code path and matches the
    numpy reference (no hidden right-hand assumptions)."""
    assets_left = synthetic_mano_assets("left")
    pose = rng.normal(0, 0.5, (2, 33))
    betas = rng.normal(0, 1.0, (2, 10))
    with jax.enable_x64(True):
        params = mano_params_from_assets(assets_left, dtype=jnp.float64)
        verts, joints = mano_forward(
            params, jnp.asarray(pose), jnp.asarray(betas), ncomps=30
        )
    want_v, want_j = mano_np(assets_left, pose, betas, ncomps=30)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=1e-6)
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=1e-6)


@pytest.mark.fast
def test_fix_left_shapedirs_flag(tmp_path, assets_right):
    """load_mano_assets(fix_left_shapedirs=True) negates shapedirs x for the
    left side only (the MANO_LEFT data fix newer manopth versions apply)."""
    import dataclasses

    from obman_train_tpu.assets.mano_assets import load_mano_assets

    left = dataclasses.replace(synthetic_mano_assets("left"), side="left")
    left.save_npz(tmp_path / "MANO_LEFT.npz")
    assets_right.save_npz(tmp_path / "MANO_RIGHT.npz")

    plain = load_mano_assets(str(tmp_path), "left")
    fixed = load_mano_assets(str(tmp_path), "left", fix_left_shapedirs=True)
    np.testing.assert_allclose(fixed.shapedirs[:, 0], -plain.shapedirs[:, 0])
    np.testing.assert_allclose(fixed.shapedirs[:, 1:], plain.shapedirs[:, 1:])
    # right side is never touched
    r_fixed = load_mano_assets(str(tmp_path), "right", fix_left_shapedirs=True)
    np.testing.assert_allclose(r_fixed.shapedirs, assets_right.shapedirs)


@pytest.mark.fast
def test_mano_flat_hand_mean_convention(assets_right, rng):
    """hands_mean handling (manopth flat_hand_mean=False — the reference's
    implicit default): the mean is added to the articulated pose in BOTH the
    PCA and raw axis-angle input modes (manopth layer: th_full_pose =
    cat(root, hands_mean + hand)), so zero PCA coefficients == zero raw
    axis-angle == the rotmat path fed rodrigues(root ++ hands_mean); the
    rotmat path itself must NOT re-add the mean."""
    from obman_train_tpu.ops.rotations import rodrigues

    B = 2
    root = rng.normal(0, 0.3, (B, 3))
    with jax.enable_x64(True):
        params = mano_params_from_assets(assets_right, dtype=jnp.float64)
        zero_pca = jnp.concatenate(
            [jnp.asarray(root), jnp.zeros((B, 30))], axis=1
        )
        v_pca, j_pca = mano_forward(params, zero_pca, ncomps=30)

        zero_aa = jnp.concatenate(
            [jnp.asarray(root), jnp.zeros((B, 45))], axis=1
        )
        v_aa, j_aa = mano_forward(params, zero_aa, use_pca=False)

        aa_full = jnp.concatenate(
            [jnp.asarray(root), jnp.broadcast_to(params.hands_mean, (B, 45))],
            axis=1,
        )
        rots = rodrigues(aa_full.reshape(B, 16, 3))
        v_rot, j_rot = mano_forward(params, rots)

    np.testing.assert_allclose(np.asarray(v_pca), np.asarray(v_aa), atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_pca), np.asarray(v_rot), atol=1e-8)
    np.testing.assert_allclose(np.asarray(j_pca), np.asarray(j_rot), atol=1e-8)


def test_mano_no_betas_no_center(assets_right, params_right, rng):
    pose = rng.normal(0, 0.3, (2, 9)).astype(np.float32)
    verts, joints = mano_forward(
        params_right, jnp.asarray(pose), None, center_idx=None
    )
    want_v, want_j = mano_np(assets_right, pose, None, center_idx=None)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-3)
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-3)


def test_mano_root_palm_and_trans(assets_right, params_right, rng):
    pose = rng.normal(0, 0.3, (2, 9)).astype(np.float32)
    trans = rng.normal(0, 0.1, (2, 3)).astype(np.float32)
    verts, joints = mano_forward(
        params_right, jnp.asarray(pose), None, jnp.asarray(trans), root_palm=True
    )
    want_v, want_j = mano_np(assets_right, pose, None, trans, root_palm=True)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-3)
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-3)


def test_mano_rotmat_mode(assets_right, params_right, rng):
    from obman_train_tpu.ops.rotations import rodrigues

    aa = rng.normal(0, 0.4, (2, 16, 3)).astype(np.float32)
    rots = rodrigues(jnp.asarray(aa))
    verts, joints = mano_forward(params_right, rots)
    want_v, want_j = mano_np(assets_right, np.asarray(rots))
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-3)
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-3)


def test_mano_centering(params_right, rng):
    pose = rng.normal(0, 0.3, (3, 9)).astype(np.float32)
    _, joints = mano_forward(params_right, jnp.asarray(pose), center_idx=9)
    np.testing.assert_allclose(np.asarray(joints[:, 9]), 0.0, atol=1e-3)


def test_mano_jit_and_grad(params_right, rng):
    pose = jnp.asarray(rng.normal(0, 0.3, (2, 9)).astype(np.float32))

    @jax.jit
    def loss_fn(p):
        v, j = mano_forward(params_right, p)
        return jnp.mean(v**2) + jnp.mean(j**2)

    g = jax.grad(loss_fn)(pose)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_mano_zero_pose_is_mean_shape(assets_right, params_right):
    """With pose coeffs 0 the hand takes the mean pose (hands_mean), not the
    template — unless hands_mean is zeroed."""
    import dataclasses

    flat = dataclasses.replace(
        assets_right, hands_mean=np.zeros_like(assets_right.hands_mean)
    )
    params = mano_params_from_assets(flat)
    verts, _ = mano_forward(params, jnp.zeros((1, 9)), center_idx=None)
    # zero pose + zero mean -> pure rest pose: verts equal template up to
    # the identity global rotation (exactly template).
    np.testing.assert_allclose(
        np.asarray(verts[0]) / 1000.0, flat.v_template, atol=1e-4
    )


def test_mano_regression_golden():
    """Outputs must stay bit-stable across refactors (golden captured after
    validation against the independent numpy implementation)."""
    import os

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "goldens", "mano_golden.npz")
    )
    params = mano_params_from_assets(synthetic_mano_assets("right"))
    verts, joints = mano_forward(
        params, jnp.asarray(golden["pose"]), jnp.asarray(golden["betas"]),
        ncomps=6,
    )
    np.testing.assert_allclose(np.asarray(verts), golden["verts"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(joints), golden["joints"], atol=1e-3)
