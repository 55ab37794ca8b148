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
    B, ncomps = 4, 6
    pose = rng.normal(0, 0.5, (B, ncomps + 3)).astype(np.float32)
    betas = rng.normal(0, 1.0, (B, 10)).astype(np.float32)
    verts, joints = mano_forward(
        params_right, jnp.asarray(pose), jnp.asarray(betas), ncomps=ncomps
    )
    want_v, want_j = mano_np(assets_right, pose, betas, ncomps=ncomps)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-3)  # mm
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-3)


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
