import jax.numpy as jnp
import numpy as np
import pytest

from obman_train_tpu.ops.rotations import rodrigues, rotmat_to_axis_angle
from tests.reference_mano import rodrigues_np

pytestmark = pytest.mark.fast


def test_rodrigues_matches_classic_formula(rng):
    aa = rng.normal(0, 1.0, (64, 3)).astype(np.float32)
    got = np.asarray(rodrigues(jnp.asarray(aa)))
    want = np.stack([rodrigues_np(a.astype(np.float64)) for a in aa])
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_rodrigues_zero_angle():
    got = np.asarray(rodrigues(jnp.zeros((4, 3))))
    np.testing.assert_allclose(got, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)


def test_rodrigues_orthonormal(rng):
    aa = rng.normal(0, 2.0, (32, 3)).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(aa)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rodrigues_gradient_finite_at_zero():
    import jax

    g = jax.jacobian(lambda a: rodrigues(a).sum())(jnp.zeros((3,)))
    assert np.isfinite(np.asarray(g)).all()


def test_roundtrip(rng):
    aa = rng.normal(0, 0.8, (16, 3)).astype(np.float32)
    back = np.asarray(rotmat_to_axis_angle(rodrigues(jnp.asarray(aa))))
    np.testing.assert_allclose(back, aa, atol=1e-4)
