"""Custom maxpool 3x3/2/1: forward bit-parity and valid subgradients."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from obman_train_tpu.ops.maxpool import maxpool_3x3s2, maxpool_3x3s2_applicable


def _pool_ref(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def test_forward_matches_nn_max_pool_bitwise():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 5)), jnp.float32
    )
    np.testing.assert_array_equal(maxpool_3x3s2(x), _pool_ref(x))


def test_gradient_matches_on_tie_free_input():
    # Continuous random input: ties have probability ~0, so the
    # equality-split backward must equal select_and_scatter exactly.
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, 8, 3)), jnp.float32
    )
    cot = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 4, 4, 3)), jnp.float32
    )

    def loss(fn):
        return jax.grad(lambda x: jnp.vdot(fn(x), cot))(x)

    np.testing.assert_allclose(
        loss(maxpool_3x3s2), loss(_pool_ref), rtol=1e-6, atol=1e-7
    )


def test_tied_input_gradient_is_a_valid_subgradient():
    # All-equal input (like post-ReLU zeros): every window max ties.  The
    # per-window gradient mass must be preserved (sum of input grads ==
    # sum of output cotangents), even though the split differs from
    # select_and_scatter's first-index routing.
    x = jnp.ones((1, 8, 8, 2), jnp.float32)
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 4, 2)), jnp.float32
    )
    g = jax.grad(lambda x: jnp.vdot(maxpool_3x3s2(x), cot))(x)
    np.testing.assert_allclose(
        float(jnp.sum(g)), float(jnp.sum(cot)), rtol=1e-5
    )
    assert bool(jnp.isfinite(g).all())


def test_directional_derivative_matches_finite_difference():
    # The subgradient must still satisfy the chain rule along a smooth
    # direction at a non-degenerate point.
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)

    def f(x):
        return jnp.vdot(maxpool_3x3s2(x), cot)

    g = jax.grad(f)(x)
    eps = 1e-3
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-2)


def test_applicability_gate(monkeypatch):
    # Default OFF (measured slower in the full step, see module docstring).
    monkeypatch.delenv("OBMAN_POOL_EWBWD", raising=False)
    assert not maxpool_3x3s2_applicable((4, 128, 128, 64))
    monkeypatch.setenv("OBMAN_POOL_EWBWD", "1")
    assert maxpool_3x3s2_applicable((4, 128, 128, 64))
    assert not maxpool_3x3s2_applicable((4, 127, 128, 64))
    assert not maxpool_3x3s2_applicable((4, 128, 128))


def test_odd_channel_and_jit():
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((3, 12, 12, 7)), jnp.float32
    )
    np.testing.assert_array_equal(jax.jit(maxpool_3x3s2)(x), _pool_ref(x))
