"""Stem-conv space-to-depth backward: exactness + param-path guarantees.

The hot-path claim (bf16 gradients bit-identical on TPU, fwd+bwd
10.5 -> 7.4 ms at batch 256) is measured on-chip by tools/tpu_smoke.py;
here we pin mathematical equivalence on CPU in f32 and the checkpoint
contract (param tree unchanged vs the old nn.Conv stem).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obman_train_tpu.ops.stemconv import (
    _conv_direct,
    _conv_s2d,
    stem_conv7x7,
    stem_conv_applicable,
)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


@pytest.fixture(autouse=True)
def _highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


def test_s2d_forward_matches_direct():
    x = _rand((2, 32, 32, 3), 0)
    w = _rand((7, 7, 3, 8), 1)
    np.testing.assert_allclose(
        _conv_s2d(x, w), _conv_direct(x, w), rtol=1e-5, atol=1e-5
    )


def test_custom_vjp_forward_is_direct_bitwise():
    x = _rand((2, 32, 32, 3), 2)
    w = _rand((7, 7, 3, 8), 3)
    np.testing.assert_array_equal(stem_conv7x7(x, w), _conv_direct(x, w))


def test_gradients_match_direct():
    x = _rand((2, 16, 16, 3), 4)
    w = _rand((7, 7, 3, 4), 5)
    cot = _rand((2, 8, 8, 4), 6)

    def loss(fn):
        def f(x, w):
            return jnp.vdot(fn(x, w), cot)
        return jax.grad(f, argnums=(0, 1))(x, w)

    gx_ref, gw_ref = loss(_conv_direct)
    gx, gw = loss(stem_conv7x7)
    np.testing.assert_allclose(gx, gx_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gw, gw_ref, rtol=1e-4, atol=1e-4)


def test_gate_is_opt_in_and_shape_checked(monkeypatch):
    # Default OFF (measured slower in the full step, see module docstring).
    monkeypatch.delenv("OBMAN_STEM_S2D", raising=False)
    assert not stem_conv_applicable(
        (1, 256, 256, 3), (7, 7, 3, 64), (2, 2), ((3, 3), (3, 3))
    )
    monkeypatch.setenv("OBMAN_STEM_S2D", "1")
    assert stem_conv_applicable(
        (1, 256, 256, 3), (7, 7, 3, 64), (2, 2), ((3, 3), (3, 3))
    )
    # Odd spatial dims never qualify.
    assert not stem_conv_applicable(
        (1, 33, 32, 3), (7, 7, 3, 64), (2, 2), ((3, 3), (3, 3))
    )


def test_resnet_stem_param_path_unchanged():
    # The checkpoint/importer contract: the stem param stays conv1/kernel
    # with the same shape and initializer family as the old nn.Conv.
    from obman_train_tpu.models.resnet import resnet18

    model = resnet18()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    kernel = variables["params"]["conv1"]["kernel"]
    assert kernel.shape == (7, 7, 3, 64)
    assert kernel.dtype == jnp.float32


def test_resnet_forward_same_with_gate_on_and_off(monkeypatch):
    # The s2d path's forward must equal the default direct stem
    # bit-for-bit through the whole encoder.
    from obman_train_tpu.models.resnet import resnet18

    model = resnet18()
    x = _rand((1, 32, 32, 3), 7)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    monkeypatch.delenv("OBMAN_STEM_S2D", raising=False)
    out_direct, _ = model.apply(variables, x, train=False)
    monkeypatch.setenv("OBMAN_STEM_S2D", "1")
    out_s2d, _ = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(out_direct, out_s2d)
    # Odd input takes the lax fallback branch with the same params.
    x_odd = _rand((1, 34, 34, 3), 8)[:, :33, :33, :]
    out_odd, _ = model.apply(variables, x_odd, train=False)
    assert np.all(np.isfinite(out_odd))
