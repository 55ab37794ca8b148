"""ResNet stem convolution with a space-to-depth backward pass.

The 7x7/stride-2 stem conv on RGB input is the classic TPU ResNet
bottleneck: with only 3 input channels the MXU contraction dimension is
49x3 = 147 sparse-padded lanes, and the weight-gradient reduction shape
``[3, H*W*B]`` lowers to a pathological kCustom fusion (measured 3.0 ms
of a 54.6 ms bf16 train step at batch 256, trace 2026-08-17).  The
standard fix (MLPerf ResNet space-to-depth) rewrites the conv over a
2x2-block-flattened input: ``(H, W, C) -> (H/2, W/2, 4C)`` turns the
7x7/2 kernel into an exactly-equivalent 4x4/1 kernel over 4C channels —
the same sums in a different order.

The forward always runs the direct conv (bit-identical to ``nn.Conv``,
so inference, torch-import parity and existing checkpoints are
untouched); the backward differentiates the space-to-depth formulation,
which is mathematically the same linear map.

**Measured verdict: OFF by default.** Standalone (stem conv + trivial
loss, batch 256 bf16, v5e) the s2d backward wins big: fwd+bwd
10.5 -> 7.4 ms, gradients bit-identical.  But inside the full train
step the win inverts: in alternating-window A/B runs
(tools/encoder_ab.py) the direct stem steps at 56.6 ms vs 57.7 (s2d
backward) and 57.5 (full s2d) — XLA overlaps the pathological
weight-gradient with neighbouring work in the big graph, and the s2d
transpose chain adds real HBM traffic.  The gate therefore returns
False unless ``OBMAN_STEM_S2D=1``, kept as an opt-in for other
batch/resolution regimes where the standalone ratio may transfer.

Reference stem: mano_train/networks/bases/resnet.py:110-116 (conv1 7x7
stride 2 pad 3, bias-free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv_direct(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=_DN
    )


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _weight_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, F) -> the equivalent (4, 4, 4C, F) block kernel.

    Output tap ``a`` (block coords, offset -2..1) with intra-block offset
    ``d`` reads original tap ``t = 2a + d + 3``; taps outside 0..6 stay
    zero (one phantom tap at t = -4).
    """
    _, _, c, f = w.shape
    wp = jnp.zeros((4, 4, 4 * c, f), w.dtype)
    for a in range(-2, 2):
        for di in range(2):
            t = 2 * a + di + 3
            if not 0 <= t <= 6:
                continue
            for b in range(-2, 2):
                for dj in range(2):
                    u = 2 * b + dj + 3
                    if not 0 <= u <= 6:
                        continue
                    blk = (di * 2 + dj) * c
                    wp = wp.at[a + 2, b + 2, blk:blk + c, :].set(w[t, u])
    return wp


def _conv_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        _space_to_depth(x),
        _weight_to_s2d(w),
        (1, 1),
        ((2, 1), (2, 1)),
        dimension_numbers=_DN,
    )


@jax.custom_vjp
def stem_conv7x7(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """7x7/stride-2/pad-3 NHWC conv; direct forward, space-to-depth VJP.

    Requires even spatial dims (guarded by the caller).
    """
    return _conv_direct(x, w)


def _fwd(x, w):
    return _conv_direct(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # Differentiate the s2d formulation: the primal output is dead code
    # (the conv is linear in both args) and XLA removes it; what runs is
    # the transposed conv pair over the (H/2, W/2, 4C) grid, whose
    # weight-gradient shape [4C, ...] the TPU backend handles well.
    _, vjp = jax.vjp(_conv_s2d, x, w)
    return vjp(g)


stem_conv7x7.defvjp(_fwd, _bwd)


def stem_conv_applicable(x_shape, kernel_shape, strides, padding) -> bool:
    """True when the s2d-backward stem conv matches this configuration.

    Opt-in (OBMAN_STEM_S2D=1): measured slower inside the full train
    step at the reference config — see the module docstring.
    """
    import os

    return (
        os.environ.get("OBMAN_STEM_S2D") == "1"
        and len(x_shape) == 4
        and x_shape[1] % 2 == 0
        and x_shape[2] % 2 == 0
        and tuple(kernel_shape[:2]) == (7, 7)
        and tuple(strides) == (2, 2)
        and tuple(padding) == ((3, 3), (3, 3))
    )
