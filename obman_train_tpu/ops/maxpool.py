"""3x3/stride-2/pad-1 max-pool with an elementwise backward.

XLA lowers max-pool gradients to ``select_and_scatter``, which is the
single slowest non-matmul op in the train-step trace (4.0 ms/step at
batch 256 fp32, trace 2026-08-17 — ~5% of the whole step).  This module
keeps the forward as the standard ``reduce_window`` max (bit-identical
to ``nn.max_pool``) and replaces the backward with a closed-form
elementwise formulation tailored to the ResNet stem's 3x3/2/1 window:

every input pixel belongs to at most 2 windows per axis, so the input
gradient is a 9-term sum of shifted compare-and-multiply terms over the
(upsampled) output grid — pure VPU work that XLA can fuse, with no
scatter.

Subgradient choice: gradient is split EQUALLY among tied window maxima
(ties are common after ReLU), whereas ``select_and_scatter`` routes it
to the first maximum in window order.  Both are valid subgradients of
the same function; sums over each window are preserved exactly.

**Measured verdict: OFF by default.**  In alternating-window A/B runs
of the full bf16 train step (tools/encoder_ab.py, batch 256, v5e,
2026-08-17) this backward measures 69.9 ms/step vs 56.7 ms for the
stock ``select_and_scatter`` path: the nine masked strided-embed adds
materialize ~9 padded-input-sized intermediates, and that HBM traffic
costs far more than the 4.0 ms scatter it replaces.  The gate returns
False unless ``OBMAN_POOL_EWBWD=1``, kept as an opt-in so the negative
result stays reproducible.

Reference stem pool: mano_train/networks/bases/resnet.py:117 (torch
MaxPool2d(3, 2, 1); torch routes ties to the first index as well).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool_fwd(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def maxpool_3x3s2_applicable(x_shape) -> bool:
    """Opt-in (OBMAN_POOL_EWBWD=1) + even spatial dims.

    Off by default: measured 13 ms/step SLOWER inside the full train
    step than ``select_and_scatter`` — see the module docstring.
    """
    import os

    return (
        os.environ.get("OBMAN_POOL_EWBWD") == "1"
        and len(x_shape) == 4
        and x_shape[1] % 2 == 0
        and x_shape[2] % 2 == 0
    )


@jax.custom_vjp
def maxpool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    """Max pool, window 3x3, stride 2, padding 1, NHWC.

    Forward identical to ``nn.max_pool(x, (3,3), (2,2), ((1,1),(1,1)))``;
    backward is the fused elementwise formulation above.
    """
    return _pool_fwd(x)


def _fwd(x):
    y = _pool_fwd(x)
    return y, (x, y)


def _bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]

    # Pad x once; window o covers padded rows 2o..2o+2.
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)

    def patch(di, dj):
        # x value at window-relative offset (di, dj) for every window.
        return lax.slice(
            xp,
            (0, di, dj, 0),
            (b, di + 2 * ho - 1, dj + 2 * wo - 1, c),
            (1, 2, 2, 1),
        )

    offsets = [(di, dj) for di in range(3) for dj in range(3)]
    eqs = [patch(di, dj) == y for di, dj in offsets]
    ties = sum(e.astype(jnp.float32) for e in eqs)
    gdivt = (g.astype(jnp.float32) / ties).astype(x.dtype)

    # Scatter-free accumulation on the input grid: upsample (stride-2
    # embed) each masked term into the padded grid, then crop.  The nine
    # writes land on disjoint strided positions per term but overlap
    # across terms, so accumulate in registers via +.
    grad_p = jnp.zeros_like(xp)
    for (di, dj), eq in zip(offsets, eqs):
        term = jnp.where(eq, gdivt, jnp.asarray(0, x.dtype))
        grad_p = grad_p.at[:, di:di + 2 * ho:2, dj:dj + 2 * wo:2, :].add(term)
    return (grad_p[:, 1:1 + h, 1:1 + w, :],)


maxpool_3x3s2.defvjp(_fwd, _bwd)
