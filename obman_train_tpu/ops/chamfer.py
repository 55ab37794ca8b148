"""Batched bidirectional Chamfer distance.

Reproduces the semantics of the reference ChamferLoss
(mano_train/networks/branches/atlasutils.py:6-39): squared pairwise
distances built as ``||x||^2 + ||y||^2 - 2 x.y``, then per-point minima over
each axis and a per-example mean.

On TPU the (N, M) pairwise matrix for the reference's sizes (600-642 points)
is small and XLA fuses the whole expression into one MXU matmul plus a
min-reduction, so the default path is plain jnp.  For large point counts a
tiled Pallas kernel (ops/pallas/chamfer_kernel.py) computes running minima
without materializing the full (N, M) matrix in HBM; set
``use_pallas=True``/size threshold to enable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry parity requires full f32 accumulation: the default (TPU) matmul
# precision is bf16-class and loses ~1e-2 on the rx+ry-2xy cancellation.
# These matrices are tiny; HIGHEST costs a few extra MXU passes.
_HIGHEST = jax.lax.Precision.HIGHEST


def batch_pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared distances (B, N, M) between x (B, N, 3) and y (B, M, 3).

    Matches the reference's ``batch_pairwise_dist`` (atlasutils.py:20-39,
    duplicated in contactloss.py:60-79): computed as rx + ry - 2 x.y^T, so
    values can be slightly negative from cancellation; the reference does
    not clamp, and neither do we (parity first — callers that need metric
    distances clamp explicitly).
    """
    xx = jnp.sum(x * x, axis=-1)  # (B, N)
    yy = jnp.sum(y * y, axis=-1)  # (B, M)
    xy = jnp.einsum("bnd,bmd->bnm", x, y, precision=_HIGHEST)
    return xx[:, :, None] + yy[:, None, :] - 2.0 * xy


def chamfer_min_sqdist(x: jnp.ndarray, y: jnp.ndarray):
    """Per-point nearest-neighbor squared distances and indices.

    Returns ``(min_x2y (B,N), argmin_x2y (B,N), min_y2x (B,M), argmin_y2x)``.
    """
    d = batch_pairwise_sqdist(x, y)
    return (
        jnp.min(d, axis=2),
        jnp.argmin(d, axis=2),
        jnp.min(d, axis=1),
        jnp.argmin(d, axis=1),
    )


# Above this many pairwise entries the tiled Pallas kernel wins on TPU
# (measured on v5e: ~3.5x at 16k x 16k with the direct-difference VPU
# kernel; parity below ~1M pairs).
_PALLAS_PAIRS_THRESHOLD = 4_000_000


def _use_pallas(n_pairs: int, use_pallas) -> bool:
    if use_pallas in (True, False):
        return use_pallas
    return (
        n_pairs >= _PALLAS_PAIRS_THRESHOLD
        and jax.default_backend() == "tpu"
    )


def chamfer_loss(preds: jnp.ndarray, gts: jnp.ndarray, use_pallas="auto"):
    """Reference ChamferLoss.forward semantics (atlasutils.py:11-18).

    Args:
      preds: (B, N, 3) predicted points.
      gts:   (B, M, 3) target points.
      use_pallas: True/False/"auto" — "auto" switches to the tiled Pallas
        kernel for large point counts on TPU (no O(N*M) HBM footprint).
    Returns:
      (loss_1, loss_2): per-example means of, respectively, the per-pred
      min squared distance to gts and the per-gt min squared distance to
      preds — both (B,).
    """
    if _use_pallas(preds.shape[1] * gts.shape[1], use_pallas):
        from obman_train_tpu.ops.pallas.chamfer_kernel import (
            pallas_chamfer_min_sqdist,
        )

        min_gt2pred, min_pred2gt = pallas_chamfer_min_sqdist(gts, preds)
        return jnp.mean(min_pred2gt, axis=1), jnp.mean(min_gt2pred, axis=1)
    d = batch_pairwise_sqdist(gts, preds)  # (B, M, N): P[b, i, j] = |gt_i - pred_j|^2
    loss_1 = jnp.mean(jnp.min(d, axis=1), axis=1)  # per-pred mins
    loss_2 = jnp.mean(jnp.min(d, axis=2), axis=1)  # per-gt mins
    return loss_1, loss_2


def chamfer_sym(preds: jnp.ndarray, gts: jnp.ndarray) -> jnp.ndarray:
    """Scalar symmetric Chamfer = mean(loss_1 + loss_2) (atlasbranch.py:232-243)."""
    loss_1, loss_2 = chamfer_loss(preds, gts)
    return jnp.mean(loss_1 + loss_2)
