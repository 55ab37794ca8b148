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

import os

import jax
import jax.numpy as jnp

# Backward form for the XLA (small-plane) path.  The scatter-form custom
# VJP wins standalone (3.8-4.3 vs ~10 ms at the reference shapes,
# chamfer_tuning.json) but LOSES inside the full compiled train step —
# 61.1 vs 51.6 ms/step bf16, 83.5 vs 75.3 fp32 (chamfer_bwd_ab.json,
# tools/chamfer_bwd_ab.py, round-5 rerun with per-arm trace-cache
# clearing): XLA overlaps the plane re-touch with conv scheduling but
# cannot hide the scatter's serialized HBM updates.  So plain
# AD-through-the-plane is the default and the scatter form is an
# opt-in for plane-dominated (geometry-heavy, small-encoder) workloads.
_SCATTER_BWD = os.environ.get("OBMAN_SCATTER_BWD", "0") == "1"

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


def chamfer_min_sqdist(
    x: jnp.ndarray, y: jnp.ndarray, use_pallas="auto", plane_dtype=None
):
    """Per-point nearest-neighbor squared distances and indices.

    Returns ``(min_x2y (B,N), argmin_x2y (B,N), min_y2x (B,M), argmin_y2x)``.
    Used by the contact loss (778 hand verts x 642 object points per
    sample, contactloss.py:164-166), where the per-example plane is small
    and the XLA path wins; large clouds auto-dispatch to the tiled Pallas
    kernel (O(BN+BM) memory in both the forward and the custom-VJP
    backward).  The XLA path's backward is plain AD through the plane
    (in-context measurement, see ``_SCATTER_BWD``); ``OBMAN_SCATTER_BWD=1``
    opts into the scatter-form custom VJP
    (``_plane_min_scatter_argmin``) — same forward plane/values, but
    cotangents route through the argmin pairs instead of AD re-touching
    the (B, N, M) plane.

    ``plane_dtype`` (e.g. ``jnp.bfloat16``) switches to the
    argmin-gather-recompute path: the (B, N, M) plane is computed in that
    dtype for NEIGHBOR SELECTION ONLY and the returned min values are
    re-evaluated exactly in f32 from the selected pairs (see
    ``_argmin_recompute_min_sqdist``).  The Pallas dispatch takes
    precedence: at sizes where the plane must not be materialized (the
    HBM guard / measured crossover in ``_use_pallas``), the tiled kernel
    runs instead regardless of ``plane_dtype`` — it already avoids the
    plane and recomputes exact f32 values, which is the rung's goal.
    """
    if _use_pallas(x, y, use_pallas):
        return _pallas_min_sqdists_argmin(x, y)
    if plane_dtype is not None:
        return _argmin_recompute_min_sqdist(x, y, plane_dtype)
    if _SCATTER_BWD:
        return _plane_min_scatter_argmin(x, y)
    d = batch_pairwise_sqdist(x, y)
    return (
        jnp.min(d, axis=2),
        jnp.argmin(d, axis=2),
        jnp.min(d, axis=1),
        jnp.argmin(d, axis=1),
    )


def _argmin_recompute_min_sqdist(x: jnp.ndarray, y: jnp.ndarray, plane_dtype):
    """Nearest neighbors via a low-precision selection plane + exact values.

    The (B, N, M) plane exists ONLY under ``argmin`` (no gradient), so
    under AD the whole plane is dead in the backward pass — XLA never
    re-materializes it — and the actual min values (which carry the loss
    and its gradient) are recomputed in f32 as ``|x_i - y_{j*}|^2`` from
    the selected pairs, O(BN + BM).

    Semantics vs the parity path: identical except (a) near-ties may pick
    a different neighbor when the bf16 plane cannot separate them (the
    value difference is then below bf16 resolution by construction), and
    (b) values come from the direct difference form, so they are exact
    and non-negative where the reference's ``rx + ry - 2xy`` form can go
    slightly negative from cancellation.  Gradients equal the min
    subgradient through the selected pair, like the Pallas custom VJP.
    """
    xs = jax.lax.stop_gradient(x).astype(plane_dtype)
    ys = jax.lax.stop_gradient(y).astype(plane_dtype)
    xx = jnp.sum(xs * xs, axis=-1)
    yy = jnp.sum(ys * ys, axis=-1)
    # f32 selection keeps the parity path's HIGHEST-precision matmul so the
    # selected neighbors match it exactly; bf16 selection is one MXU pass.
    prec = _HIGHEST if jnp.dtype(plane_dtype) == jnp.float32 else None
    xy = jnp.einsum("bnd,bmd->bnm", xs, ys, precision=prec)
    d = xx[:, :, None] + yy[:, None, :] - 2.0 * xy
    argx = jnp.argmin(d, axis=2)  # (B, N)
    argy = jnp.argmin(d, axis=1)  # (B, M)
    y_sel = jnp.take_along_axis(y, argx[..., None], axis=1)  # (B, N, 3)
    minx = jnp.sum(jnp.square(x - y_sel), axis=-1)
    x_sel = jnp.take_along_axis(x, argy[..., None], axis=1)  # (B, M, 3)
    miny = jnp.sum(jnp.square(y - x_sel), axis=-1)
    return minx, argx, miny, argy


# Auto-dispatch rule, measured on v5e (warmed, dependency-chained grad
# timing): the Pallas kernel wins when each example's (N, M) plane is big
# enough to amortize its per-program overhead AND the batch total makes
# the XLA path HBM-bound (XLA materializes the (B, N, M) plane in fwd and
# bwd) — grad 1.8x at 1x16384^2 (7.5 -> 4.1 ms), 2.2x at 8x4096^2.  At the
# reference training configs the per-example plane is tiny (600x642 =
# 0.4M) and XLA's batched MXU matmul + fused min wins despite the 394 MB
# spill (grad 5.2 vs 8.0 ms at B=256), so they stay on the XLA path.
# Regardless of speed, once the XLA plane would claim a large slice of
# HBM (fwd AND bwd each materialize B*N*M f32) the kernel's O(BN+BM)
# footprint is the only option that fits — e.g. B=2048 at the contact
# config is a ~4 GB plane on a 16 GB chip.
_PALLAS_MIN_PAIRS_PER_EXAMPLE = 8_000_000
_PALLAS_MIN_TOTAL_PAIRS = 64_000_000
_PALLAS_XLA_PLANE_LIMIT_BYTES = 2 << 30


def plane_dtype_for(geometry_dtype: str):
    """Map the ``--geometry_dtype`` config string to a selection-plane
    dtype (None = the f32 parity path, plane under AD):

    - ``float32``: parity path (reference rx+ry-2xy values, AD through
      the plane).
    - ``float32_select``: same f32 HIGHEST-precision plane, but used for
      neighbor SELECTION only — values are recomputed exactly from the
      selected pairs, so the backward pass never touches the (B, N, M)
      plane.  Neighbor choice matches the parity path; values differ
      only by the direct-difference vs cancellation form (~1e-2 mm^2).
    - ``bfloat16``: one-MXU-pass bf16 selection plane + exact f32 value
      recompute.  Near-ties below bf16 resolution may select a different
      (near-nearest) neighbor; record deltas like hand_object_bf16.
    """
    if geometry_dtype == "float32":
        return None
    if geometry_dtype == "float32_select":
        return jnp.float32
    return jnp.dtype(geometry_dtype)


def _use_pallas(x, y, use_pallas) -> bool:
    if use_pallas in (True, False):
        return use_pallas
    if jax.default_backend() != "tpu":
        return False
    per_example = x.shape[1] * y.shape[1]
    total = x.shape[0] * per_example
    if total * 4 >= _PALLAS_XLA_PLANE_LIMIT_BYTES:
        return True
    return (
        per_example >= _PALLAS_MIN_PAIRS_PER_EXAMPLE
        and total >= _PALLAS_MIN_TOTAL_PAIRS
    )


@jax.custom_vjp
def _pallas_min_sqdists(x: jnp.ndarray, y: jnp.ndarray):
    """Pallas-kernel nearest-neighbor sqdists with an O(BN+BM)-memory VJP.

    Primal (no grads requested): min-only kernel.  Under AD the forward
    additionally records argmin indices and the backward routes gradients
    through the selected nearest neighbors — exactly the subgradient the
    XLA/torch min picks — via gathers and scatter-adds, never materializing
    the (B, N, M) plane.
    """
    from obman_train_tpu.ops.pallas.chamfer_kernel import (
        pallas_chamfer_min_sqdist,
    )

    return pallas_chamfer_min_sqdist(x, y)


def _pallas_min_sqdists_fwd(x, y):
    from obman_train_tpu.ops.pallas.chamfer_kernel import (
        pallas_chamfer_min_sqdist,
    )

    minx, argx, miny, argy = pallas_chamfer_min_sqdist(x, y, with_argmin=True)
    return (minx, miny), (x, y, argx, argy)


def _pallas_min_sqdists_bwd(res, g):
    x, y, argx, argy = res
    g_minx, g_miny = g
    in_dtypes = (x.dtype, y.dtype)
    # accumulate in at least f32 (bf16 primals upcast; f64 goldens stay f64)
    acc = jnp.promote_types(jnp.result_type(x.dtype, y.dtype), jnp.float32)
    x, y = x.astype(acc), y.astype(acc)
    g_minx = g_minx.astype(acc)
    g_miny = g_miny.astype(acc)
    # d/dx_i |x_i - y_{j*}|^2 = 2 (x_i - y_{j*});  y_{j*} gets the negative.
    y_sel = jnp.take_along_axis(y, argx[..., None], axis=1)     # (B, N, 3)
    dx_pairs = 2.0 * (x - y_sel) * g_minx[..., None]
    gx = dx_pairs
    gy = jnp.zeros_like(y)
    b_idx = jnp.arange(x.shape[0])[:, None]
    gy = gy.at[b_idx, argx].add(-dx_pairs)

    x_sel = jnp.take_along_axis(x, argy[..., None], axis=1)     # (B, M, 3)
    dy_pairs = 2.0 * (y - x_sel) * g_miny[..., None]
    gy = gy + dy_pairs
    gx = gx.at[b_idx, argy].add(-dy_pairs)
    # cotangents must match the primal dtypes (e.g. bf16 encoder path)
    return gx.astype(in_dtypes[0]), gy.astype(in_dtypes[1])


_pallas_min_sqdists.defvjp(_pallas_min_sqdists_fwd, _pallas_min_sqdists_bwd)


@jax.custom_vjp
def _pallas_min_sqdists_argmin(x: jnp.ndarray, y: jnp.ndarray):
    """4-output (mins + argmins) Pallas path with the same O(BN+BM) VJP;
    the integer argmin outputs carry zero cotangents."""
    from obman_train_tpu.ops.pallas.chamfer_kernel import (
        pallas_chamfer_min_sqdist,
    )

    return pallas_chamfer_min_sqdist(x, y, with_argmin=True)


def _pallas_min_sqdists_argmin_fwd(x, y):
    out = _pallas_min_sqdists_argmin(x, y)
    minx, argx, miny, argy = out
    return out, (x, y, argx, argy)


def _pallas_min_sqdists_argmin_bwd(res, g):
    g_minx, _g_argx, g_miny, _g_argy = g
    return _pallas_min_sqdists_bwd(res, (g_minx, g_miny))


_pallas_min_sqdists_argmin.defvjp(
    _pallas_min_sqdists_argmin_fwd, _pallas_min_sqdists_argmin_bwd
)


@jax.custom_vjp
def _plane_min_scatter(x: jnp.ndarray, y: jnp.ndarray):
    """Parity-plane bidirectional mins with an O(BN+BM) scatter backward.

    Forward values are bit-identical to the plain ``rx + ry - 2xy`` plane
    path (same plane, same ``jnp.min``).  The backward routes each min's
    cotangent through its selected nearest pair as ``2 (x_i - y_{j*})`` —
    algebraically the same subgradient XLA derives by masking the (B, N, M)
    plane, computed WITHOUT touching the plane again.  At the reference
    atlas shape (B=256, 600x642) the plane backward costs ~10.2 ms vs
    ~3.8 ms for the scatter form standalone (chamfer_tuning.json) — but
    inside the full train step the scatter form LOSES by ~9 ms/step
    (chamfer_bwd_ab.json), so this is the ``OBMAN_SCATTER_BWD=1`` opt-in,
    not the default.

    Returns ``(min_x2y (B, N), min_y2x (B, M))``.  Argmins are computed in
    the same reduce pass and kept only as VJP residuals; under pure
    inference (no AD) the un-taken ``fwd`` never runs and XLA sees only the
    two min-reductions.
    """
    d = batch_pairwise_sqdist(x, y)
    return jnp.min(d, axis=2), jnp.min(d, axis=1)


def _plane_min_scatter_fwd(x, y):
    d = batch_pairwise_sqdist(x, y)
    minx = jnp.min(d, axis=2)
    miny = jnp.min(d, axis=1)
    argx = jnp.argmin(d, axis=2)
    argy = jnp.argmin(d, axis=1)
    return (minx, miny), (x, y, argx, argy)


_plane_min_scatter.defvjp(_plane_min_scatter_fwd, _pallas_min_sqdists_bwd)


@jax.custom_vjp
def _plane_min_scatter_argmin(x: jnp.ndarray, y: jnp.ndarray):
    """4-output (mins + argmins) XLA-plane path with the scatter backward.

    Same forward as the plain plane path of ``chamfer_min_sqdist`` (one
    (B, N, M) plane, ``jnp.min``/``jnp.argmin`` reduce passes — values
    bit-identical), but the VJP routes each min's cotangent through its
    argmin pair instead of AD re-touching the plane.  Standalone this wins
    at the contact shape (778 hand verts x 642 object points per example,
    contactloss.py:164-166: ~4.3 vs ~9.7 ms, chamfer_tuning.json /
    mfu_ablation.json) — but in the full compiled step it loses ~9 ms
    (chamfer_bwd_ab.json), so it is the ``OBMAN_SCATTER_BWD=1`` opt-in,
    not the default.  The integer argmin outputs carry zero cotangents.
    """
    d = batch_pairwise_sqdist(x, y)
    return (
        jnp.min(d, axis=2),
        jnp.argmin(d, axis=2),
        jnp.min(d, axis=1),
        jnp.argmin(d, axis=1),
    )


def _plane_min_scatter_argmin_fwd(x, y):
    out = _plane_min_scatter_argmin(x, y)
    _minx, argx, _miny, argy = out
    return out, (x, y, argx, argy)


_plane_min_scatter_argmin.defvjp(
    _plane_min_scatter_argmin_fwd, _pallas_min_sqdists_argmin_bwd
)


def min_sqdist_to(x: jnp.ndarray, y: jnp.ndarray, use_pallas="auto",
                  plane_dtype=None):
    """Per-x min squared distance to ``y`` (B, N) — metric-only: inputs are
    stop-gradiented so the cheaper min-only kernel (no argmin epilogue, ~2x
    faster) is used even under AD.  Used for the GT hand-object distances
    feeding meshiou (reference handnet.py:348-362)."""
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    if _use_pallas(x, y, use_pallas):
        return _pallas_min_sqdists(x, y)[0]
    if plane_dtype is not None:
        return _argmin_recompute_min_sqdist(x, y, plane_dtype)[0]
    return jnp.min(batch_pairwise_sqdist(x, y), axis=2)


def chamfer_loss(preds: jnp.ndarray, gts: jnp.ndarray, use_pallas="auto",
                 plane_dtype=None):
    """Reference ChamferLoss.forward semantics (atlasutils.py:11-18).

    Args:
      preds: (B, N, 3) predicted points.
      gts:   (B, M, 3) target points.
      use_pallas: True/False/"auto" — "auto" switches to the tiled Pallas
        kernel for large point counts on TPU (no O(N*M) HBM footprint).
      plane_dtype: optional low-precision selection-plane dtype (the
        ``--geometry_dtype`` rung): neighbors are selected on a plane of
        this dtype, values recomputed exactly in f32 from the selection.
        Ignored when the Pallas dispatch fires (large clouds / HBM
        guard): the kernel never materializes the plane, which is what
        the rung buys at small sizes.
    Returns:
      (loss_1, loss_2): per-example means of, respectively, the per-pred
      min squared distance to gts and the per-gt min squared distance to
      preds — both (B,).
    """
    if _use_pallas(gts, preds, use_pallas):
        min_gt2pred, min_pred2gt = _pallas_min_sqdists(gts, preds)
        return jnp.mean(min_pred2gt, axis=1), jnp.mean(min_gt2pred, axis=1)
    if plane_dtype is not None:
        min_gt2pred, _, min_pred2gt, _ = _argmin_recompute_min_sqdist(
            gts, preds, plane_dtype
        )
        return jnp.mean(min_pred2gt, axis=1), jnp.mean(min_gt2pred, axis=1)
    # Same plane/min forward as the reference: d[b, i, j] = |gt_i - pred_j|^2.
    # Backward form per _SCATTER_BWD (plane AD by default — in-context win).
    if _SCATTER_BWD:
        min_gt2pred, min_pred2gt = _plane_min_scatter(gts, preds)
    else:
        d = batch_pairwise_sqdist(gts, preds)
        min_gt2pred = jnp.min(d, axis=2)
        min_pred2gt = jnp.min(d, axis=1)
    loss_1 = jnp.mean(min_pred2gt, axis=1)  # per-pred mins
    loss_2 = jnp.mean(min_gt2pred, axis=1)  # per-gt mins
    return loss_1, loss_2


def chamfer_sym(preds: jnp.ndarray, gts: jnp.ndarray) -> jnp.ndarray:
    """Scalar symmetric Chamfer = mean(loss_1 + loss_2) (atlasbranch.py:232-243)."""
    loss_1, loss_2 = chamfer_loss(preds, gts)
    return jnp.mean(loss_1 + loss_2)
