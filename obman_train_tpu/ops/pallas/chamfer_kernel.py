"""Pallas TPU kernel: bidirectional nearest-neighbor squared distances.

The XLA path (ops/chamfer.py) is MXU-bound at small point counts, but above
a few thousand points the (B, N, M) plane stops fitting on-chip and XLA
spills it to HBM; this kernel streams x tiles against y, computes the
squared-distance tile in VMEM and min-reduces immediately, so only the
O(BN + BM) min/argmin vectors ever live in HBM.

Two layouts, picked by whether the y set fits one VMEM tile:
  * fused (small y): grid (B, x-tiles), y fully resident; per-x mins are
    written per tile and per-y mins accumulate in the revisited output
    block.  Output-block revisits happen on consecutive grid steps (the
    only requirement Mosaic guarantees accumulation for).
  * split (large y): one pallas_call per direction, each tiling its
    "search" set over the INNERMOST grid dimension so the per-point
    accumulator block stays in VMEM across the sweep (the canonical
    matmul-accumulator pattern).  A single fused 2D grid cannot serve
    both directions at once: one of the two accumulators would be
    revisited on non-consecutive steps, which Mosaic does not guarantee
    (and miscomputed ~half the rows at 8k x 8k on v5e).

Padding trick: padded points get coordinates of 1e9, making their squared
distances ~1e18 — they can never win a min, so the kernel needs no validity
masks at all (the (TN, TM) elementwise epilogue is the bottleneck; two
broadcasted-iota compare/select pairs there cost more than the matmul).

``with_argmin=True`` additionally emits the winning indices, enabling the
O(BN + BM)-memory custom VJP in ops/chamfer.py (gradients flow through the
selected nearest neighbors exactly as in the XLA/torch min).

Layout: points are fed coordinate-major (B, 3, N) so the long point axis is
the 128-lane dimension.  Numerics match ops/chamfer.batch_pairwise_sqdist
(full f32 accumulation via Precision.HIGHEST).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_PAD = 1e9  # sentinel coordinate for padded points


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_budget_elems(with_argmin: bool) -> int:
    """Max elements of a (TN, TM) distance tile so its live planes fit
    Mosaic's 16 MB scoped-VMEM stack.

    The argmin epilogue keeps ~2 planes live at once (distances plus an
    iota/select intermediate); at 512 x 4096 (8 MB planes) the stack
    overflows (measured: "16.20M > 16.00M").  Cap argmin tiles at 1M
    elements (4 MB).  The min-only reduce is re-tiled internally by the
    compiler (512 x 16k compiles and is the measured-fastest config on
    v5e), so it gets an 8M-element budget."""
    return (1 if with_argmin else 8) * 1024 * 1024


def _dists(x_ref, y_ref):
    x = x_ref[0]  # (3, TN)
    y = y_ref[0]  # (3, TM)
    # Direct squared differences on the VPU. A K=3 MXU matmul wastes 125 of
    # the systolic array's 128 contraction lanes (~43x), so the rx+ry-2xy
    # formulation is slower here AND numerically worse (cancellation); the
    # direct form computes the exact distance.
    d0 = x[0][:, None] - y[0][None, :]
    d1 = x[1][:, None] - y[1][None, :]
    d2 = x[2][:, None] - y[2][None, :]
    return d0 * d0 + d1 * d1 + d2 * d2  # (TN, TM)


# ---------------------------------------------------------------------------
# Fused kernels: grid (B, x-tiles), y fully VMEM-resident.
# ---------------------------------------------------------------------------


def _chamfer_kernel(x_ref, y_ref, minx_ref, miny_ref):
    """One (batch, x-tile) program; min-only variant."""
    i = pl.program_id(1)
    d = _dists(x_ref, y_ref)
    minx_ref[0, 0, :] = jnp.min(d, axis=1)
    tile_miny = jnp.min(d, axis=0)

    @pl.when(i == 0)
    def _():
        miny_ref[0, 0, :] = tile_miny

    @pl.when(i > 0)
    def _():
        miny_ref[0, 0, :] = jnp.minimum(miny_ref[0, 0, :], tile_miny)


def _chamfer_kernel_argmin(
    x_ref, y_ref, minx_ref, argx_ref, miny_ref, argy_ref
):
    """One (batch, x-tile) program; also tracks argmin indices (first
    occurrence, matching jnp.argmin / torch.min tie-breaking)."""
    i = pl.program_id(1)
    d = _dists(x_ref, y_ref)
    tn, mp = d.shape

    minx = jnp.min(d, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tn, mp), 1)
    minx_ref[0, 0, :] = minx
    argx_ref[0, 0, :] = jnp.min(
        jnp.where(d == minx[:, None], lane, jnp.int32(mp)), axis=1
    )

    tile_miny = jnp.min(d, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tn, mp), 0)
    tile_argy = (
        jnp.min(jnp.where(d == tile_miny[None, :], row, jnp.int32(tn)), axis=0)
        + i * tn
    )

    @pl.when(i == 0)
    def _():
        miny_ref[0, 0, :] = tile_miny
        argy_ref[0, 0, :] = tile_argy

    @pl.when(i > 0)
    def _():
        prev = miny_ref[0, 0, :]
        better = tile_miny < prev
        miny_ref[0, 0, :] = jnp.where(better, tile_miny, prev)
        argy_ref[0, 0, :] = jnp.where(better, tile_argy, argy_ref[0, 0, :])


# ---------------------------------------------------------------------------
# One-direction kernels: grid (B, point-tiles, search-tiles); the per-point
# accumulator block is constant over the innermost search dimension, so it
# stays in VMEM for the whole sweep.
# ---------------------------------------------------------------------------


def _dir_kernel(x_ref, y_ref, minx_ref):
    j = pl.program_id(2)
    d = _dists(x_ref, y_ref)
    tile_min = jnp.min(d, axis=1)

    @pl.when(j == 0)
    def _():
        minx_ref[0, 0, :] = tile_min

    @pl.when(j > 0)
    def _():
        minx_ref[0, 0, :] = jnp.minimum(minx_ref[0, 0, :], tile_min)


def _dir_kernel_argmin(x_ref, y_ref, minx_ref, argx_ref):
    """First-occurrence tie-breaking: within a tile via the iota-min
    select, across tiles via strict-< accumulation (an earlier tile's
    equal min is kept)."""
    j = pl.program_id(2)
    d = _dists(x_ref, y_ref)
    tn, tm = d.shape
    tile_min = jnp.min(d, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    tile_arg = (
        jnp.min(jnp.where(d == tile_min[:, None], lane, jnp.int32(tm)), axis=1)
        + j * tm
    )

    @pl.when(j == 0)
    def _():
        minx_ref[0, 0, :] = tile_min
        argx_ref[0, 0, :] = tile_arg

    @pl.when(j > 0)
    def _():
        prev = minx_ref[0, 0, :]
        better = tile_min < prev
        minx_ref[0, 0, :] = jnp.where(better, tile_min, prev)
        argx_ref[0, 0, :] = jnp.where(better, tile_arg, argx_ref[0, 0, :])


def _min_one_direction(x_pad, N, y_pad, tile_n, tile_m, with_argmin,
                       interpret):
    """Per-x min (and argmin) over y; x_pad/y_pad are (B, 3, NP/MP)."""
    B, _, NP = x_pad.shape
    MP = y_pad.shape[2]
    grid = (B, NP // tile_n, MP // tile_m)
    in_specs = [
        pl.BlockSpec((1, 3, tile_n), lambda b, i, j: (b, 0, i)),
        pl.BlockSpec((1, 3, tile_m), lambda b, i, j: (b, 0, j)),
    ]
    out_spec = pl.BlockSpec((1, 1, tile_n), lambda b, i, j: (b, 0, i))
    if with_argmin:
        minx, argx = pl.pallas_call(
            _dir_kernel_argmin,
            grid=grid,
            in_specs=in_specs,
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1, NP), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, NP), jnp.int32),
            ],
            interpret=interpret,
        )(x_pad, y_pad)
        return minx[:, 0, :N], argx[:, 0, :N]
    minx, = pl.pallas_call(
        _dir_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((B, 1, NP), jnp.float32)],
        interpret=interpret,
    )(x_pad, y_pad)
    return minx[:, 0, :N], None


def _pad_points(p, n_padded):
    """(B, N, 3) -> coord-major (B, 3, NP), sentinel-padded."""
    return jnp.pad(
        jnp.swapaxes(p.astype(jnp.float32), 1, 2),
        ((0, 0), (0, 0), (0, n_padded - p.shape[1])),
        constant_values=_PAD,
    )


@functools.partial(
    jax.jit, static_argnames=("tile_n", "tile_m", "interpret", "with_argmin")
)
def pallas_chamfer_min_sqdist(
    x: jnp.ndarray,
    y: jnp.ndarray,
    tile_n: int = 512,
    tile_m: int | None = None,
    interpret: bool = False,
    with_argmin: bool = False,
):
    """Nearest-neighbor squared distances in both directions.

    Args: x (B, N, 3), y (B, M, 3) float32.
    Returns:
      ``(min_x2y (B, N), min_y2x (B, M))``, or with ``with_argmin=True``
      ``(min_x2y, argmin_x2y int32, min_y2x, argmin_y2x int32)``.
    """
    B, N, _ = x.shape
    M = y.shape[1]
    budget = _tile_budget_elems(with_argmin)
    max_tile = max(128, (budget // tile_n) // 128 * 128)
    fused_mp = _round_up(M, 128)
    if tile_m is None and fused_mp <= max_tile:
        # y fits one tile: fused kernel, y resident across the x sweep
        NP = _round_up(N, tile_n)
        x_pad = _pad_points(x, NP)
        y_pad = _pad_points(y, fused_mp)
        grid = (B, NP // tile_n)
        in_specs = [
            pl.BlockSpec((1, 3, tile_n), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 3, fused_mp), lambda b, i: (b, 0, 0)),
        ]
        tile_out = pl.BlockSpec((1, 1, tile_n), lambda b, i: (b, 0, i))
        full_out = pl.BlockSpec((1, 1, fused_mp), lambda b, i: (b, 0, 0))
        if with_argmin:
            minx, argx, miny, argy = pl.pallas_call(
                _chamfer_kernel_argmin,
                grid=grid,
                in_specs=in_specs,
                out_specs=[tile_out, tile_out, full_out, full_out],
                out_shape=[
                    jax.ShapeDtypeStruct((B, 1, NP), jnp.float32),
                    jax.ShapeDtypeStruct((B, 1, NP), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1, fused_mp), jnp.float32),
                    jax.ShapeDtypeStruct((B, 1, fused_mp), jnp.int32),
                ],
                interpret=interpret,
            )(x_pad, y_pad)
            return (
                minx[:, 0, :N],
                argx[:, 0, :N],
                miny[:, 0, :M],
                argy[:, 0, :M],
            )
        minx, miny = pl.pallas_call(
            _chamfer_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[tile_out, full_out],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1, NP), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, fused_mp), jnp.float32),
            ],
            interpret=interpret,
        )(x_pad, y_pad)
        return minx[:, 0, :N], miny[:, 0, :M]

    # large y: one sweep per direction (distances computed twice, but each
    # accumulator stays in VMEM and tile sizes stay bounded)
    if tile_m is None:
        tile_m = max_tile
    NP_n = _round_up(N, tile_n)
    NP_m = _round_up(N, tile_m)
    MP_n = _round_up(M, tile_n)
    MP_m = _round_up(M, tile_m)
    x_as_pts = _pad_points(x, NP_n)
    y_as_search = _pad_points(y, MP_m)
    y_as_pts = _pad_points(y, MP_n)
    x_as_search = _pad_points(x, NP_m)
    minx, argx = _min_one_direction(
        x_as_pts, N, y_as_search, tile_n, tile_m, with_argmin, interpret
    )
    miny, argy = _min_one_direction(
        y_as_pts, M, x_as_search, tile_n, tile_m, with_argmin, interpret
    )
    if with_argmin:
        return minx, argx, miny, argy
    return minx, miny
