"""Pallas TPU kernel: batched ray-parity point-in-mesh test.

Same semantics as ops/inside.batch_mesh_contains_points (Möller–Trumbore
intersection counting with the reference's fixed ray direction and
tolerances, contactutils.py:62-159).  Triangle-only quantities (edge
vectors, pvec = dir x e2, the regularized inverse determinant, parallel
mask) are precomputed once in XLA; the kernel streams point tiles against
the full triangle set held in VMEM and evaluates the (TP, T) intersection
predicate entirely on the VPU, emitting hit counts — the O(P*T) plane never
touches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from obman_train_tpu.ops.inside import RAY_DIRECTION, TOL


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _raytri_kernel(np_ref, nt_ref, pts_ref, v0_ref, e1_ref, e2_ref,
                   pvec_ref, invdet_ref, ok_ref, count_ref):
    """pts_ref: (1, 3, TP); v0/e1/e2/pvec: (1, 3, T); invdet/ok: (1, T);
    count_ref out: (1, TP) int32 intersection counts."""
    d0, d1, d2 = (float(c) for c in RAY_DIRECTION)
    px = pts_ref[0, 0, :][:, None]  # (TP, 1)
    py = pts_ref[0, 1, :][:, None]
    pz = pts_ref[0, 2, :][:, None]
    v0x = v0_ref[0, 0, :][None, :]  # (1, T)
    v0y = v0_ref[0, 1, :][None, :]
    v0z = v0_ref[0, 2, :][None, :]
    # tvec = p - v0, broadcast to (TP, T) per coordinate
    tx = px - v0x
    ty = py - v0y
    tz = pz - v0z
    pvx = pvec_ref[0, 0, :][None, :]
    pvy = pvec_ref[0, 1, :][None, :]
    pvz = pvec_ref[0, 2, :][None, :]
    invdet = invdet_ref[0, 0, :][None, :]
    u = (tx * pvx + ty * pvy + tz * pvz) * invdet

    e1x = e1_ref[0, 0, :][None, :]
    e1y = e1_ref[0, 1, :][None, :]
    e1z = e1_ref[0, 2, :][None, :]
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (d0 * qx + d1 * qy + d2 * qz) * invdet

    e2x = e2_ref[0, 0, :][None, :]
    e2y = e2_ref[0, 1, :][None, :]
    e2z = e2_ref[0, 2, :][None, :]
    t = (e2x * qx + e2y * qy + e2z * qz) * invdet

    ok = ok_ref[0, 0, :][None, :] > 0
    hit = (
        (u > 0) & (u < 1) & (v > 0) & ((u + v) < 1) & (t >= TOL) & ok
    )
    # mask padded points/triangles
    n_t = nt_ref[0]
    TP, T = hit.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TP, T), 1)
    hit = hit & (col_ids < n_t)
    count_ref[0, 0, :] = jnp.sum(hit.astype(jnp.int32), axis=1)


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def pallas_mesh_contains_points(
    points: jnp.ndarray,
    triangles: jnp.ndarray,
    tile_p: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exterior test: points (B, P, 3), triangles (B, T, 3, 3) -> bool (B, P)."""
    B, P, _ = points.shape
    T = triangles.shape[1]
    d = jnp.asarray(RAY_DIRECTION, jnp.float32)

    v0 = triangles[:, :, 0].astype(jnp.float32)
    e1 = (triangles[:, :, 1] - triangles[:, :, 0]).astype(jnp.float32)
    e2 = (triangles[:, :, 2] - triangles[:, :, 0]).astype(jnp.float32)
    pvec = jnp.cross(jnp.broadcast_to(d, e2.shape), e2)
    dets = jnp.sum(e1 * pvec, axis=-1)
    ok = (jnp.abs(dets) >= TOL).astype(jnp.float32)
    invdet = 1.0 / (dets + 0.1 * TOL)

    PP = _round_up(P, tile_p)
    TP_ = _round_up(T, 128)

    def prep(a):  # (B, T, 3) -> (B, 3, Tpad), coord-major, lane-padded
        a = jnp.swapaxes(a, 1, 2)
        return jnp.pad(a, ((0, 0), (0, 0), (0, TP_ - T)))

    pts = jnp.pad(
        jnp.swapaxes(points.astype(jnp.float32), 1, 2),
        ((0, 0), (0, 0), (0, PP - P)),
    )
    invdet_p = jnp.pad(invdet, ((0, 0), (0, TP_ - T)))[:, None, :]
    ok_p = jnp.pad(ok, ((0, 0), (0, TP_ - T)))[:, None, :]
    n_p = jnp.full((1,), P, jnp.int32)
    n_t = jnp.full((1,), T, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, PP // tile_p),
        in_specs=[
            pl.BlockSpec((1, 3, tile_p), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 3, TP_), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 3, TP_), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 3, TP_), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 3, TP_), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, TP_), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, TP_), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_p), lambda b, i, *_: (b, 0, i)),
    )
    counts = pl.pallas_call(
        _raytri_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, PP), jnp.int32),
        interpret=interpret,
    )(n_p, n_t, pts, prep(v0), prep(e1), prep(e2), prep(pvec), invdet_p, ok_p)
    return (counts[:, 0, :P] % 2) == 0
