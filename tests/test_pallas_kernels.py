"""Pallas kernels vs XLA reference ops, in interpret mode on CPU.

(On real TPU the same comparisons were verified during development:
chamfer max err ~1e-2 on ~1e4-scale squared distances (rel ~1e-6),
raytri exact agreement; pallas 3.5x vs XLA at 16k points, 25.5->7.4 ms.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from obman_train_tpu.assets import icosphere
from obman_train_tpu.ops.chamfer import chamfer_min_sqdist
from obman_train_tpu.ops.inside import batch_mesh_contains_points
from obman_train_tpu.ops.pallas import (
    pallas_chamfer_min_sqdist,
    pallas_mesh_contains_points,
)


def test_pallas_chamfer_matches_xla(rng):
    x = jnp.asarray(rng.normal(0, 50, (2, 300, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 50, (2, 200, 3)).astype(np.float32))
    mx_p, my_p = pallas_chamfer_min_sqdist(x, y, tile_n=128, interpret=True)
    mx_r, _, my_r, _ = chamfer_min_sqdist(x, y)
    np.testing.assert_allclose(np.asarray(mx_p), np.asarray(mx_r), atol=1e-2)
    np.testing.assert_allclose(np.asarray(my_p), np.asarray(my_r), atol=1e-2)


def test_pallas_chamfer_multi_tile_accumulation(rng):
    """y mins must accumulate correctly across several x tiles."""
    x = jnp.asarray(rng.normal(0, 50, (1, 700, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 50, (1, 130, 3)).astype(np.float32))
    mx_p, my_p = pallas_chamfer_min_sqdist(x, y, tile_n=128, interpret=True)
    mx_r, _, my_r, _ = chamfer_min_sqdist(x, y)
    np.testing.assert_allclose(np.asarray(my_p), np.asarray(my_r), atol=1e-2)
    np.testing.assert_allclose(np.asarray(mx_p), np.asarray(mx_r), atol=1e-2)


def test_pallas_chamfer_multi_y_tile(rng):
    """x mins (and argmins) must accumulate correctly across several
    y tiles (the 2D grid that bounds scoped VMEM at large M)."""
    x = jnp.asarray(rng.normal(0, 50, (2, 300, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 50, (2, 700, 3)).astype(np.float32))
    mx_r, ax_r, my_r, ay_r = chamfer_min_sqdist(x, y)
    mx_p, my_p = pallas_chamfer_min_sqdist(
        x, y, tile_n=128, tile_m=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(mx_p), np.asarray(mx_r), atol=1e-2)
    np.testing.assert_allclose(np.asarray(my_p), np.asarray(my_r), atol=1e-2)
    mx_p, ax_p, my_p, ay_p = pallas_chamfer_min_sqdist(
        x, y, tile_n=128, tile_m=256, interpret=True, with_argmin=True
    )
    np.testing.assert_allclose(np.asarray(mx_p), np.asarray(mx_r), atol=1e-2)
    np.testing.assert_allclose(np.asarray(my_p), np.asarray(my_r), atol=1e-2)
    # returned indices must achieve the min (ties may differ between the
    # direct-difference kernel and the rx+ry-2xy XLA formulation)
    from obman_train_tpu.ops.chamfer import batch_pairwise_sqdist

    d = np.asarray(batch_pairwise_sqdist(x, y))
    d_at_argx = np.take_along_axis(
        d, np.asarray(ax_p)[:, :, None], axis=2
    )[:, :, 0]
    np.testing.assert_allclose(d_at_argx, d.min(2), rtol=1e-4, atol=1e-2)
    d_at_argy = np.take_along_axis(
        d, np.asarray(ay_p)[:, None, :], axis=1
    )[:, 0, :]
    np.testing.assert_allclose(d_at_argy, d.min(1), rtol=1e-4, atol=1e-2)


def test_pallas_raytri_matches_xla(rng):
    verts, faces = icosphere(2)
    tris = jnp.asarray(
        np.broadcast_to((verts * 50)[faces], (2, len(faces), 3, 3)).copy()
    )
    pts = jnp.asarray(rng.normal(0, 60, (2, 150, 3)).astype(np.float32))
    ext_p = np.asarray(
        pallas_mesh_contains_points(pts, tris, tile_p=128, interpret=True)
    )
    ext_r = np.asarray(batch_mesh_contains_points(pts, tris))
    np.testing.assert_array_equal(ext_p, ext_r)


def test_pallas_raytri_inside_outside_semantics(rng):
    verts, faces = icosphere(2)
    tris = jnp.asarray((verts * 50)[faces][None])
    inner = rng.normal(0, 1, (1, 20, 3))
    inner = 25 * inner / np.linalg.norm(inner, axis=-1, keepdims=True)
    outer = inner * 4
    pts = jnp.asarray(
        np.concatenate([inner, outer], axis=1).astype(np.float32)
    )
    ext = np.asarray(
        pallas_mesh_contains_points(pts, tris, tile_p=128, interpret=True)
    )[0]
    assert not ext[:20].any()
    assert ext[20:].all()


def test_chamfer_loss_dispatch(rng):
    from obman_train_tpu.ops.chamfer import chamfer_loss

    preds = jnp.asarray(rng.normal(0, 1, (2, 50, 3)).astype(np.float32))
    gts = jnp.asarray(rng.normal(0, 1, (2, 40, 3)).astype(np.float32))
    l1a, l2a = chamfer_loss(preds, gts, use_pallas=False)
    # "auto" on CPU at small sizes stays on the XLA path
    l1b, l2b = chamfer_loss(preds, gts, use_pallas="auto")
    np.testing.assert_allclose(np.asarray(l1a), np.asarray(l1b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l2a), np.asarray(l2b), atol=1e-6)


def test_chamfer_auto_dispatch_rule(monkeypatch):
    """Auto-dispatch engages only when the per-example plane amortizes the
    kernel's per-program overhead AND the batch total is HBM-bound
    (measured crossover on v5e, see ops/chamfer.py)."""
    from obman_train_tpu.ops import chamfer

    monkeypatch.setattr(chamfer.jax, "default_backend", lambda: "tpu")

    def use(b, n, m):
        return chamfer._use_pallas(
            np.zeros((b, n, 3)), np.zeros((b, m, 3)), "auto"
        )

    assert not use(256, 600, 642)    # reference training config -> XLA
    assert not use(256, 778, 642)    # contact config -> XLA
    assert not use(1, 4096, 4096)    # small total -> XLA
    assert use(1, 8192, 8192)
    assert use(8, 4096, 4096)
    assert use(1, 16384, 16384)
    # memory guard: the XLA (B, N, M) plane would be ~4 GB — kernel
    # regardless of the per-example floor
    assert use(2048, 778, 642)
    assert not chamfer._use_pallas(
        np.zeros((1, 16384, 3)), np.zeros((1, 16384, 3)), False
    )


def test_pallas_chamfer_argmin_interpret(rng):
    """with_argmin variant agrees with XLA min+argmin (CPU interpret)."""
    import jax.numpy as jnp

    from obman_train_tpu.ops.chamfer import batch_pairwise_sqdist
    from obman_train_tpu.ops.pallas.chamfer_kernel import (
        pallas_chamfer_min_sqdist,
    )

    x = jnp.asarray(rng.normal(0, 40, (2, 300, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 40, (2, 200, 3)), jnp.float32)
    minx, argx, miny, argy = pallas_chamfer_min_sqdist(
        x, y, tile_n=128, interpret=True, with_argmin=True
    )
    d = batch_pairwise_sqdist(x, y)
    # direct-difference kernel vs the rx+ry-2xy XLA formulation: f32 noise
    np.testing.assert_allclose(np.asarray(minx), np.asarray(jnp.min(d, 2)),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(miny), np.asarray(jnp.min(d, 1)),
                               rtol=1e-4, atol=1e-2)
    # the returned index must ACHIEVE the min (exact index equality can
    # legitimately differ on near-ties between the two formulations)
    d_at_argx = np.take_along_axis(np.asarray(d), np.asarray(argx)[:, :, None],
                                   axis=2)[:, :, 0]
    np.testing.assert_allclose(d_at_argx, np.asarray(jnp.min(d, 2)),
                               rtol=1e-4, atol=1e-2)
    d_at_argy = np.take_along_axis(np.asarray(d), np.asarray(argy)[:, None, :],
                                   axis=1)[:, 0, :]
    np.testing.assert_allclose(d_at_argy, np.asarray(jnp.min(d, 1)),
                               rtol=1e-4, atol=1e-2)


def test_pallas_chamfer_vjp_matches_xla(rng, monkeypatch):
    """The custom VJP routes gradients exactly like XLA's min subgradient."""
    import jax
    import jax.numpy as jnp

    import obman_train_tpu.ops.pallas.chamfer_kernel as ck
    from obman_train_tpu.ops import chamfer

    # run the kernels in interpret mode on CPU
    orig = ck.pallas_chamfer_min_sqdist
    monkeypatch.setattr(
        ck, "pallas_chamfer_min_sqdist",
        lambda x, y, **kw: orig(x, y, **{**kw, "interpret": True}),
    )
    x = jnp.asarray(rng.normal(0, 40, (2, 300, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 40, (2, 257, 3)), jnp.float32)

    def loss(up):
        def f(a, b):
            l1, l2 = chamfer.chamfer_loss(a, b, use_pallas=up)
            return jnp.sum(l1) + 2.0 * jnp.sum(l2)
        return f

    gp = jax.grad(loss(True), argnums=(0, 1))(x, y)
    gx = jax.grad(loss(False), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-5, atol=1e-6)
