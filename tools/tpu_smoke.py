"""On-chip smoke: run the hot paths on the real TPU and assert they agree
with the XLA reference paths.

The pytest suite pins the cpu backend (tests/conftest.py), so compiled-TPU
behaviour — Mosaic kernel lowering, bf16-class default matmuls, the axon
tunnel — is only exercised here and in bench.py.  Run after any kernel or
precision change:

    python tools/tpu_smoke.py            # ~3-5 min incl. compiles

Checks (each prints PASS):
  1. Pallas chamfer (fused small-y layout) vs XLA at the reference
     contact config, mins + achieved-argmin.
  2. Pallas chamfer (split large-y layout, multi-tile accumulation) vs
     XLA at 1x8192^2 — the config that exposed the non-consecutive
     output-revisit miscompilation.
  3. Chamfer custom-VJP gradient vs XLA gradient at an auto-dispatch
     config.
  4. Pallas ray-parity inside test vs the XLA path on icosphere
     triangles.
  5. One full train step (all losses incl. contact): finite losses.
  6. Headline inference: finite verts/joints/objpoints, f32 vs bf16
     encoder delta within documented bounds (<0.1 mm verts, <2 mm obj).
  7. Stem-conv space-to-depth backward vs direct backward (fwd
     bit-identical, grads agree).
  8. geometry_dtype selection-plane rungs: f32_select neighbor parity,
     bf16 near-tie excess bound, contact-loss agreement per rung.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform != "tpu":
        print("WARNING: not a TPU — this smoke is meant for the real chip")

    rng = np.random.default_rng(0)

    # 1) fused small-y chamfer at the contact config
    from obman_train_tpu.ops.chamfer import (
        batch_pairwise_sqdist,
        chamfer_loss,
    )
    from obman_train_tpu.ops.pallas.chamfer_kernel import (
        pallas_chamfer_min_sqdist,
    )

    x = jnp.asarray(rng.normal(0, 40, (8, 778, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 40, (8, 642, 3)), jnp.float32)
    minx, argx, miny, argy = [
        np.asarray(v) for v in pallas_chamfer_min_sqdist(x, y, with_argmin=True)
    ]
    d = np.asarray(batch_pairwise_sqdist(x, y))
    np.testing.assert_allclose(minx, d.min(2), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(miny, d.min(1), rtol=1e-4, atol=1e-2)
    d_at = np.take_along_axis(d, argx[:, :, None], 2)[:, :, 0]
    np.testing.assert_allclose(d_at, d.min(2), rtol=1e-4, atol=1e-2)
    print("PASS 1: fused chamfer kernel @ contact config")

    # 2) split large-y chamfer (multi-tile accumulation)
    N = 8192
    x = jnp.asarray(rng.normal(0, 40, (1, N, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 40, (1, N, 3)), jnp.float32)
    minx, argx, miny, argy = pallas_chamfer_min_sqdist(x, y, with_argmin=True)

    @jax.jit
    def xla_ref(x, y):
        d = batch_pairwise_sqdist(x, y)
        return jnp.min(d, 2), jnp.argmin(d, 2), jnp.min(d, 1), jnp.argmin(d, 1)

    rminx, rargx, rminy, rargy = xla_ref(x, y)
    np.testing.assert_allclose(
        np.asarray(minx), np.asarray(rminx), rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(miny), np.asarray(rminy), rtol=1e-4, atol=1e-2
    )
    mismatch = int((np.asarray(argx) != np.asarray(rargx)).sum())
    assert mismatch <= N // 1000, f"argmin mismatch rows: {mismatch}"
    print(f"PASS 2: split chamfer kernel @ 1x{N}^2 (argmin diff rows: {mismatch})")

    # 3) custom-VJP gradient at an auto-dispatch config
    def cham_sum(a, b, up):
        l1, l2 = chamfer_loss(a, b, use_pallas=up)
        return jnp.mean(l1 + l2)

    gx = np.asarray(jax.jit(jax.grad(lambda a, b: cham_sum(a, b, False)))(x, y))
    gp = np.asarray(jax.jit(jax.grad(lambda a, b: cham_sum(a, b, True)))(x, y))
    bad_rows = int(
        (~np.all(np.isclose(gx[0], gp[0], rtol=1e-3, atol=1e-4), axis=1)).sum()
    )
    # a handful of rows may legitimately differ on near-tied neighbors
    # (the kernel's direct-difference distances vs XLA's rx+ry-2xy)
    assert bad_rows <= N // 1000, f"grad mismatch rows: {bad_rows}"
    print(f"PASS 3: chamfer custom VJP (grad diff rows: {bad_rows})")

    # 4) ray-parity kernel vs XLA
    from obman_train_tpu.assets import icosphere
    from obman_train_tpu.ops.inside import batch_mesh_contains_points
    from obman_train_tpu.ops.pallas import pallas_mesh_contains_points

    verts, faces = icosphere(3)
    tris = jnp.asarray(
        np.broadcast_to((verts * 50)[faces], (4, len(faces), 3, 3)).copy()
    )
    pts = jnp.asarray(rng.normal(0, 60, (4, 778, 3)).astype(np.float32))
    ext_p = np.asarray(pallas_mesh_contains_points(pts, tris))
    ext_r = np.asarray(batch_mesh_contains_points(pts, tris))
    np.testing.assert_array_equal(ext_p, ext_r)
    print("PASS 4: ray-parity kernel")

    # 5) full train step
    from obman_train_tpu.assets import synthetic_mano_assets
    from obman_train_tpu.config import (
        AtlasConfig,
        ContactConfig,
        ModelConfig,
        TrainConfig,
    )
    from obman_train_tpu.models import (
        BatchSpec,
        build_handnet,
        mano_params_from_assets,
    )
    from obman_train_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    mano_r = mano_params_from_assets(synthetic_mano_assets("right"))
    mano_l = mano_params_from_assets(synthetic_mano_assets("left"))

    def make(dtype):
        return build_handnet(
            ModelConfig(
                atlas=AtlasConfig(predict_trans=True, predict_scale=True),
                contact=ContactConfig(
                    contact_lambda=0.167, collision_lambda=0.167
                ),
                compute_dtype=dtype,
            ),
            mano_r,
            mano_l,
        )

    net = make("float32")
    B, S = 16, 256
    gt = {
        "images": jnp.asarray(rng.normal(0, 0.3, (B, S, S, 3)), jnp.float32),
        "sides": jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32),
        "joints3d": jnp.asarray(rng.normal(0, 30, (B, 21, 3)), jnp.float32),
        "verts3d": jnp.asarray(rng.normal(0, 30, (B, 778, 3)), jnp.float32),
        "objpoints3d": jnp.asarray(rng.normal(0, 50, (B, 600, 3)), jnp.float32),
    }
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, gt, spec)
    step = make_train_step(net, tx, spec, donate=True)
    state, losses = step(state, gt, jax.random.PRNGKey(0))
    for k, v in losses.items():
        if v is not None:
            assert np.isfinite(float(v)), f"{k} not finite"
    print(f"PASS 5: train step (total_loss={float(losses['total_loss']):.2f})")

    # 6) inference f32 vs bf16 encoder
    infer_spec = BatchSpec(
        has_joints3d=False, has_verts3d=False, has_objpoints3d=False,
        has_camintrs=False, has_center3d=False,
    )
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        {"images": gt["images"], "sides": gt["sides"]},
        infer_spec, no_loss=True, force_hand=True, force_objects=True,
    )

    def infer(net):
        def fn(variables, images, sides):
            _, res, _ = net.apply(
                variables, {"images": images, "sides": sides}, infer_spec,
                no_loss=True, force_hand=True, force_objects=True,
            )
            return res["verts"], res["joints"], res["objpoints3d"]
        return jax.jit(fn)

    out32 = infer(net)(variables, gt["images"], gt["sides"])
    out16 = infer(make("bfloat16"))(variables, gt["images"], gt["sides"])
    for o in out32:
        assert bool(jnp.isfinite(o).all())
    dv = float(jnp.max(jnp.abs(out32[0] - out16[0].astype(jnp.float32))))
    do = float(jnp.max(jnp.abs(out32[2] - out16[2].astype(jnp.float32))))
    # envelope for the realistic-mm synthetic hand (~200 mm span: bf16's
    # ~0.4% resolution puts worst-case verts deltas near 1 mm; the measured
    # delta is recorded in bench_details.json's hand_object_bf16 entry)
    assert dv < 1.0, f"bf16 verts delta {dv} mm"
    assert do < 2.0, f"bf16 objpoints delta {do} mm"
    print(f"PASS 6: inference (bf16 deltas: verts {dv:.3f} mm, obj {do:.3f} mm)")

    # 7) stem-conv space-to-depth backward vs direct backward, on-chip
    from obman_train_tpu.ops.stemconv import _conv_direct, stem_conv7x7

    xs = jnp.asarray(rng.normal(0, 1, (32, 256, 256, 3)), jnp.bfloat16)
    ws = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 64)), jnp.bfloat16)
    cot = jnp.asarray(rng.normal(0, 1, (32, 128, 128, 64)), jnp.bfloat16)

    def g(fn):
        return jax.jit(
            jax.grad(
                lambda x, w: jnp.vdot(
                    fn(x, w).astype(jnp.float32), cot.astype(jnp.float32)
                ),
                argnums=(0, 1),
            )
        )(xs, ws)

    gx_d, gw_d = [np.asarray(v, np.float32) for v in g(_conv_direct)]
    gx_s, gw_s = [np.asarray(v, np.float32) for v in g(stem_conv7x7)]
    np.testing.assert_allclose(gx_s, gx_d, rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(
        gw_s, gw_d, rtol=2e-2, atol=2e-2 * float(np.abs(gw_d).max())
    )
    fwd_delta = float(
        jnp.max(jnp.abs(stem_conv7x7(xs, ws).astype(jnp.float32)
                        - _conv_direct(xs, ws).astype(jnp.float32)))
    )
    assert fwd_delta == 0.0, f"stem forward not bit-identical: {fwd_delta}"
    print("PASS 7: stem-conv s2d backward (fwd bit-identical, grads agree)")

    # 8) geometry_dtype selection-plane rungs on the real MXU: f32 select
    # matches the parity path's neighbors; bf16 select flips only
    # near-ties (value excess bounded by the plane's resolution at the
    # rx+ry-2xy magnitude); contact loss agrees per rung.
    from obman_train_tpu.ops.chamfer import chamfer_min_sqdist
    from obman_train_tpu.ops.contact import compute_contact_loss

    xg = jnp.asarray(rng.normal(0, 60, (4, 778, 3)), jnp.float32)
    yg = jnp.asarray(rng.normal(0, 60, (4, 642, 3)), jnp.float32)
    base = [np.asarray(v) for v in chamfer_min_sqdist(xg, yg)]
    sel32 = [
        np.asarray(v)
        for v in chamfer_min_sqdist(xg, yg, plane_dtype=jnp.float32)
    ]
    agree32 = float((base[1] == sel32[1]).mean())
    assert agree32 > 0.999, f"f32_select argmin agreement {agree32}"
    np.testing.assert_allclose(base[0], sel32[0], atol=5e-2)
    sel16 = [
        np.asarray(v)
        for v in chamfer_min_sqdist(xg, yg, plane_dtype=jnp.bfloat16)
    ]
    mag = float(
        (np.asarray(xg) ** 2).sum(-1).max()
        + (np.asarray(yg) ** 2).sum(-1).max()
    )
    excess = float(np.max(sel16[0] - base[0]))
    assert excess < 2.0 ** -8 * mag, f"bf16 select excess {excess}"
    agree16 = float((base[1] == sel16[1]).mean())
    verts50, faces_ico = icosphere(2)
    hand = jnp.asarray(rng.normal(0, 30, (2, 778, 3)), jnp.float32)
    obj = jnp.asarray(
        40.0 * np.asarray(verts50)[None] + rng.normal(0, 1, (2, 1, 3)),
        jnp.float32,
    )
    cvals = {}
    for gd in ("float32", "float32_select", "bfloat16"):
        attr, pen, _, _ = compute_contact_loss(
            hand, obj, jnp.asarray(faces_ico),
            contact_mode="dist_tanh", collision_mode="dist_tanh",
            contact_zones="zones", geometry_dtype=gd,
        )
        cvals[gd] = (float(attr), float(pen))
    a0, p0 = cvals["float32"]
    assert abs(cvals["float32_select"][0] - a0) <= 1e-4 + 1e-4 * abs(a0)
    assert abs(cvals["float32_select"][1] - p0) <= 1e-4 + 1e-4 * abs(p0)
    assert abs(cvals["bfloat16"][0] - a0) <= 0.05 + 0.05 * abs(a0)
    assert abs(cvals["bfloat16"][1] - p0) <= 0.05 + 0.05 * abs(p0)
    print(
        f"PASS 8: geometry_dtype rungs (f32sel agree {agree32:.4f}, "
        f"bf16sel agree {agree16:.3f}, excess {excess:.2f} < "
        f"{2.0 ** -8 * mag:.2f})"
    )

    print("TPU smoke: ALL PASS")


if __name__ == "__main__":
    main()
