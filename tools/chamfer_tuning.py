"""Measure chamfer min/argmin variants at the train-step shapes on TPU.

The train step runs three chamfer-family ops per step at small per-example
planes (778x642 contact, 600x642 atlas), currently on the XLA path which
materializes the (B, N, M) plane in HBM for fwd AND bwd (~0.5 GB each).
This harness times the alternatives so the dispatch crossover is measured,
not guessed:

  xla_fwd / xla_grad           jnp matmul+min path (current dispatch)
  pallas_fwd / pallas_grad     fused kernel + custom VJP (current kernel)
  pallas_fwd_1tile             same, single x-tile per example
  scatter_bwd                  the custom VJP's scatter-add alone
  minonly_xla / minonly_pallas the stop-gradient GT-distance path

Usage: python -u tools/chamfer_tuning.py [--batch 256] [--iters 30]
Writes chamfer_tuning.json next to the repo root.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from obman_train_tpu.ops.chamfer import (
        _pallas_min_sqdists_argmin,
        batch_pairwise_sqdist,
    )
    from obman_train_tpu.ops.pallas.chamfer_kernel import (
        pallas_chamfer_min_sqdist,
    )

    B, iters = args.batch, args.iters
    rng = np.random.default_rng(0)
    results = {"batch": B, "iters": iters}

    def xla_min4(x, y):
        d = batch_pairwise_sqdist(x, y)
        return (
            jnp.min(d, axis=2),
            jnp.argmin(d, axis=2),
            jnp.min(d, axis=1),
            jnp.argmin(d, axis=1),
        )

    def loss_like_contact(min4, x, y):
        """Gradient path shaped like the contact loss: gather the winning
        y per x, diff against x, plus a miny term (contact_sym)."""
        minx, argx, miny, _ = min4(x, y)
        y_sel = jnp.take_along_axis(y, argx[..., None], axis=1)
        return (
            jnp.sum((y_sel - x) ** 2)
            + jnp.sum(jnp.where(minx < 625.0, minx, 0.0))
            + jnp.sum(miny)
        )

    for name, (N, M) in (("contact_778x642", (778, 642)),
                         ("atlas_600x642", (600, 642))):
        x = jnp.asarray(rng.normal(0, 30, (B, N, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(0, 30, (B, M, 3)), jnp.float32)
        entry = {}

        fns = {
            "xla_fwd": jax.jit(xla_min4),
            "pallas_fwd": jax.jit(
                lambda x, y: pallas_chamfer_min_sqdist(x, y, with_argmin=True)
            ),
            "pallas_fwd_1tile": jax.jit(
                lambda x, y: pallas_chamfer_min_sqdist(
                    x, y, tile_n=((x.shape[1] + 127) // 128) * 128,
                    with_argmin=True)
            ),
            "pallas_fwd_minonly": jax.jit(
                lambda x, y: pallas_chamfer_min_sqdist(x, y)
            ),
            "xla_fwd_minonly": jax.jit(
                lambda x, y: (
                    jnp.min(batch_pairwise_sqdist(x, y), axis=2))
            ),
            "xla_grad": jax.jit(jax.grad(
                lambda x, y: loss_like_contact(xla_min4, x, y),
                argnums=(0, 1))),
            "pallas_grad": jax.jit(jax.grad(
                lambda x, y: loss_like_contact(
                    _pallas_min_sqdists_argmin, x, y),
                argnums=(0, 1))),
        }
        for label, fn in fns.items():
            dt = bench._timeit(fn, (x, y), iters=iters)
            entry[label] = round(dt * 1e3, 3)
            print(f"{name} {label}: {dt*1e3:.3f} ms", flush=True)

        # the custom VJP's scatter-add alone (gy = zeros.at[b, argx].add(g))
        argx = np.asarray(fns["xla_fwd"](x, y)[1])
        g = jnp.asarray(rng.normal(0, 1, (B, N, 3)), jnp.float32)
        argx = jnp.asarray(argx)

        def scatter(g, argx):
            b_idx = jnp.arange(B)[:, None]
            return jnp.zeros((B, M, 3), jnp.float32).at[b_idx, argx].add(g)

        dt = bench._timeit(jax.jit(scatter), (g, argx), iters=iters)
        entry["scatter_bwd"] = round(dt * 1e3, 3)
        print(f"{name} scatter_bwd: {dt*1e3:.3f} ms", flush=True)
        results[name] = entry

    with open(os.path.join(REPO, "chamfer_tuning.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
