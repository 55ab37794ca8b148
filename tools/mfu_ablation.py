"""Train-step MFU attribution on the real TPU.

Times an ablation ladder of full train steps (fwd+bwd+adam, donated,
dependency-chained like bench.py) so the cost of each loss stage is the
DIFFERENCE between rungs:

  hands_only     -> encoder + MANO branch + mano losses
  hand_object    -> + AtlasNet decoder + chamfer/edge/laplacian losses
  contact        -> + contact attraction / collision repulsion
  contact_bf16   -> the same, bfloat16 compute dtype

plus standalone timings of the contact-loss op (fwd and grad) at the
train shapes, and an optional ``--profile_dir`` capture of a 10-step
trace for offline inspection.

Writes one JSON blob to stdout and to ``mfu_ablation.json``.
Usage:  python tools/mfu_ablation.py [--batch 256] [--size 256]
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--profile_dir", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import bench

    from obman_train_tpu.ops.contact import compute_contact_loss

    B, S, iters = args.batch, args.size, args.iters
    peak = bench._peak_flops(jax.devices()[0])
    nets = bench._models()
    rng = np.random.default_rng(0)
    gt = bench.make_synthetic_gt(B, S)
    results = {"batch": B, "size": S, "iters": iters}

    prev_ms = None
    for name in ("hands_only", "hand_object", "contact", "contact_bf16"):
        step, state, key = bench.build_train(nets[name], gt)
        flops = bench._flops_of(step, (state, gt, key))
        dt, state = bench.time_train_step(step, state, gt, key, iters)
        entry = {
            "samples_per_sec": B / dt,
            "step_ms": dt * 1e3,
        }
        if flops and peak:
            entry["mfu_pct"] = round(100.0 * flops / dt / peak, 2)
            entry["tflops_per_step"] = round(flops / 1e12, 3)
        if prev_ms is not None and not name.endswith("bf16"):
            entry["delta_ms_vs_prev_rung"] = dt * 1e3 - prev_ms
        if not name.endswith("bf16"):
            prev_ms = dt * 1e3
        results[f"train_{name}"] = entry
        print(name, entry, flush=True)

    # standalone contact op at train shapes: hand 778 verts vs the atlas
    # icosphere (642 verts / 1280 faces), batch B
    from obman_train_tpu.assets import icosphere

    ico_v, ico_f = icosphere(3)
    hand = jnp.asarray(rng.normal(0, 30, (B, 778, 3)), jnp.float32)
    obj = jnp.asarray(
        rng.normal(0, 1, (B,) + ico_v.shape), jnp.float32
    ) * 40.0
    faces = jnp.asarray(ico_f, jnp.int32)

    def contact_total(hand, obj):
        attr, rep, _, _ = compute_contact_loss(hand, obj, faces)
        return attr + rep

    for label, fn in (
        ("contact_op_fwd", jax.jit(contact_total)),
        ("contact_op_grad", jax.jit(jax.grad(contact_total, argnums=(0, 1)))),
    ):
        dt = bench._timeit(fn, (hand, obj), iters=iters)
        results[label] = {"ms": dt * 1e3, "per_sample_us": dt / B * 1e6}
        print(label, results[label], flush=True)

    if args.profile_dir:
        step, state, key = bench.build_train(nets["contact"], gt)
        for _ in range(5):
            state, losses = step(state, gt, key)
        float(losses["total_loss"])
        with jax.profiler.trace(args.profile_dir):
            for _ in range(10):
                state, losses = step(state, gt, key)
            float(losses["total_loss"])
        results["profile_dir"] = args.profile_dir

    with open(os.path.join(REPO, "mfu_ablation.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
