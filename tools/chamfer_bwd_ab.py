"""In-context A/B of the chamfer/contact backward inside the full train step.

Round-3 review: the standalone scatter-form backward measured 4.3 ms vs
~9.7 ms for AD-through-the-plane at the contact shape
(chamfer_tuning.json / mfu_ablation.json), but microbenchmarks lie on TPU
(docs/trace_analysis.md) — XLA overlaps "slow" ops with conv scheduling,
so only the full compiled train step decides.  This harness compiles the
contact train step once per arm (monkeypatching the chamfer module's
plane-path implementations at trace time, exactly like encoder_ab.py
patches the stem gates) and times the arms in alternating windows so
tunnel drift cancels.  Arms:

  scatter    the OBMAN_SCATTER_BWD=1 opt-in: parity-plane forward +
             scatter-form custom VJP (_plane_min_scatter /
             _plane_min_scatter_argmin)
  plane_ad   the shipped default backward: plain jnp.min over the
             (B, N, M) plane, AD re-touches the plane in the backward
             (this A/B is what flipped the default to plane_ad)

Both bf16 and fp32 compute_dtype rungs are timed (the bf16 step is the
MFU headline; the fp32 step is the parity default).

    python tools/chamfer_bwd_ab.py
    OBMAN_AB_CPU=1 OBMAN_AB_BATCH=4 OBMAN_AB_SIZE=64 \
        python tools/chamfer_bwd_ab.py     # CPU smoke

Writes chamfer_bwd_ab.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    if os.environ.get("OBMAN_AB_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import bench
    import obman_train_tpu.ops.chamfer as ch

    B = int(os.environ.get("OBMAN_AB_BATCH", 256))
    S = int(os.environ.get("OBMAN_AB_SIZE", 256))
    iters = int(os.environ.get("OBMAN_BENCH_ITERS", 20))

    gt = bench.make_synthetic_gt(B, S)
    nets = bench._models()

    shipped_default = ch._SCATTER_BWD

    def build(net, use_scatter):
        # The call sites branch on the module-level _SCATTER_BWD at trace
        # time (ops/chamfer.py), so flipping it before the compile selects
        # the backward form for this arm.  compute_contact_loss is itself
        # @jax.jit and caches its inner trace across arms — clear it so
        # the contact-side chamfer_min_sqdist really re-traces under the
        # patch (without this, every arm's CONTACT plane kept the first
        # build's backward form and only the atlas chamfer_loss flipped).
        from obman_train_tpu.ops.contact import compute_contact_loss

        compute_contact_loss.clear_cache()
        ch._SCATTER_BWD = use_scatter
        try:
            step, state, key = bench.build_train(net, gt, donate=False)
            state, losses = step(state, gt, key)  # compile under the patch
            float(losses["total_loss"])
            return [step, state, key]
        finally:
            ch._SCATTER_BWD = shipped_default

    results = {"batch": B, "size": S, "iters": iters}
    for rung in ("contact_bf16", "contact"):
        arms = {
            "scatter": build(nets[rung], True),
            "plane_ad": build(nets[rung], False),
        }

        def window(arm):
            arm[1] = bench.train_window(arm[0], arm[1], gt, arm[2], iters)

        for arm in arms.values():  # warm full windows
            window(arm)

        times = {k: [] for k in arms}
        for _ in range(3):
            for k, arm in arms.items():
                t0 = time.perf_counter()
                window(arm)
                times[k].append((time.perf_counter() - t0) / iters)

        entry = {}
        for k, v in times.items():
            ms = [round(t * 1e3, 2) for t in v]
            entry[k] = {"min_ms": min(ms), "windows_ms": ms}
            print(f"{rung}/{k}: min {min(ms):.2f} ms/step  windows {ms}",
                  flush=True)
        entry["scatter_saves_ms"] = round(
            entry["plane_ad"]["min_ms"] - entry["scatter"]["min_ms"], 2
        )
        results[rung] = entry

    # CPU smokes must not clobber the on-disk real-TPU numbers
    name = ("chamfer_bwd_ab_cpu.json" if os.environ.get("OBMAN_AB_CPU")
            else "chamfer_bwd_ab.json")
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
