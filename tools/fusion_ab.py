"""In-context A/B of the stacked atlas chamfer-pair plane inside the full
train step.

compute_atlas_loss runs two same-shaped chamfer planes per step — the
centered pair and the final (trans/scale-applied) pair
(reference atlasbranch.py:199-287; models/losses.py).  Stacking them into
ONE chamfer_loss call on a (2B, N, M) plane keeps per-example math
bit-identical (the batched einsum contracts each example independently)
while halving the number of plane dispatches + min-reduction fusions.
Microbenchmarks lie on TPU (docs/trace_analysis.md), so this harness
compiles the full contact train step once per arm (monkeypatching
models.losses._STACK_ATLAS_PLANES at trace time, exactly like
chamfer_bwd_ab.py patches the backward form) and times the arms in
alternating windows so tunnel drift cancels.  Arms:

  stacked    one (2B, N, M) plane for the centered+final pair
  two_calls  the round-4 form: two (B, N, M) chamfer_loss calls

Both bf16 and fp32 compute_dtype rungs are timed.

    python tools/fusion_ab.py
    OBMAN_AB_CPU=1 OBMAN_AB_BATCH=4 OBMAN_AB_SIZE=64 \
        python tools/fusion_ab.py          # CPU smoke

Writes fusion_ab.json at the repo root.
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

    import bench
    import obman_train_tpu.models.losses as ml

    B = int(os.environ.get("OBMAN_AB_BATCH", 256))
    S = int(os.environ.get("OBMAN_AB_SIZE", 256))
    iters = int(os.environ.get("OBMAN_BENCH_ITERS", 20))

    gt = bench.make_synthetic_gt(B, S)
    nets = bench._models()

    shipped_default = ml._STACK_ATLAS_PLANES

    def build(net, stacked):
        # compute_atlas_loss branches on the module flag at trace time, so
        # flipping it before the compile selects the plane form per arm.
        ml._STACK_ATLAS_PLANES = stacked
        try:
            step, state, key = bench.build_train(net, gt, donate=False)
            state, losses = step(state, gt, key)  # compile under the patch
            loss0 = float(losses["total_loss"])
            return [step, state, key], loss0
        finally:
            ml._STACK_ATLAS_PLANES = shipped_default

    results = {"batch": B, "size": S, "iters": iters}
    for rung in ("contact_bf16", "contact"):
        built = {
            "stacked": build(nets[rung], True),
            "two_calls": build(nets[rung], False),
        }
        arms = {k: v[0] for k, v in built.items()}
        # same init + same batch => the first-step loss must agree.  Eager,
        # the stacked form is bit-identical (verified in
        # tests/test_losses.py); inside the jitted step XLA fuses the two
        # graphs differently, which can shift f32 low bits on the ~1e3-
        # magnitude chamfer values — allow that, nothing more.
        l_stacked, l_two = built["stacked"][1], built["two_calls"][1]
        rel = abs(l_stacked - l_two) / max(abs(l_two), 1e-9)
        assert rel < 1e-4, (l_stacked, l_two)

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

        entry = {"first_step_loss_rel_delta": rel}
        for k, v in times.items():
            ms = [round(t * 1e3, 2) for t in v]
            entry[k] = {"min_ms": min(ms), "windows_ms": ms}
            print(f"{rung}/{k}: min {min(ms):.2f} ms/step  windows {ms}",
                  flush=True)
        entry["stack_saves_ms"] = round(
            entry["two_calls"]["min_ms"] - entry["stacked"]["min_ms"], 2
        )
        results[rung] = entry

    name = ("fusion_ab_cpu.json" if os.environ.get("OBMAN_AB_CPU")
            else "fusion_ab.json")
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
