"""In-context A/B of loss-graph form choices inside the full train step.

Microbenchmarks lie on TPU (docs/trace_analysis.md), so this harness
compiles the full contact train step once per arm (monkeypatching the
module-level form flag at trace time, exactly like chamfer_bwd_ab.py
patches the backward form) and times the arms in alternating windows so
tunnel drift cancels.  Experiments:

  atlas_stack    models.losses._STACK_ATLAS_PLANES — compute the
                 centered+final atlas chamfer pair as ONE (2B, N, M)
                 chamfer_loss call vs two (B, N, M) calls (per-example
                 math identical; eager bit-equal, tests/test_losses.py).
                 Round-5 verdict: stacking LOSES ~1.1 ms/step on both
                 rungs — two calls stay the default.
  onehot_gather  ops.contact._ONEHOT_GATHER — select each hand vert's
                 nearest object point as a one-hot MXU matmul vs
                 take_along_axis (whose AD transpose is a serialized
                 scatter-add the round-5 step budget measured at
                 2.9 ms/step, step_budget.json).  Forward values are
                 bit-identical (single 1*v product per output).

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
    import obman_train_tpu.ops.contact as ct

    B = int(os.environ.get("OBMAN_AB_BATCH", 256))
    S = int(os.environ.get("OBMAN_AB_SIZE", 256))
    iters = int(os.environ.get("OBMAN_BENCH_ITERS", 20))

    gt = bench.make_synthetic_gt(B, S)
    nets = bench._models()

    EXPERIMENTS = [
        ("atlas_stack", ml, "_STACK_ATLAS_PLANES",
         {"on": "stacked", "off": "two_calls"}),
        ("onehot_gather", ct, "_ONEHOT_GATHER",
         {"on": "onehot_matmul", "off": "gather_scatter"}),
    ]

    def build(net, module, attr, value):
        # The call sites branch on the module flag at trace time, so
        # flipping it before the compile selects the form for this arm.
        # compute_contact_loss is itself @jax.jit: its inner trace is
        # cached across arms (same static args, same avals), which would
        # silently pin every arm to the FIRST build's flag — clear it so
        # each arm really re-traces under its own patch.
        ct.compute_contact_loss.clear_cache()
        shipped = getattr(module, attr)
        setattr(module, attr, value)
        try:
            step, state, key = bench.build_train(net, gt, donate=False)
            state, losses = step(state, gt, key)  # compile under the patch
            loss0 = float(losses["total_loss"])
            return [step, state, key], loss0
        finally:
            setattr(module, attr, shipped)

    results = {"batch": B, "size": S, "iters": iters}
    for exp_name, module, attr, labels in EXPERIMENTS:
        results[exp_name] = {}
        for rung in ("contact_bf16", "contact"):
            built = {
                labels["on"]: build(nets[rung], module, attr, True),
                labels["off"]: build(nets[rung], module, attr, False),
            }
            arms = {k: v[0] for k, v in built.items()}
            # same init + same batch => the first-step loss must agree.
            # Eager both forms are bit-identical (tests/test_losses.py,
            # tests/test_contact.py); inside the jitted step XLA fuses the
            # two graphs differently, which can shift f32 low bits on the
            # ~1e3-magnitude loss values — allow that, nothing more.
            l_on = built[labels["on"]][1]
            l_off = built[labels["off"]][1]
            rel = abs(l_on - l_off) / max(abs(l_off), 1e-9)
            assert rel < 1e-4, (exp_name, rung, l_on, l_off)

            def window(arm):
                arm[1] = bench.train_window(arm[0], arm[1], gt, arm[2],
                                            iters)

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
                print(f"{exp_name}/{rung}/{k}: min {min(ms):.2f} ms/step  "
                      f"windows {ms}", flush=True)
            entry["on_saves_ms"] = round(
                entry[labels["off"]]["min_ms"]
                - entry[labels["on"]]["min_ms"], 2
            )
            results[exp_name][rung] = entry

    name = ("fusion_ab_cpu.json" if os.environ.get("OBMAN_AB_CPU")
            else "fusion_ab.json")
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
