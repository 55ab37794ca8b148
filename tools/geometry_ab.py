"""In-context A/B of geometry selection-plane rungs inside the full
contact train step (all losses, Adam), following tools/encoder_ab.py's
protocol: one executable per arm, warmed full windows, alternating timing
windows so tunnel drift cancels.  Models, the synthetic batch, and the
chained-window timing come from bench.py's shared harness so every
harness measures the SAME workload.

Arms (x compute_dtype in {bfloat16, float32}):

  f32        parity path (AD through the (B, N, M) plane)
  f32sel     f32 selection plane, exact gather-recompute values
             (backward never touches the plane)
  bf16sel    one-MXU-pass bf16 selection plane + exact f32 recompute

Also records the per-arm loss values from identical inputs so the parity
deltas of each rung travel with the timing numbers.

    python tools/geometry_ab.py            # real TPU
    OBMAN_AB_CPU=1 python tools/geometry_ab.py   # smoke on CPU
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax

    if os.environ.get("OBMAN_AB_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import bench

    B = int(os.environ.get("OBMAN_AB_BATCH", 256))
    S = int(os.environ.get("OBMAN_AB_SIZE", 256))
    iters = int(os.environ.get("OBMAN_BENCH_ITERS", 20))

    gt = bench.make_synthetic_gt(B, S)
    nets = bench._models()

    def build(net_key):
        step, state, key = bench.build_train(nets[net_key], gt, donate=False)
        _, losses = step(state, gt, key)  # compile; do NOT advance state
        first_losses = {
            k: float(v)
            for k, v in losses.items()
            if v is not None and np.ndim(v) == 0
        }
        return {"step": step, "state": state, "key": key,
                "first_losses": first_losses}

    arm_specs = [
        ("bf16/f32", "contact_bf16"),
        ("bf16/f32sel", "contact_bf16_f32sel"),
        ("bf16/bf16sel", "contact_bf16_bf16sel"),
        ("f32/f32", "contact"),
        ("f32/f32sel", "contact_f32sel"),
    ]
    arms = {}
    for name, net_key in arm_specs:
        print(f"compiling {name} ...", flush=True)
        arms[name] = build(net_key)

    def window(arm):
        arm["state"] = bench.train_window(
            arm["step"], arm["state"], gt, arm["key"], iters
        )

    for name, arm in arms.items():  # warm full windows
        print(f"warming {name} ...", flush=True)
        window(arm)

    times = {k: [] for k in arms}
    for _ in range(3):
        for k, arm in arms.items():
            t0 = time.perf_counter()
            window(arm)
            times[k].append((time.perf_counter() - t0) / iters)

    out = {"batch": B, "size": S, "iters": iters,
           "device": jax.devices()[0].device_kind, "arms": {}}
    for k, v in times.items():
        ms = min(v) * 1e3
        out["arms"][k] = {
            "ms_per_step": round(ms, 2),
            "samples_per_sec": round(B / min(v), 1),
            "windows_ms": [round(t * 1e3, 2) for t in v],
            "first_step_losses": arms[k]["first_losses"],
        }
        print(f"{k}: min {ms:.2f} ms/step")

    # parity deltas of each rung vs its compute-dtype's parity arm
    for base, rungs in (
        ("bf16/f32", ["bf16/f32sel", "bf16/bf16sel"]),
        ("f32/f32", ["f32/f32sel"]),
    ):
        ref = arms[base]["first_losses"]
        for r in rungs:
            deltas = {
                k: abs(v - ref[k])
                for k, v in arms[r]["first_losses"].items()
                if k in ref
            }
            out["arms"][r]["loss_abs_delta_vs_parity"] = {
                k: round(v, 6) for k, v in sorted(
                    deltas.items(), key=lambda kv: -kv[1]
                )[:6]
            }

    # CPU smokes must not clobber the committed real-TPU measurement
    name = (
        "geometry_ab_cpu.json"
        if os.environ.get("OBMAN_AB_CPU")
        else "geometry_ab.json"
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", name)
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["arms"], indent=1))


if __name__ == "__main__":
    main()
