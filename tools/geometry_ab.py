"""In-context A/B of geometry selection-plane rungs inside the full
contact train step (all losses, Adam), following tools/encoder_ab.py's
protocol: one executable per arm, warmed full windows, alternating timing
windows so tunnel drift cancels.

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
    import jax.numpy as jnp

    if os.environ.get("OBMAN_AB_CPU"):
        jax.config.update("jax_platforms", "cpu")

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

    B = int(os.environ.get("OBMAN_AB_BATCH", 256))
    S = int(os.environ.get("OBMAN_AB_SIZE", 256))
    iters = int(os.environ.get("OBMAN_BENCH_ITERS", 20))
    rng = np.random.default_rng(0)

    mano_r = mano_params_from_assets(synthetic_mano_assets("right"))
    mano_l = mano_params_from_assets(synthetic_mano_assets("left"))
    gt = {
        "images": jnp.asarray(rng.normal(0, 0.3, (B, S, S, 3)), jnp.float32),
        "sides": jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32),
        "joints3d": jnp.asarray(rng.normal(0, 30, (B, 21, 3)), jnp.float32),
        "verts3d": jnp.asarray(rng.normal(0, 30, (B, 778, 3)), jnp.float32),
        "objpoints3d": jnp.asarray(
            rng.normal(0, 50, (B, 600, 3)), jnp.float32
        ),
    }
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())

    def build(compute_dtype, geometry_dtype):
        net = build_handnet(
            ModelConfig(
                atlas=AtlasConfig(predict_trans=True, predict_scale=True),
                contact=ContactConfig(
                    contact_lambda=0.167, collision_lambda=0.167
                ),
                compute_dtype=compute_dtype,
                geometry_dtype=geometry_dtype,
            ),
            mano_r,
            mano_l,
        )
        state = create_train_state(net, tx, gt, spec)
        step = make_train_step(net, tx, spec, donate=False)
        key = jax.random.PRNGKey(0)
        _, losses = step(state, gt, key)  # compile; do NOT advance state
        first_losses = {
            k: float(v)
            for k, v in losses.items()
            if v is not None and np.ndim(v) == 0
        }
        return {"step": step, "state": state, "key": key,
                "first_losses": first_losses}

    arm_specs = [
        ("bf16/f32", "bfloat16", "float32"),
        ("bf16/f32sel", "bfloat16", "float32_select"),
        ("bf16/bf16sel", "bfloat16", "bfloat16"),
        ("f32/f32", "float32", "float32"),
        ("f32/f32sel", "float32", "float32_select"),
    ]
    arms = {}
    for name, cd, gd in arm_specs:
        print(f"compiling {name} ...", flush=True)
        arms[name] = build(cd, gd)

    def window(arm):
        step, state, key = arm["step"], arm["state"], arm["key"]
        acc = None
        for _ in range(iters):
            state, losses = step(state, gt, key)
            acc = (
                losses["total_loss"] if acc is None
                else acc + losses["total_loss"]
            )
        float(acc)
        arm["state"] = state

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

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "geometry_ab.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["arms"], indent=1))


if __name__ == "__main__":
    main()
