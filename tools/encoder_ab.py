"""In-context A/B of encoder-stem variants inside the full bf16 train step.

Compiles the contact train step once per arm (monkeypatching the
applicability gates at trace time), then times all arms in alternating
windows so tunnel drift cancels.  Arms:

  base      direct conv backward + select_and_scatter maxpool backward
  pool      + elementwise maxpool backward (ops/maxpool.py)
  stem      + space-to-depth conv backward (ops/stemconv.py)
  both      both custom backwards

    python tools/encoder_ab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
# arms toggle the gates themselves; both customs are opt-in by default
os.environ["OBMAN_STEM_S2D"] = "1"
os.environ["OBMAN_POOL_EWBWD"] = "1"


def main():
    import jax
    import jax.numpy as jnp

    import obman_train_tpu.models.resnet as resnet_mod
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

    B, S = 256, 256
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

    net = build_handnet(
        ModelConfig(
            atlas=AtlasConfig(predict_trans=True, predict_scale=True),
            contact=ContactConfig(contact_lambda=0.167, collision_lambda=0.167),
            compute_dtype="bfloat16",
        ),
        mano_r,
        mano_l,
    )
    tx = make_optimizer(TrainConfig())

    stem_gate = resnet_mod.stem_conv_applicable
    pool_gate = resnet_mod.maxpool_3x3s2_applicable
    off = lambda *a: False

    def build(stem, pool):
        resnet_mod.stem_conv_applicable = stem_gate if stem else off
        resnet_mod.maxpool_3x3s2_applicable = pool_gate if pool else off
        try:
            state = create_train_state(net, tx, gt, spec)
            step = make_train_step(net, tx, spec, donate=False)
            key = jax.random.PRNGKey(0)
            state, losses = step(state, gt, key)  # compile under the patch
            float(losses["total_loss"])
            return [step, state, key]
        finally:
            resnet_mod.stem_conv_applicable = stem_gate
            resnet_mod.maxpool_3x3s2_applicable = pool_gate

    arms = {
        "base": build(False, False),
        "pool": build(False, True),
        "stem": build(True, False),
        "both": build(True, True),
    }

    def window(arm):
        step, state, key = arm
        acc = None
        for _ in range(iters):
            state, losses = step(state, gt, key)
            acc = (
                losses["total_loss"] if acc is None
                else acc + losses["total_loss"]
            )
        float(acc)
        arm[1] = state

    for arm in arms.values():  # warm full windows
        window(arm)

    times = {k: [] for k in arms}
    for _ in range(3):
        for k, arm in arms.items():
            t0 = time.perf_counter()
            window(arm)
            times[k].append((time.perf_counter() - t0) / iters)

    for k, v in times.items():
        ms = [f"{t * 1e3:.2f}" for t in v]
        print(f"{k}: min {min(v) * 1e3:.2f} ms/step  windows {ms}")


if __name__ == "__main__":
    main()
