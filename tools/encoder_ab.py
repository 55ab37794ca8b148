"""In-context A/B of encoder-stem variants inside the full bf16 train step.

Compiles the contact train step once per arm (monkeypatching the
applicability gates at trace time), then times all arms in alternating
windows so tunnel drift cancels.  The model, synthetic batch, and
chained-window protocol come from bench.py's shared harness.  Arms:

  base      direct conv backward + select_and_scatter maxpool backward
  pool      + elementwise maxpool backward (ops/maxpool.py)
  stem      + space-to-depth conv backward (ops/stemconv.py)
  both      both custom backwards

    python tools/encoder_ab.py
    OBMAN_AB_CPU=1 OBMAN_AB_BATCH=4 OBMAN_AB_SIZE=64 \
        python tools/encoder_ab.py         # CPU smoke
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
# arms toggle the gates themselves; both customs are opt-in by default
os.environ["OBMAN_STEM_S2D"] = "1"
os.environ["OBMAN_POOL_EWBWD"] = "1"


def main():
    import jax

    if os.environ.get("OBMAN_AB_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import bench

    import obman_train_tpu.models.resnet as resnet_mod

    B = int(os.environ.get("OBMAN_AB_BATCH", 256))
    S = int(os.environ.get("OBMAN_AB_SIZE", 256))
    iters = int(os.environ.get("OBMAN_BENCH_ITERS", 20))

    gt = bench.make_synthetic_gt(B, S)
    net = bench._models()["contact_bf16"]

    stem_gate = resnet_mod.stem_conv_applicable
    pool_gate = resnet_mod.maxpool_3x3s2_applicable
    off = lambda *a: False

    def build(stem, pool):
        resnet_mod.stem_conv_applicable = stem_gate if stem else off
        resnet_mod.maxpool_3x3s2_applicable = pool_gate if pool else off
        try:
            step, state, key = bench.build_train(net, gt, donate=False)
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
        arm[1] = bench.train_window(arm[0], arm[1], gt, arm[2], iters)

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
