"""Quick on-chip timing of the two train-step bench configs.

Uses bench.py's shared harness (same synthetic batch, same donated
dependency-chained window) so stem/loss-path changes can be measured
without a full bench run:

    python tools/step_timing.py            # ~3 min incl. compiles
    OBMAN_BENCH_CPU=1 OBMAN_BENCH_BATCH=4 OBMAN_BENCH_SIZE=64 \
        python tools/step_timing.py        # CPU smoke
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax

    if os.environ.get("OBMAN_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import bench

    B = bench.BENCH_BATCH
    S = bench.BENCH_SIZE
    iters = bench.BENCH_ITERS
    gt = bench.make_synthetic_gt(B, S)
    nets = bench._models()

    for name, net_key in (("fp32", "contact"), ("bf16", "contact_bf16")):
        step, state, key = bench.build_train(nets[net_key], gt)
        dt, _ = bench.time_train_step(step, state, gt, key, iters)
        print(f"{name}: {dt * 1e3:.2f} ms/step, {B / dt:.0f} samples/s")


if __name__ == "__main__":
    main()
