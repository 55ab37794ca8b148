"""Quick on-chip timing of the two train-step bench configs.

Mirrors bench.py's bench_train (donated, dependency-chained, warmed) so
stem/loss-path changes can be measured without a full bench run:

    python tools/step_timing.py            # ~3 min incl. compiles
"""

from __future__ import annotations

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

    B = int(os.environ.get("OBMAN_BENCH_BATCH", 256))
    S = 256
    iters = int(os.environ.get("OBMAN_BENCH_ITERS", 30))
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

    for name, dtype in (("fp32", "float32"), ("bf16", "bfloat16")):
        net = build_handnet(
            ModelConfig(
                atlas=AtlasConfig(predict_trans=True, predict_scale=True),
                contact=ContactConfig(
                    contact_lambda=0.167, collision_lambda=0.167
                ),
                compute_dtype=dtype,
            ),
            mano_r,
            mano_l,
        )
        tx = make_optimizer(TrainConfig())
        state = create_train_state(net, tx, gt, spec)
        step = make_train_step(net, tx, spec, donate=True)
        key = jax.random.PRNGKey(0)

        def window():
            nonlocal state
            acc = None
            for _ in range(iters):
                state, losses = step(state, gt, key)
                acc = (
                    losses["total_loss"] if acc is None
                    else acc + losses["total_loss"]
                )
            return float(acc)

        window()  # warm: compile + full window
        t0 = time.perf_counter()
        window()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.2f} ms/step, {B / dt:.0f} samples/s")


if __name__ == "__main__":
    main()
