"""Headline benchmark: single-frame RGB -> hand+object mesh inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >= 1000 frames/sec/chip on TPU v5e (BASELINE.md).

The flagship path mirrors the reference demo pipeline (image_demo.py):
ResNet-18 encoder -> MANO branch (verts+joints) + AtlasNet sphere decoder
with trans/scale heads, one fused jit program, raw uint8 frames normalized
on device.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from obman_train_tpu.assets import synthetic_mano_assets
    from obman_train_tpu.config import AtlasConfig, ModelConfig
    from obman_train_tpu.models import (
        BatchSpec,
        build_handnet,
        mano_params_from_assets,
    )

    cfg = ModelConfig(
        resnet_version=18,
        atlas=AtlasConfig(predict_trans=True, predict_scale=True),
    )
    net = build_handnet(
        cfg,
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )

    B, S = 256, 256
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8)
    )
    sides = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
    spec = BatchSpec()
    init_batch = {
        "images": jnp.zeros((B, S, S, 3), jnp.float32),
        "sides": sides,
    }
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        init_batch,
        spec,
        no_loss=True,
    )

    @jax.jit
    def infer(variables, frames, sides):
        # Device-fused preprocessing: x/255 - 0.5 (reference preprocess.py:20-39)
        images = frames.astype(jnp.float32) / 255.0 - 0.5
        _, results, _ = net.apply(
            variables, {"images": images, "sides": sides}, spec, no_loss=True
        )
        return results["verts"], results["joints"], results["objpoints3d"]

    # Warmup/compile
    out = infer(variables, frames, sides)
    jax.block_until_ready(out)

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = infer(variables, frames, sides)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    fps = B / dt

    baseline_fps = 1000.0
    print(
        json.dumps(
            {
                "metric": "rgb_to_hand_object_mesh_inference",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
