"""Headline benchmark: single-frame RGB -> hand+object mesh inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline config, and writes all BASELINE.json benchmark configs to
``bench_details.json``:
  1. hands-only (ResNet-18 + MANO branch)
  2. hand+object with trans/scale heads            <- headline
  3. contact-aware inference (contact+collision losses live)
  4. streaming dual flipped-input pipeline (batch of 2 per frame)
  5. full training step (fwd+bwd+adam, all losses)

Baseline target: >= 1000 frames/sec/chip on TPU v5e (BASELINE.md).
Raw uint8 frames; preprocessing fused on device.
"""

import json
import os
import time

import numpy as np

BASELINE_FPS = 1000.0
# Overridable for CPU smoke tests (driver runs defaults on TPU).
BENCH_BATCH = int(os.environ.get("OBMAN_BENCH_BATCH", 256))
BENCH_SIZE = int(os.environ.get("OBMAN_BENCH_SIZE", 256))
BENCH_ITERS = int(os.environ.get("OBMAN_BENCH_ITERS", 30))
BENCH_STREAM_BATCH = int(os.environ.get("OBMAN_BENCH_STREAM_BATCH", 64))


def _models():
    from obman_train_tpu.assets import synthetic_mano_assets
    from obman_train_tpu.config import AtlasConfig, ContactConfig, ModelConfig
    from obman_train_tpu.models import build_handnet, mano_params_from_assets

    mano_r = mano_params_from_assets(synthetic_mano_assets("right"))
    mano_l = mano_params_from_assets(synthetic_mano_assets("left"))

    def make(cfg):
        return build_handnet(cfg, mano_r, mano_l)

    atlas = AtlasConfig(predict_trans=True, predict_scale=True)
    return {
        "hands_only": make(
            ModelConfig(atlas=AtlasConfig(lambda_atlas=None,
                                          final_lambda_atlas=None))
        ),
        "hand_object": make(ModelConfig(atlas=atlas)),
        "contact": make(
            ModelConfig(
                atlas=atlas,
                contact=ContactConfig(contact_lambda=0.167,
                                      collision_lambda=0.167),
            )
        ),
    }


def _timeit(fn, args, iters=BENCH_ITERS):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from obman_train_tpu.config import TrainConfig
    from obman_train_tpu.models import BatchSpec
    from obman_train_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    nets = _models()
    B, S = BENCH_BATCH, BENCH_SIZE
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8))
    sides = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
    results = {}

    def init_vars(net, batch, spec, **kw):
        return net.init(
            {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
            batch, spec, **kw,
        )

    infer_spec = BatchSpec(
        has_joints3d=False, has_verts3d=False, has_objpoints3d=False,
        has_camintrs=False, has_center3d=False,
    )

    def make_infer(net, force_objects):
        def fn(variables, frames, sides):
            images = frames.astype(jnp.float32) / 255.0 - 0.5
            _, res, _ = net.apply(
                variables, {"images": images, "sides": sides}, infer_spec,
                no_loss=True, force_hand=True, force_objects=force_objects,
            )
            keep = [k for k in ("verts", "joints", "objpoints3d") if k in res]
            return tuple(res[k] for k in keep)
        return jax.jit(fn)

    # 1) hands only
    net = nets["hands_only"]
    variables = init_vars(
        net, {"images": jnp.zeros((B, S, S, 3), jnp.float32), "sides": sides},
        infer_spec, no_loss=True, force_hand=True,
    )
    dt = _timeit(make_infer(net, False), (variables, frames, sides))
    results["hands_only_inference"] = {"fps": B / dt, "batch": B}

    # 2) hand + object (headline)
    net = nets["hand_object"]
    variables = init_vars(
        net, {"images": jnp.zeros((B, S, S, 3), jnp.float32), "sides": sides},
        infer_spec, no_loss=True, force_hand=True, force_objects=True,
    )
    dt = _timeit(make_infer(net, True), (variables, frames, sides))
    headline_fps = B / dt
    results["hand_object_inference"] = {"fps": headline_fps, "batch": B}

    # 3) contact-aware: losses live (attraction/repulsion + pairwise)
    net = nets["contact"]
    gt = {
        "images": jnp.zeros((B, S, S, 3), jnp.float32),
        "sides": sides,
        "joints3d": jnp.asarray(rng.normal(0, 30, (B, 21, 3)), jnp.float32),
        "verts3d": jnp.asarray(rng.normal(0, 30, (B, 778, 3)), jnp.float32),
        "objpoints3d": jnp.asarray(rng.normal(0, 50, (B, 600, 3)), jnp.float32),
    }
    spec = BatchSpec()
    variables = init_vars(net, gt, spec)

    def contact_fwd(variables, frames, batch):
        b = dict(batch)
        b["images"] = frames.astype(jnp.float32) / 255.0 - 0.5
        total, _, losses = net.apply(
            variables, b, spec, rngs={"points": jax.random.PRNGKey(0)}
        )
        return total
    dt = _timeit(jax.jit(contact_fwd), (variables, frames, gt))
    results["contact_fwd_losses"] = {"fps": B / dt, "batch": B}

    # 4) streaming dual flipped-input pipeline (image_demo path, batch of 2
    #    per source frame)
    from obman_train_tpu.ops.image import preprocess_frames

    net = nets["hand_object"]
    stream_B = BENCH_STREAM_BATCH
    cam_frames = jnp.asarray(
        rng.integers(0, 256, (stream_B, 480, 640, 3), dtype=np.uint8)
    )
    variables = init_vars(
        net,
        {"images": jnp.zeros((2 * stream_B, S, S, 3), jnp.float32),
         "sides": jnp.zeros((2 * stream_B,), jnp.int32)},
        infer_spec, no_loss=True, force_hand=True, force_objects=True,
    )

    def stream_fn(variables, cam):
        dup = jnp.concatenate([cam, cam], axis=0)
        flip = jnp.concatenate(
            [jnp.zeros((stream_B,), bool), jnp.ones((stream_B,), bool)]
        )
        images = preprocess_frames(dup.astype(jnp.float32), S, flip=flip)
        s = jnp.concatenate(
            [jnp.ones((stream_B,), jnp.int32), jnp.zeros((stream_B,), jnp.int32)]
        )
        _, res, _ = net.apply(
            variables, {"images": images, "sides": s}, infer_spec,
            no_loss=True, force_hand=True, force_objects=True,
        )
        return res["verts"], res["joints"], res["objpoints3d"]
    dt = _timeit(jax.jit(stream_fn), (variables, cam_frames))
    results["streaming_dual_flip"] = {
        "source_fps": stream_B / dt, "batch": stream_B,
        "note": "raw 640x480 frames in, both flips evaluated",
    }

    # 5) full train step
    net = nets["contact"]
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg)
    state = create_train_state(net, tx, gt, spec)
    step = make_train_step(net, tx, spec, donate=False)
    key = jax.random.PRNGKey(0)

    dt = _timeit(lambda s, b, k: step(s, b, k)[1]["total_loss"], (state, gt, key))
    results["train_step_all_losses"] = {
        "samples_per_sec": B / dt, "batch": B,
    }

    with open("bench_details.json", "w") as f:
        json.dump(
            {
                "device": str(jax.devices()[0]),
                "image_size": S,
                "results": {
                    k: {kk: (round(vv, 2) if isinstance(vv, float) else vv)
                        for kk, vv in v.items()}
                    for k, v in results.items()
                },
            },
            f, indent=1,
        )

    print(
        json.dumps(
            {
                "metric": "rgb_to_hand_object_mesh_inference",
                "value": round(headline_fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(headline_fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
