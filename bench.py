"""Headline benchmark: single-frame RGB -> hand+object mesh inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline config — printed and flushed THE MOMENT the headline stage
completes (round 4's driver run timed out in a later stage and recorded no
number at all; the headline must survive any tunnel hang after it).  All
BASELINE.json benchmark configs go to ``bench_details.json``, written
incrementally (atomic replace) after every stage:

  1. hand+object with trans/scale heads             <- headline, runs FIRST
  2. hands-only (ResNet-18 + MANO branch)
  3. bfloat16 encoder path (+ numeric delta vs f32)
  4. single-frame (batch-1) latency, interleaved delta-K chain
  5. contact-aware inference (contact+collision losses live)
  6. streaming dual flipped-input pipeline (batch of 2 per frame)
  7. full training step (fwd+bwd+adam, all losses; donated, chained)
     + --geometry_dtype rungs
  8. large-point Chamfer: XLA vs Pallas kernel at 16k x 16k
  9. host input pipeline (BatchLoader samples/sec, incl. real JPEG decode)
 10. end-to-end training throughput (loader + device step overlapped)
 11. demo cold-start: live DemoModel vs --from_export, fresh process each,
     cold and warm persistent-compilation-cache variants

A global wall-clock budget (OBMAN_BENCH_BUDGET_S, default 1500 s) gates
every stage: once exhausted, remaining stages record {"skipped": ...} and
the run ends with whatever it measured — a partial details file is valid.
Per-stage exceptions are recorded as {"error": ...} without losing prior
stages.  On a complete real-TPU run the README perf block is re-rendered
from the fresh details (tools/render_readme_perf.py) so doc and artifact
move atomically.

Device configs carry an ``mfu_pct`` estimate (XLA cost-analysis FLOPs over
the chip's dense bf16 peak).  Baseline target: >= 1000 frames/sec/chip on
TPU v5e (BASELINE.md).  Raw uint8 frames; preprocessing fused on device.
"""

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))

BASELINE_FPS = 1000.0
# Overridable for CPU smoke tests (driver runs defaults on TPU).
BENCH_BATCH = int(os.environ.get("OBMAN_BENCH_BATCH", 256))
BENCH_SIZE = int(os.environ.get("OBMAN_BENCH_SIZE", 256))
BENCH_ITERS = int(os.environ.get("OBMAN_BENCH_ITERS", 30))
BENCH_STREAM_BATCH = int(os.environ.get("OBMAN_BENCH_STREAM_BATCH", 64))
BENCH_CHAMFER_N = int(os.environ.get("OBMAN_BENCH_CHAMFER_N", 16384))
BENCH_PIPELINE_SIZE = int(os.environ.get("OBMAN_BENCH_PIPELINE_SIZE", 1024))
BENCH_BUDGET_S = float(os.environ.get("OBMAN_BENCH_BUDGET_S", 1500))

# Dense bf16 matmul peak per chip (FLOP/s) for the MFU estimate.
_PEAK_BF16 = {
    "v6": 918e12,
    "v5p": 459e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5litepod": 197e12,
    "v4": 275e12,
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return None


def _flops_of(jfn, args) -> float | None:
    """FLOPs per call from XLA cost analysis (None if unavailable)."""
    try:
        cost = jfn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


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
        "hand_object_bf16": make(
            ModelConfig(atlas=atlas, compute_dtype="bfloat16")
        ),
        "contact": make(
            ModelConfig(
                atlas=atlas,
                contact=ContactConfig(contact_lambda=0.167,
                                      collision_lambda=0.167),
            )
        ),
        "contact_bf16": make(
            ModelConfig(
                atlas=atlas,
                contact=ContactConfig(contact_lambda=0.167,
                                      collision_lambda=0.167),
                compute_dtype="bfloat16",
            )
        ),
        # --geometry_dtype rungs on the bf16 step: chamfer/contact
        # neighbors selected on an f32/bf16 plane, min values recomputed
        # exactly in f32 (ops/chamfer.py::plane_dtype_for) — the backward
        # pass never touches the (B, N, M) plane.
        "contact_bf16_f32sel": make(
            ModelConfig(
                atlas=atlas,
                contact=ContactConfig(contact_lambda=0.167,
                                      collision_lambda=0.167),
                compute_dtype="bfloat16",
                geometry_dtype="float32_select",
            )
        ),
        "contact_bf16_bf16sel": make(
            ModelConfig(
                atlas=atlas,
                contact=ContactConfig(contact_lambda=0.167,
                                      collision_lambda=0.167),
                compute_dtype="bfloat16",
                geometry_dtype="bfloat16",
            )
        ),
        # f32 compute + f32 selection plane (tools/geometry_ab.py arm)
        "contact_f32sel": make(
            ModelConfig(
                atlas=atlas,
                contact=ContactConfig(contact_lambda=0.167,
                                      collision_lambda=0.167),
                geometry_dtype="float32_select",
            )
        ),
    }


# ---------------------------------------------------------------------------
# Shared harness pieces: bench.py and every tools/ A-B harness must measure
# the SAME workload with the SAME chained-window protocol (CLAUDE.md tunnel
# timing rules), so these live here and the tools import them.
# ---------------------------------------------------------------------------


def make_synthetic_gt(B: int, S: int, seed: int = 0):
    """Canonical synthetic all-losses batch at the bench shapes: uint8-
    derived images (the real data distribution after device normalize)
    plus MANO/atlas/contact GT at the reference sizes (21 joints, 778
    hand verts, 600 object points — SURVEY.md §6)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return {
        "images": jnp.asarray(
            rng.integers(0, 256, (B, S, S, 3)), jnp.float32
        ) / 255.0 - 0.5,
        "sides": jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32),
        "joints3d": jnp.asarray(rng.normal(0, 30, (B, 21, 3)), jnp.float32),
        "verts3d": jnp.asarray(rng.normal(0, 30, (B, 778, 3)), jnp.float32),
        "objpoints3d": jnp.asarray(
            rng.normal(0, 50, (B, 600, 3)), jnp.float32
        ),
    }


def build_train(net, gt, donate: bool = True):
    """TrainState + jitted all-losses train step + PRNG key."""
    import jax

    from obman_train_tpu.config import TrainConfig
    from obman_train_tpu.models import BatchSpec
    from obman_train_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, gt, spec)
    step = make_train_step(net, tx, spec, donate=donate)
    return step, state, jax.random.PRNGKey(0)


def train_window(step, state, gt, key, iters: int):
    """One dependency-chained window: every step's total_loss feeds a
    scalar accumulator that is read on the host at the end, so the wall
    clock is honest on the tunneled TPU (block_until_ready can return
    early there)."""
    acc = None
    for _ in range(iters):
        state, losses = step(state, gt, key)
        tl = losses["total_loss"]
        acc = tl if acc is None else acc + tl
    float(acc)
    return state


def time_train_step(step, state, gt, key, iters: int = BENCH_ITERS):
    """Warm a FULL chained window (fresh executables run slow for ~30
    calls on the tunnel), then time one; returns (sec/step, state)."""
    state = train_window(step, state, gt, key, iters)
    t0 = time.perf_counter()
    state = train_window(step, state, gt, key, iters)
    return (time.perf_counter() - t0) / iters, state


def _timeit(fn, args, iters=BENCH_ITERS):
    """Sustained timing with a dependency chain: every call's output feeds
    a scalar accumulator that is materialized to the host at the end.
    (On the tunneled TPU platform ``block_until_ready`` alone has been
    observed to return before execution finishes; consuming the results
    makes the wall-clock honest.)"""
    import jax
    import jax.numpy as jnp

    def first_leaf_sum(out):
        return jnp.sum(jax.tree_util.tree_leaves(out)[0])

    # Warm chained loop first, as long as the timed loop: beyond the
    # compile, roughly the first 30 calls of each new executable run slow
    # on the tunneled v5e and would poison the measurement.
    acc = None
    for _ in range(iters):
        out = fn(*args)
        s = first_leaf_sum(out)
        acc = s if acc is None else acc + s
    float(acc)
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        out = fn(*args)
        s = first_leaf_sum(out)
        acc = s if acc is None else acc + s
    float(acc)  # host sync through the whole chain
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    if os.environ.get("OBMAN_BENCH_CPU"):
        # JAX_PLATFORMS in the environment does NOT switch backends here:
        # sitecustomize imports jax (pinning the axon TPU platform) before
        # this process's env is consulted, so CPU smokes must re-pin via
        # the config API before first device use.
        jax.config.update("jax_platforms", "cpu")

    # The parent's own compiles (~15 executables, the bulk of a cold run's
    # wall clock) go through the persistent compilation cache; no measured
    # number includes compile time (every window is warmed first), so this
    # only makes the harness itself faster/less likely to blow the budget.
    # The cold-start children below get their OWN cache dir, wiped first.
    from obman_train_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from obman_train_tpu.config import TrainConfig
    from obman_train_tpu.models import BatchSpec
    from obman_train_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    t_start = time.monotonic()
    results = {}
    stage_wall = {}
    ctx = {}
    details_path = os.path.join(
        _REPO,
        "bench_details_cpu.json" if os.environ.get("OBMAN_BENCH_CPU")
        else "bench_details.json",
    )

    peak = _peak_flops(jax.devices()[0])
    nets = _models()
    B, S = BENCH_BATCH, BENCH_SIZE
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8))
    sides = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
    gt = make_synthetic_gt(B, S)
    spec = BatchSpec()

    def elapsed():
        return time.monotonic() - t_start

    def remaining():
        return BENCH_BUDGET_S - elapsed()

    def save():
        """Atomic incremental write: the details file on disk is valid
        after every stage, even if the process is killed mid-run."""
        payload = {
            "device": str(jax.devices()[0]),
            "image_size": S,
            "budget_s": BENCH_BUDGET_S,
            "wall_s": round(elapsed(), 1),
            "stage_wall_s": {k: round(v, 1) for k, v in stage_wall.items()},
            "results": {
                k: {kk: (round(vv, 2) if isinstance(vv, float) else vv)
                    for kk, vv in v.items()}
                for k, v in results.items()
            },
        }
        tmp = details_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, details_path)

    def run_stage(fn, *keys):
        """Budget-gated stage runner: a stage past the wall budget records
        {"skipped"} per result key; a stage that raises records {"error"}
        without losing anything already measured; the details file is
        re-written after every stage either way."""
        name = keys[0]
        if remaining() <= 0:
            for k in keys:
                results.setdefault(k, {
                    "skipped": f"wall budget exhausted "
                               f"({int(BENCH_BUDGET_S)} s; raise "
                               f"OBMAN_BENCH_BUDGET_S)"
                })
            save()
            print(f"[bench {elapsed():5.0f}s] {name}: skipped (budget)",
                  file=sys.stderr, flush=True)
            return False
        print(f"[bench {elapsed():5.0f}s] {name} ...",
              file=sys.stderr, flush=True)
        t0 = time.monotonic()
        try:
            fn()
            ok = True
        except Exception as e:  # a tunnel/compile failure in one stage
            for k in keys:      # must not lose the other stages' numbers
                results.setdefault(
                    k, {"error": f"{type(e).__name__}: {e}"}
                )
            ok = False
        stage_wall[name] = time.monotonic() - t0
        save()
        return ok

    def with_mfu(entry, jfn, args, dt):
        flops = _flops_of(jfn, args)
        if flops and peak:
            entry["mfu_pct"] = round(100.0 * flops / dt / peak, 2)
        return entry

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

    # 1) hand + object — the headline, measured FIRST and printed the
    #    moment it exists so no later stage (or tunnel hang) can lose it.
    def stage_headline():
        net = nets["hand_object"]
        ho_variables = init_vars(
            net,
            {"images": jnp.zeros((B, S, S, 3), jnp.float32), "sides": sides},
            infer_spec, no_loss=True, force_hand=True, force_objects=True,
        )
        jfn = make_infer(net, True)
        dt = _timeit(jfn, (ho_variables, frames, sides))
        headline_fps = B / dt
        results["hand_object_inference"] = with_mfu(
            {"fps": headline_fps, "batch": B},
            jfn, (ho_variables, frames, sides), dt,
        )
        ctx["ho_net"] = net
        ctx["ho_variables"] = ho_variables
        ctx["ho_jfn"] = jfn
        ctx["f32_out"] = jfn(ho_variables, frames, sides)
        # THE driver-parsed line: exactly one JSON line on stdout, flushed.
        print(
            json.dumps({
                "metric": "rgb_to_hand_object_mesh_inference",
                "value": round(headline_fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(headline_fps / BASELINE_FPS, 3),
            }),
            flush=True,
        )

    # 2) hands only
    def stage_hands_only():
        net = nets["hands_only"]
        variables = init_vars(
            net,
            {"images": jnp.zeros((B, S, S, 3), jnp.float32), "sides": sides},
            infer_spec, no_loss=True, force_hand=True,
        )
        jfn = make_infer(net, False)
        dt = _timeit(jfn, (variables, frames, sides))
        results["hands_only_inference"] = with_mfu(
            {"fps": B / dt, "batch": B}, jfn, (variables, frames, sides), dt
        )

    # 3) bfloat16 encoder path: same (f32) params, bf16 compute
    #    (config.py compute_dtype="bfloat16"), plus numeric delta vs f32.
    def stage_bf16():
        jfn_bf16 = make_infer(nets["hand_object_bf16"], True)
        args = (ctx["ho_variables"], frames, sides)
        dt = _timeit(jfn_bf16, args)
        bf16_out = jfn_bf16(*args)
        deltas = [
            float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
            for a, b in zip(bf16_out, ctx["f32_out"])
        ]
        results["hand_object_bf16"] = with_mfu(
            {
                "fps": B / dt, "batch": B,
                "max_abs_delta_mm": {
                    k: round(d, 3)
                    for k, d in zip(("verts", "joints", "objpoints3d"), deltas)
                },
            },
            jfn_bf16, args, dt,
        )

    # 4) batch-1 latency on the headline config.  device_ms is measured
    #    DIRECTLY with a delta-K dependency chain: one jitted executable
    #    runs K batch-1 forwards serialized inside a lax.scan (each
    #    iteration's image depends on the previous output through a
    #    numerically-absorbed +carry*1e-30 term, so XLA cannot overlap or
    #    elide iterations) and returns one scalar.  Both the K=1 and
    #    K=1+CHAIN executables have IDENTICAL I/O, so the tunnel RTT + h2d
    #    + dispatch cost cancels in the difference
    #        device_ms = (t(1+CHAIN) - t(1)) / CHAIN.
    #    The two executables are INTERLEAVED call by call — each pair's
    #    calls land ~70 ms apart, so slow tunnel drift hits both sides of
    #    the difference equally, and device_ms is the median over all
    #    pairs (a single mid-window hang poisons one pair, not a whole
    #    block).  The previous form differenced two back-to-back 30-call
    #    block means measured seconds apart; drift between the blocks
    #    leaked straight into the delta (78% run-to-run spread in the
    #    round-4 driver data vs <10% required).
    def stage_single_frame():
        net = ctx["ho_net"]
        ho_variables = ctx["ho_variables"]
        jfn = ctx["ho_jfn"]
        frame1, side1 = frames[:1], sides[:1]
        dt1 = _timeit(jfn, (ho_variables, frame1, side1))

        def _request_lat(fn, args, iters=max(10, BENCH_ITERS)):
            def _read(out):
                return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

            for _ in range(iters):      # warm: fresh executables run slow
                _read(fn(*args))
            t0 = time.perf_counter()
            for _ in range(iters):
                _read(fn(*args))
            return (time.perf_counter() - t0) / iters

        def make_chain(k):
            def fn(variables, frames, sides):
                base = frames.astype(jnp.float32) / 255.0 - 0.5

                def body(carry, _):
                    _, res, _ = net.apply(
                        variables,
                        {"images": base + carry, "sides": sides}, infer_spec,
                        no_loss=True, force_hand=True, force_objects=True,
                    )
                    # ~1e-25 against image values ~0.5: bit-identical
                    # images, but a real data dependency XLA cannot fold
                    return (jnp.sum(res["verts"])
                            + jnp.sum(res["joints"])) * 1e-30, ()

                carry, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=k
                )
                return carry
            return jax.jit(fn)

        # Long chain so the per-pair delta (chain × ~0.3 ms device time)
        # dwarfs per-call tunnel jitter: at 120 the signal is ~36 ms
        # against ~1 ms call-to-call noise.
        chain = int(os.environ.get("OBMAN_BENCH_CHAIN",
                                   max(4, min(128, BENCH_ITERS * 4))))
        fn_1 = make_chain(1)
        fn_k = make_chain(1 + chain)
        chain_args = (ho_variables, frame1, side1)

        def call(fn):
            float(fn(*chain_args))  # blocking scalar read per call

        iters = max(10, BENCH_ITERS)
        for _ in range(iters):  # warm both executables, interleaved
            call(fn_1)
            call(fn_k)
        pair_ms = []
        for _ in range(iters):
            a = time.perf_counter()
            call(fn_1)
            b = time.perf_counter()
            call(fn_k)
            c = time.perf_counter()
            pair_ms.append(((c - b) - (b - a)) / chain * 1e3)
        device_ms = float(np.median(pair_ms))
        # spread stat the README quotes: medians of 3 equal buckets
        device_runs = [
            float(np.median(bucket))
            for bucket in np.array_split(np.asarray(pair_ms), 3)
        ]
        req_ms = _request_lat(jfn, (ho_variables, frame1, side1)) * 1e3
        results["single_frame_latency"] = {
            "latency_ms": dt1 * 1e3, "fps": 1.0 / dt1, "batch": 1,
            "request_ms": req_ms,
            "device_ms": device_ms,
            "device_ms_runs": [round(r, 4) for r in device_runs],
            "device_fps": 1e3 / device_ms if device_ms > 0 else None,
            "transport_ms": max(req_ms - device_ms, 0.0),
            "chain_len": chain,
            "pairs": len(pair_ms),
        }

    # 5) contact-aware: losses live (attraction/repulsion + pairwise)
    def stage_contact_fwd():
        net = nets["contact"]
        variables = init_vars(net, gt, spec)

        def contact_fwd(variables, frames, batch):
            b = dict(batch)
            b["images"] = frames.astype(jnp.float32) / 255.0 - 0.5
            total, _, losses = net.apply(
                variables, b, spec, rngs={"points": jax.random.PRNGKey(0)}
            )
            return total

        jfn = jax.jit(contact_fwd)
        dt = _timeit(jfn, (variables, frames, gt))
        results["contact_fwd_losses"] = with_mfu(
            {"fps": B / dt, "batch": B}, jfn, (variables, frames, gt), dt
        )

    # 6) streaming dual flipped-input pipeline (image_demo path, batch of
    #    2 per source frame)
    def stage_streaming():
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
                [jnp.ones((stream_B,), jnp.int32),
                 jnp.zeros((stream_B,), jnp.int32)]
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

    # 7) full train step — donated + chained (steady-state loop timing)
    def bench_train(name, net_key):
        step, state, key = build_train(nets[net_key], gt)
        flops = _flops_of(step, (state, gt, key))
        dt, _ = time_train_step(step, state, gt, key)
        entry = {"samples_per_sec": B / dt, "batch": B}
        if flops and peak:
            entry["mfu_pct"] = round(100.0 * flops / dt / peak, 2)
        results[name] = entry

    # 8) large-point-count Chamfer: XLA vs the tiled Pallas kernel.  The
    #    grad path is what training runs (and where the custom VJP's
    #    O(BN+BM) memory pays off), so time fwd AND grad.
    def cham_stage(label, cb, cn, cm):
        from obman_train_tpu.ops.chamfer import _use_pallas, chamfer_loss

        # sub-10ms kernels need a longer window to amortize per-executable
        # slow-start on the tunneled TPU
        cham_iters = max(50, BENCH_ITERS)
        x = jnp.asarray(rng.normal(0, 40, (cb, cn, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(0, 40, (cb, cm, 3)), jnp.float32)

        def cham_sum(a, b, up):
            l1, l2 = chamfer_loss(a, b, use_pallas=up)
            return jnp.mean(l1 + l2)

        xla_fn = jax.jit(lambda a, b: chamfer_loss(a, b, use_pallas=False))
        dt_xla = _timeit(xla_fn, (x, y), iters=cham_iters)
        gx_fn = jax.jit(jax.grad(lambda a, b: cham_sum(a, b, False)))
        dt_gxla = _timeit(gx_fn, (x, y), iters=cham_iters)
        entry = {
            "batch": cb, "points": cn,
            "xla_ms": dt_xla * 1e3,
            "xla_grad_ms": dt_gxla * 1e3,
            "auto_dispatch_engaged": _use_pallas(x, y, "auto"),
        }
        if jax.default_backend() == "tpu":
            pal_fn = jax.jit(lambda a, b: chamfer_loss(a, b, use_pallas=True))
            # correctness cross-check before timing
            ox, op = xla_fn(x, y), pal_fn(x, y)
            np.testing.assert_allclose(
                np.asarray(ox), np.asarray(op), rtol=1e-4, atol=1e-2
            )
            dt_pal = _timeit(pal_fn, (x, y), iters=cham_iters)
            gp_fn = jax.jit(jax.grad(lambda a, b: cham_sum(a, b, True)))
            dt_gpal = _timeit(gp_fn, (x, y), iters=cham_iters)
            entry["pallas_ms"] = dt_pal * 1e3
            entry["pallas_grad_ms"] = dt_gpal * 1e3
            entry["pallas_speedup"] = dt_xla / dt_pal
            entry["pallas_grad_speedup"] = dt_gxla / dt_gpal
        results[label] = entry

    # 9) host input pipeline: BatchLoader over the synthetic dataset
    def stage_input_pipeline():
        from obman_train_tpu.data.factory import get_dataset
        from obman_train_tpu.data.loader import BatchLoader

        # clamp so tiny smoke pipeline sizes still yield >= 1 batch
        pipe_batch = min(64, BENCH_PIPELINE_SIZE)
        host_cores = os.cpu_count() or 1
        for aug_name, device_augment in (("host_aug", False),
                                         ("device_aug", True)):
            ds = get_dataset(
                "synthetic", "train", meta={"size": BENCH_PIPELINE_SIZE},
                device_augment=device_augment,
            )
            loader = BatchLoader(ds, batch_size=pipe_batch, num_workers=8,
                                 seed=0)
            for batch in loader:  # warmup epoch: imports, cv2 thread pools,
                pass              # page-ins — first-epoch noise swamped the
            n = 0                 # host_aug/device_aug comparison before
            t0 = time.perf_counter()
            for _ in range(2):
                for batch in loader:
                    n += batch["images"].shape[0]
            dt = time.perf_counter() - t0
            results[f"input_pipeline_{aug_name}"] = {
                "samples_per_sec": n / dt, "workers": 8, "batch": pipe_batch,
                "samples": n,
                # context the numbers can't travel without: per-sample host
                # cost scales with cores (the bench box has had 1)
                "host_cores": host_cores,
                "samples_per_sec_per_core": n / dt / host_cores,
            }

    # 9b) host input pipeline over a REAL on-disk ObMan-layout tree
    #     (data/fabricate.py): JPEG decode + meta-pickle read +
    #     crop/warp/jitter — the synthetic entries above fake the decode
    #     cost, this one pays it (reference hot path:
    #     handobjectdatasets/handataset.py:104-413).  The tree is
    #     fabricated once and reused across runs (keyed by size).
    def stage_real_decode():
        from obman_train_tpu.data.factory import get_dataset
        from obman_train_tpu.data.loader import BatchLoader

        pipe_batch = min(64, BENCH_PIPELINE_SIZE)
        host_cores = os.cpu_count() or 1
        decode_n = int(os.environ.get("OBMAN_BENCH_DECODE_SAMPLES",
                                      min(2048, 4 * BENCH_PIPELINE_SIZE)))
        try:
            import cv2  # noqa: F401  (fabrication + decode need cv2)

            from obman_train_tpu.data.fabricate import fabricate_obman

            tree_root = os.path.join(
                os.environ.get("TMPDIR", "/tmp"),
                f"obman_bench_tree_{decode_n}",
            )
            marker = os.path.join(tree_root, ".complete")
            if not os.path.exists(marker):
                fabricate_obman(tree_root, decode_n)
                with open(marker, "w") as f:
                    f.write(str(decode_n))
            ds = get_dataset(
                "obman", "train",
                meta={"obman_root": os.path.join(tree_root, "obman"),
                      "shapenet_root": os.path.join(tree_root, "shapenet")},
                device_augment=True,
            )
            loader = BatchLoader(ds, batch_size=pipe_batch, num_workers=8,
                                 seed=0)
            for batch in loader:  # warmup epoch (imports, page cache, pools)
                pass
            n = 0
            t0 = time.perf_counter()
            for batch in loader:
                n += batch["images"].shape[0]
            dt = time.perf_counter() - t0
            results["input_pipeline_real_decode"] = {
                "samples_per_sec": n / dt, "workers": 8, "batch": pipe_batch,
                "samples": n, "host_cores": host_cores,
                "samples_per_sec_per_core": n / dt / host_cores,
                "note": "real JPEG decode from disk (fabricated ObMan "
                        "tree), device_augment host path",
            }
        except ImportError as e:  # cv2 absent: a skip, not an error
            results["input_pipeline_real_decode"] = {"skipped": str(e)}

    # 10) end-to-end training throughput: host loader feeding the device
    #     step, losses read one step behind so host batch prep overlaps
    #     device compute (train/loop.py's pipelining) — the samples/s a
    #     user actually gets on one host + one chip.
    def stage_end_to_end():
        from obman_train_tpu.data.factory import get_dataset
        from obman_train_tpu.data.loader import BatchLoader, derive_spec

        host_cores = os.cpu_count() or 1
        ds = get_dataset(
            "synthetic", "train", meta={"size": BENCH_PIPELINE_SIZE},
            device_augment=True,
        )
        # clamp so tiny CPU-smoke pipeline sizes still yield >= 1 batch
        e2e_batch = min(64, BENCH_PIPELINE_SIZE)
        e2e_loader = BatchLoader(ds, batch_size=e2e_batch, num_workers=2,
                                 seed=0)
        first = next(iter(e2e_loader))
        e2e_spec = derive_spec(first)
        net = nets["hand_object"]
        tx = make_optimizer(TrainConfig())
        e2e_state = create_train_state(net, tx, first, e2e_spec)
        e2e_step = make_train_step(net, tx, e2e_spec, donate=True)
        key = jax.random.PRNGKey(0)

        def run_epoch(state):
            n, pending = 0, None
            for batch in e2e_loader:
                # one async tree put: numpy leaves passed straight to the
                # jitted step convert with a device sync per array (a round
                # trip per leaf on the tunneled TPU — 480 ms/step vs 12 ms
                # for the put)
                batch = jax.device_put(batch)
                state, losses = e2e_step(state, batch, key)
                if pending is not None:
                    float(pending["total_loss"])  # sync one step behind
                pending = losses
                n += batch["images"].shape[0]
            float(pending["total_loss"])
            return state, n

        # warm TWO epochs (32 step calls): fresh executables run slow for
        # roughly their first 30 calls on the tunneled v5e (see _timeit)
        e2e_state, _ = run_epoch(e2e_state)
        e2e_state, _ = run_epoch(e2e_state)
        t0 = time.perf_counter()
        e2e_state, n = run_epoch(e2e_state)
        dt = time.perf_counter() - t0
        results["end_to_end_train"] = {
            "samples_per_sec": n / dt, "batch": e2e_batch, "workers": 2,
            "host_cores": host_cores,
            "note": "synthetic loader + full train step, device_augment; "
                    "host-bound when device-only throughput exceeds "
                    "samples_per_sec (scale loader cores/hosts)",
        }

    # 11) demo cold-start: live DemoModel (build net, restore,
    #     trace+compile at first frame) vs --from_export (deserialize
    #     StableHLO, no model code or trace).  Each path runs in a FRESH
    #     python process so jit caches can't flatter either side; the
    #     child prints one JSON line.  The reference's demos always pay
    #     the full reload path (image_demo.py:54-56 re-instantiates torch
    #     from opt.pkl).  Two variants: cold (empty persistent compilation
    #     cache — the children populate it) and warm (same children,
    #     cache pre-populated — what a second-or-later serving launch
    #     actually pays; utils/compcache.py is on by default in the demo
    #     CLIs).
    coldstart_n = int(os.environ.get("OBMAN_BENCH_COLDSTART_FRAMES", 20))
    compcache_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"bench_compcache_{S}"
    )
    child_preamble = (
        "import time, json, os\n"
        "t0 = time.perf_counter()\n"
        "import numpy as np\n"
        "import jax\n"
        "if os.environ.get('OBMAN_BENCH_CPU'):\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        "from obman_train_tpu.utils.compcache import "
        "enable_persistent_cache\n"
        "enable_persistent_cache()\n"  # dir comes from OBMAN_COMPCACHE_DIR
        f"SIZE = {S}\n"
        f"N = {coldstart_n}\n"
    )
    child_epilogue = (
        "frame = np.random.default_rng(0).integers("
        "0, 255, (SIZE, SIZE, 3)).astype(np.uint8)\n"
        "m.predict(frame)\n"
        "t_first = time.perf_counter()\n"
        "for _ in range(N):\n"
        "    m.predict(frame)\n"
        "t_steady = (time.perf_counter() - t_first) / N\n"
        "print(json.dumps({'construct_s': round(t_ctor - t0, 2),\n"
        "                  'first_frame_s': round(t_first - t_ctor, 2),\n"
        "                  'steady_ms': round(t_steady * 1e3, 2)}))\n"
    )

    def child_timeout():
        # never longer than the remaining wall budget (round 4's driver
        # run died waiting on 1200 s children)
        return max(60.0, min(
            float(os.environ.get("OBMAN_BENCH_COLDSTART_TIMEOUT", 600)),
            remaining(),
        ))

    def run_child(src):
        """-> (record dict | None, error str | None)."""
        timeout_s = child_timeout()
        env = dict(os.environ, OBMAN_COMPCACHE_DIR=compcache_dir)
        try:
            out = subprocess.run(
                [sys.executable, "-c", src], capture_output=True,
                text=True, timeout=timeout_s, cwd=_REPO, env=env,
            )
        except subprocess.TimeoutExpired:
            return None, f"timed out after {int(timeout_s)}s"
        if out.returncode != 0:
            return None, out.stderr[-500:]
        try:
            return json.loads(out.stdout.strip().splitlines()[-1]), None
        except Exception:
            return None, f"unparseable child stdout: {out.stdout[-200:]!r}"

    def stage_coldstart():
        from obman_train_tpu.config import ExperimentConfig
        from obman_train_tpu.demo import DemoModel
        from obman_train_tpu.demo.export import export_model

        export_path = os.path.join(
            os.environ.get("TMPDIR", "/tmp"), f"bench_coldstart_{S}.jaxexp"
        )
        export_model(
            DemoModel(config=ExperimentConfig(), mano_assets="synthetic",
                      image_size=S),
            export_path,
        )
        ctx["coldstart_srcs"] = {
            "live": child_preamble + (
                "from obman_train_tpu.config import ExperimentConfig\n"
                "from obman_train_tpu.demo import DemoModel\n"
                "m = DemoModel(config=ExperimentConfig(),"
                " mano_assets='synthetic', image_size=SIZE)\n"
                "t_ctor = time.perf_counter()\n"
            ) + child_epilogue,
            "from_export": child_preamble + (
                "from obman_train_tpu.demo.export import ExportedModel\n"
                f"m = ExportedModel({export_path!r})\n"
                "t_ctor = time.perf_counter()\n"
            ) + child_epilogue,
        }
        # cold means cold: the children share one persistent-cache dir,
        # wiped here so the cold numbers never ride an earlier run's cache
        shutil.rmtree(compcache_dir, ignore_errors=True)
        attempts = int(os.environ.get("OBMAN_BENCH_COLDSTART_ATTEMPTS", 1))
        entry = {"frames": coldstart_n}
        for name, src in ctx["coldstart_srcs"].items():
            recs, errs = [], []
            for _ in range(attempts):
                rec, err = run_child(src)
                if rec is not None:
                    recs.append(rec)
                else:
                    errs.append(err)
                if remaining() <= 0:
                    break
            # entry[name] present <=> at least one success; the _error key
            # exists only when EVERY attempt failed (round 4 left both a
            # valid result and a stale timeout error in the same entry)
            if recs:
                best = min(recs, key=lambda r: r["first_frame_s"])
                best["attempts_first_frame_s"] = [
                    r["first_frame_s"] for r in recs
                ]
                if errs:
                    best["failed_attempts"] = errs
                entry[name] = best
            else:
                entry[f"{name}_error"] = (
                    errs[-1] if errs else "no attempts (budget)"
                )
        results["demo_coldstart"] = entry

    def stage_coldstart_warm():
        srcs = ctx.get("coldstart_srcs")
        if not srcs:
            raise RuntimeError("demo_coldstart stage did not run")
        entry = {
            "frames": coldstart_n,
            "note": "same fresh-process children as demo_coldstart, "
                    "persistent compilation cache pre-populated by the "
                    "cold runs (utils/compcache.py — the demo CLIs enable "
                    "it by default, so this is what every launch after "
                    "the first pays)",
        }
        for name, src in srcs.items():
            if name not in results.get("demo_coldstart", {}):
                continue  # cold run failed: no cache to be warm from
            rec, err = run_child(src)
            if rec is not None:
                entry[name] = rec
            else:
                entry[f"{name}_error"] = err
        results["demo_coldstart_warm_cache"] = entry

    run_stage(stage_headline, "hand_object_inference")
    run_stage(stage_hands_only, "hands_only_inference")
    run_stage(stage_bf16, "hand_object_bf16")
    run_stage(stage_single_frame, "single_frame_latency")
    run_stage(stage_contact_fwd, "contact_fwd_losses")
    run_stage(stage_streaming, "streaming_dual_flip")
    run_stage(lambda: bench_train("train_step_all_losses", "contact"),
              "train_step_all_losses")
    run_stage(lambda: bench_train("train_step_bf16", "contact_bf16"),
              "train_step_bf16")
    # --geometry_dtype rungs (selection-plane relaxations with exact f32
    # value recompute; parity deltas recorded by tools/geometry_ab.py)
    run_stage(lambda: bench_train("train_step_bf16_geom_f32sel",
                                  "contact_bf16_f32sel"),
              "train_step_bf16_geom_f32sel")
    run_stage(lambda: bench_train("train_step_bf16_geom_bf16sel",
                                  "contact_bf16_bf16sel"),
              "train_step_bf16_geom_bf16sel")
    run_stage(lambda: cham_stage("chamfer_reference", BENCH_BATCH, 600, 642),
              "chamfer_reference")
    run_stage(lambda: cham_stage("chamfer_large", 1,
                                 BENCH_CHAMFER_N, BENCH_CHAMFER_N),
              "chamfer_large")
    run_stage(stage_input_pipeline,
              "input_pipeline_host_aug", "input_pipeline_device_aug")
    run_stage(stage_real_decode, "input_pipeline_real_decode")
    run_stage(stage_end_to_end, "end_to_end_train")
    run_stage(stage_coldstart, "demo_coldstart")
    run_stage(stage_coldstart_warm, "demo_coldstart_warm_cache")

    # Re-render README's perf block when (and only when) this is a real-TPU
    # run whose details are COMPLETE — a budget-skipped or errored stage
    # must never rewrite the committed numbers with a degraded block.
    complete = all(
        not ({"skipped", "error"} & set(v)) for v in results.values()
    )
    if not os.environ.get("OBMAN_BENCH_CPU") \
            and jax.default_backend() == "tpu":
        if complete:
            try:
                sys.path.insert(0, os.path.join(_REPO, "tools"))
                import render_readme_perf as rrp

                with open(details_path) as f:
                    rrp.render(json.load(f))  # raises before any rewrite
                rrp.main()
            except Exception as e:
                print(f"[bench] README render failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
        else:
            partial = [k for k, v in results.items()
                       if {"skipped", "error"} & set(v)]
            print(f"[bench] README render skipped (incomplete stages: "
                  f"{partial})", file=sys.stderr, flush=True)
    print(f"[bench] done in {elapsed():.0f}s; details -> {details_path}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
