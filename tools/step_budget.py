"""Op-class budget of the full train step from a real profiler trace.

Round-4 review: the bf16 step's trace writeup attributed ~33 of 55 ms and
left the rest as "stem ops measured slower in context".  This tool makes
the attribution mechanical and SUMMING: it traces a warmed window of the
actual bench train step with jax.profiler, parses the xplane proto the
TPU runtime writes, aggregates every op on the device's synchronous
"XLA Ops" lane (async copy lanes overlap compute and would double-count),
and buckets by the op's jax path (`tf_op` stat, e.g.
"jit(step_fn)/jvp(HandNet)/base_net/layer3_0/conv1/conv_general_dilated")
into model subsystems.  The buckets sum to the device-busy total, which is
reconciled against the wall-clock ms/step (gap = dispatch/host).  Ops
without a tf_op stat are reported as "unattributed", never guessed.

Output:
  step_budget.json     per-bucket ms/step incl. fwd/bwd split + top ops,
                       plus the reconciliation (device busy vs wall)
  stdout               a markdown table ready for docs/trace_analysis.md

    python tools/step_budget.py                              # real TPU
    OBMAN_BUDGET_RUNG=contact python tools/step_budget.py    # fp32 step
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (bucket, regex on the tf_op path + HLO name) — first match wins.
RULES = [
    ("contact: ray-parity pallas kernel", r"pallas_mesh_contains"),
    ("contact: plane + nearest-point selection",
     r"compute_contact_loss|_select_closest"),
    ("chamfer planes (atlas pair + meshiou)",
     r"bnd,bmd->bnm|chamfer|min_sqdist|meshiou"),
    ("encoder: stem conv1/bn1/maxpool",
     r"base_net/(conv1|bn1|reduce_window|max_pool)"
     r"|select_and_scatter|select-and-scatter"),
    ("encoder: residual stages", r"base_net"),
    ("atlas decoder", r"atlas_branch|atlas"),
    ("mano branch", r"mano_branch|mano"),
    ("optimizer: adam/updates", r"adam|optax|scale_by|/update"),
    ("loss reductions / epilogues",
     r"reduce_sum|masked_mean|mean:|tanh|sqrt|square"),
]


def classify(tf_op: str, hlo_name: str) -> str:
    text = f"{tf_op} {hlo_name}"
    for bucket, pat in RULES:
        if re.search(pat, text):
            return bucket
    if not tf_op:
        return "unattributed (no op metadata)"
    return "misc (copies/sort/other)"


def main():
    import jax

    if os.environ.get("OBMAN_BUDGET_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import bench

    rung = os.environ.get("OBMAN_BUDGET_RUNG", "contact_bf16")
    iters = int(os.environ.get("OBMAN_BENCH_ITERS", 20))
    B, S = bench.BENCH_BATCH, bench.BENCH_SIZE

    gt = bench.make_synthetic_gt(B, S)
    nets = bench._models()
    step, state, key = bench.build_train(nets[rung], gt, donate=False)

    # Warm a full window, then measure the wall ms/step the trace must
    # reconcile against (same chained-window protocol as bench.py).
    state = bench.train_window(step, state, gt, key, iters)
    t0 = time.perf_counter()
    state = bench.train_window(step, state, gt, key, iters)
    wall_ms = (time.perf_counter() - t0) / iters * 1e3

    trace_dir = os.environ.get(
        "OBMAN_BUDGET_TRACE_DIR",
        os.path.join(tempfile.gettempdir(), f"step_budget_{rung}"),
    )
    with jax.profiler.trace(trace_dir):
        state = bench.train_window(step, state, gt, key, iters)

    pbs = sorted(glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
    ))
    assert pbs, f"no xplane.pb under {trace_dir}"

    # the only importable xplane schema in this image (the
    # tensorboard_plugin_profile converters crash on the installed
    # protobuf; tensorflow's tsl copy parses fine)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())
    planes = [p for p in space.planes
              if p.name.startswith("/device:") and any(
                  l.name == "XLA Ops" and l.events for l in p.lines)]
    assert planes, "no device plane with an XLA Ops lane in the trace"
    plane = planes[0]
    stat_names = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
    md_info = {}
    for mid, md in plane.event_metadata.items():
        stats = {}
        for st in md.stats:
            stats[stat_names.get(st.metadata_id)] = (
                st.str_value or st.int64_value or st.uint64_value
            )
        md_info[mid] = (md.name, str(stats.get("tf_op", "")),
                        str(stats.get("hlo_category", "")))

    line = next(l for l in plane.lines if l.name == "XLA Ops")
    buckets = collections.defaultdict(
        lambda: {"ms": 0.0, "fwd_ms": 0.0, "bwd_ms": 0.0,
                 "ops": collections.defaultdict(float)}
    )
    total_ms = 0.0
    for ev in line.events:
        name, tf_op, category = md_info[ev.metadata_id]
        ms = ev.duration_ps / 1e9
        total_ms += ms
        b = buckets[classify(tf_op, name)]
        b["ms"] += ms
        # transpose(jvp(...)) marks the VJP backward sweep of that op
        b["bwd_ms" if "transpose(" in tf_op else "fwd_ms"] += ms
        key_ = tf_op or f"{name.split(' = ')[0]} [{category}]"
        b["ops"][key_] += ms

    table = []
    for bname, v in sorted(buckets.items(), key=lambda kv: -kv[1]["ms"]):
        top = sorted(v["ops"].items(), key=lambda kv: -kv[1])[:6]
        table.append({
            "bucket": bname,
            "ms_per_step": round(v["ms"] / iters, 3),
            "fwd_ms_per_step": round(v["fwd_ms"] / iters, 3),
            "bwd_ms_per_step": round(v["bwd_ms"] / iters, 3),
            "pct_of_device": round(100 * v["ms"] / total_ms, 1),
            "top_ops": [
                {"op": k[-140:], "ms_per_step": round(ms / iters, 3)}
                for k, ms in top
            ],
        })

    device_ms = total_ms / iters
    out = {
        "rung": rung, "batch": B, "size": S, "iters": iters,
        "device": str(jax.devices()[0]),
        "wall_ms_per_step": round(wall_ms, 2),
        "device_busy_ms_per_step": round(device_ms, 2),
        "dispatch_gap_ms_per_step": round(wall_ms - device_ms, 2),
        "buckets": table,
    }
    path = os.path.join(REPO, "step_budget.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    print(f"\nwall {wall_ms:.2f} ms/step = device busy {device_ms:.2f} "
          f"+ dispatch/host gap {wall_ms - device_ms:.2f}\n")
    print("| bucket | ms/step | fwd | bwd | % of device |")
    print("|---|---|---|---|---|")
    for row in table:
        print(f"| {row['bucket']} | {row['ms_per_step']:.2f} | "
              f"{row['fwd_ms_per_step']:.2f} | "
              f"{row['bwd_ms_per_step']:.2f} | "
              f"{row['pct_of_device']:.1f}% |")
    print(f"\ndetails -> {path}")


if __name__ == "__main__":
    main()
