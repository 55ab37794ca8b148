"""Measure the --geometry_dtype rungs across point counts on the real TPU.

Round-3 review: at the reference shapes every ``--geometry_dtype`` rung
made the full train step *slower*, and nothing documented when (if ever)
the selection-plane relaxations win.  This sweep answers that the same way
the chamfer Pallas auto-dispatch was calibrated: time value+grad of the
chamfer objective per rung over a range of point counts, publish the
table, and let config.py/README state the verdict with numbers.

Rungs (ops/chamfer.py::plane_dtype_for):
  float32         parity path — f32 HIGHEST plane forward, scatter-form
                  custom VJP (``_plane_min_scatter``) backward.
  float32_select  same f32 plane for neighbor SELECTION only; min values
                  recomputed exactly from the selected pairs.
  bfloat16        one-MXU-pass bf16 selection plane + exact f32 recompute.

Batch sizes scale inversely with the plane so every config fits HBM and
the comparison is per-plane work at roughly constant total pairs.  Timing
is warmed + dependency-chained (accumulated scalar read on the host once),
per CLAUDE.md's tunnel rules.

    python tools/geometry_dtype_sweep.py          # real TPU, ~3 min
    OBMAN_PLATFORM=cpu python tools/geometry_dtype_sweep.py  # smoke only

Writes geometry_dtype_sweep.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from obman_train_tpu.cli import apply_platform_override  # noqa: E402

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from obman_train_tpu.ops.chamfer import chamfer_loss, plane_dtype_for  # noqa: E402

SIZES = [int(s) for s in os.environ.get(
    "OBMAN_SWEEP_SIZES", "600,1024,2048,4096,8192,16384").split(",")]
RUNGS = ["float32", "float32_select", "bfloat16"]
ITERS = int(os.environ.get("OBMAN_SWEEP_ITERS", 20))
# ~constant total pairs per step (reference atlas config: 256 * 600*642)
TOTAL_PAIRS = int(os.environ.get("OBMAN_SWEEP_PAIRS", 256 * 600 * 642))


def _timed(fn, args, iters=ITERS):
    """Warmed, dependency-chained mean seconds per call (one host read)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = acc + fn(*args)
    float(acc)  # host read closes the dependency chain
    return (time.perf_counter() - t0) / iters


def main() -> int:
    rng = np.random.default_rng(0)
    rows = []
    for n in SIZES:
        m = n + 42
        b = max(1, min(256, TOTAL_PAIRS // (n * m)))
        preds = jnp.asarray(rng.normal(0, 60, (b, n, 3)), jnp.float32)
        gts = jnp.asarray(rng.normal(0, 60, (b, m, 3)), jnp.float32)
        row = {"points": n, "gt_points": m, "batch": b}
        for rung in RUNGS:
            pd = plane_dtype_for(rung)

            def loss(p, g, _pd=pd):
                l1, l2 = chamfer_loss(p, g, use_pallas=False, plane_dtype=_pd)
                return jnp.mean(l1 + l2)

            grad_fn = jax.jit(
                lambda p, g, _f=loss: _f(p, g)
                + 1e-12 * sum(jnp.sum(t) for t in jax.grad(_f, (0, 1))(p, g))
            )
            row[rung + "_grad_ms"] = _timed(grad_fn, (preds, gts)) * 1e3
            fwd_fn = jax.jit(loss)
            row[rung + "_fwd_ms"] = _timed(fwd_fn, (preds, gts)) * 1e3
        base = row["float32_grad_ms"]
        row["f32sel_vs_f32"] = row["float32_select_grad_ms"] / base
        row["bf16_vs_f32"] = row["bfloat16_grad_ms"] / base
        rows.append(row)
        print(json.dumps(row), flush=True)

    wins = {
        r: [row["points"] for row in rows
            if row[r + "_grad_ms"] < 0.97 * row["float32_grad_ms"]]
        for r in RUNGS[1:]
    }
    out = {
        "device": jax.devices()[0].device_kind,
        "iters": ITERS,
        "note": (
            "value+grad of the symmetric chamfer objective per rung; "
            "use_pallas=False so the rung (not the kernel dispatch) is "
            "measured; batch scales to ~constant total pairs "
            f"({TOTAL_PAIRS:,})"
        ),
        "rows": rows,
        "win_regions_vs_float32": wins,
    }
    # CPU smokes must not clobber the on-disk real-TPU numbers
    name = ("geometry_dtype_sweep_cpu.json"
            if os.environ.get("OBMAN_PLATFORM") == "cpu"
            else "geometry_dtype_sweep.json")
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(out, f, indent=1)
    print("win regions (>3% faster than float32):", json.dumps(wins))
    return 0


if __name__ == "__main__":
    sys.exit(main())
