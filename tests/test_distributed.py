"""Multi-process (--distributed) end-to-end test.

Spawns TWO real ``jax.distributed`` processes (gloo CPU collectives, 4
virtual devices each → one global 8-device mesh) running the full
traineval CLI on the synthetic dataset, and matches the result against
the equivalent single-process 8-device run:

- the process-sliced loader (data/loader.py) makes the GLOBAL training
  stream identical, so params/PCK must agree;
- the eval consumers (EvalUtil feed via ``parallel.local_shard``, the
  cross-process pool merge in ``EvalUtil.merge_distributed``, rank-
  suffixed batch pickles, rank-0 logs/checkpoints) are the reference
  contract of epochpass3d.py:126-151 running multi-host.

AUC compares BIT-for-bit (the merge reassembles the pools in global row
order and the quantized PCK threshold counts absorb forward ulps).
EPE/losses/checkpoint params compare to float32-tight tolerances
(measured ~1e-9..1e-4 relative): the gradient all-reduce crosses
processes through gloo, whose reduction order is not guaranteed to match
the single-process XLA collective ulp-for-ulp, and the ulps propagate
through the two optimizer steps.
"""

import json
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_CLI = [
    "-u", "-m", "obman_train_tpu.cli.traineval",
    "--train_datasets", "synthetic", "--train_splits", "train",
    "--val_datasets", "synthetic", "--val_splits", "val",
    "--mano_assets", "synthetic",
    "--synthetic_size", "16", "--image_size", "64",
    "--epochs", "1", "--train_batch", "8", "--test_batch", "8",
    "--workers", "1", "--manual_seed", "3",
    "--epoch_display_freq", "0",  # no figures: keep the smoke fast
    "--save_results",
    "--no_simulate",
]


def _env(n_devices: int, coordinator=None, num_procs=None, proc_id=None):
    env = os.environ.copy()
    # JAX_PLATFORMS alone does NOT switch backends in this image (the
    # sitecustomize PJRT plugin pins the platform at interpreter start);
    # OBMAN_PLATFORM makes the CLI re-pin via jax.config.update.
    env["JAX_PLATFORMS"] = "cpu"
    env["OBMAN_PLATFORM"] = "cpu"
    # ALSO strip the axon-plugin gate entirely: sitecustomize's register()
    # claims the TPU tunnel at interpreter start, which can hang for
    # minutes per process — one stalled rank blows gloo's 30 s collective
    # rendezvous (same mechanism as data/loader.py's spawned workers)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    # Persistent jit cache: single-process reuses the suite's cache, but
    # distributed ranks get NO cache at all.  Ranks must reach each
    # collective within gloo's 30 s rendezvous window, so their compile
    # state must be SYMMETRIC — and it can't be made symmetric with a
    # cache: jax writes entries from process 0 only AND keys them
    # per-process (verified: rank 1 gets zero hits even reading rank 0's
    # dir), so any cache leaves rank 0 warm and rank 1 cold, blowing the
    # window.  Cold symmetric compiles are ~15 s each here.
    if proc_id is None:
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/obman_jax_compile_cache"
    else:
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    # APPEND to PYTHONPATH (CLAUDE.md: overwriting drops the axon
    # sitecustomize dir; harmless on cpu but keep the convention)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if coordinator is not None:
        env["JAX_COORDINATOR_ADDRESS"] = coordinator
        env["JAX_NUM_PROCESSES"] = str(num_procs)
        env["JAX_PROCESS_ID"] = str(proc_id)
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_single(exp_dir: str):
    cmd = [sys.executable] + BASE_CLI + ["--exp_id", exp_dir]
    res = subprocess.run(
        cmd, env=_env(8), cwd=REPO, capture_output=True, text=True,
        timeout=1500,
    )
    assert res.returncode == 0, (
        f"single-process run failed:\n{res.stdout[-4000:]}\n{res.stderr[-4000:]}"
    )


def _run_dual(exp_dir: str):
    coord = f"127.0.0.1:{_free_port()}"
    cmd = [sys.executable] + BASE_CLI + ["--exp_id", exp_dir, "--distributed"]
    # Rank output goes to FILES, not PIPE: with pipes, sequentially
    # draining rank 0 lets rank 1's 64 KB stdout buffer fill with XLA log
    # spew, stalling it past gloo's 30 s collective rendezvous window and
    # killing the run (observed as "Gloo context initialization failed").
    logs = [open(exp_dir + f"_rank{r}.log", "w+") for r in range(2)]
    procs = [
        subprocess.Popen(
            cmd, env=_env(4, coord, 2, r), cwd=REPO,
            stdout=logs[r], stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    try:
        for p in procs:
            p.wait(timeout=1500)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        raise
    finally:
        outs = []
        for f in logs:
            f.flush()
            f.seek(0)
            outs.append(f.read())
            f.close()
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"distributed rank {r} failed:\n{out[-6000:]}"
        )


def _restore_state(exp_dir: str):
    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(
        os.path.join(os.path.abspath(exp_dir), "checkpoint")
    )
    return payload["state"], int(np.asarray(payload["epoch"]))


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    exp_sp = str(tmp_path / "sp")
    exp_mp = str(tmp_path / "mp")
    _run_single(exp_sp)
    _run_dual(exp_mp)

    # --- metrics.json: written by rank 0 only; val PCK pools are merged in
    # global row order so AUC/EPE must be bit-identical ---
    with open(os.path.join(exp_sp, "metrics.json")) as f:
        m_sp = json.load(f)
    with open(os.path.join(exp_mp, "metrics.json")) as f:
        m_mp = json.load(f)
    assert set(m_sp) == set(m_mp)
    # AUC is bit-identical (quantized PCK counts absorb the forward ulps);
    # EPE carries the raw f64 mean, which differs only by the gradient
    # all-reduce's reduction-order ulps propagated through training
    # (measured ~1e-9 relative)
    for key in ("auc",):
        assert m_sp[key]["val"] == m_mp[key]["val"], (
            f"val {key}: {m_sp[key]['val']} vs {m_mp[key]['val']}"
        )
    for key, splits in m_sp.items():
        if key in ("batch_time", "data_time"):
            continue  # wall-clock meters, not comparable
        for split, series in splits.items():
            for epoch, v in series.items():
                w = m_mp[key][split][epoch]
                # rel 2e-3: small-magnitude quadratic losses (edge regul)
                # amplify the all-reduce ulps; a real data-stream or
                # metric bug diverges at percent-to-10x level
                assert v == pytest.approx(w, rel=2e-3, abs=1e-4), (
                    f"{key}/{split}/{epoch}: single={v} dual={w}"
                )

    # --- checkpoint: rank-0 single-writer; params from the identical
    # global batch stream ---
    state_sp, ep_sp = _restore_state(exp_sp)
    state_mp, ep_mp = _restore_state(exp_mp)
    assert ep_sp == ep_mp == 1
    flat_sp = _flatten(state_sp["params"])
    flat_mp = _flatten(state_mp["params"])
    assert set(flat_sp) == set(flat_mp)
    for k in flat_sp:
        # rel 5e-3: the all-reduce ulps through two optimizer steps hit
        # near-zero weights hardest (measured max 3e-3 on one element of
        # 265k); a wrong data stream or step diverges orders harder
        np.testing.assert_allclose(
            flat_sp[k], flat_mp[k], rtol=5e-3, atol=5e-4, err_msg=k
        )

    # --- batch pickles: rank-suffixed shards together cover the same
    # validation predictions as the single-process dump ---
    res_sp = os.path.join(exp_sp, "save_results", "val", "epoch_0")
    res_mp = os.path.join(exp_mp, "save_results", "val", "epoch_0")
    sp_files = sorted(os.listdir(res_sp))
    mp_files = sorted(os.listdir(res_mp))
    assert all("_rank" in f for f in mp_files), mp_files
    assert len(mp_files) == 2 * len(sp_files)
    for f_sp in sp_files:
        idx = f_sp[len("batch_"):-len(".pkl")]
        with open(os.path.join(res_sp, f_sp), "rb") as f:
            full = pickle.load(f)
        parts = []
        for r in range(2):
            with open(
                os.path.join(res_mp, f"batch_{idx}_rank{r}.pkl"), "rb"
            ) as f:
                parts.append(pickle.load(f))
        joined = np.concatenate([p["results"]["joints"] for p in parts])
        # prediction ulps from the all-reduce propagate through training
        # (measured max ~1.5e-3 relative); the GT check below is exact
        np.testing.assert_allclose(
            joined, np.asarray(full["results"]["joints"]),
            rtol=5e-3, atol=5e-3,
        )
        # each rank dumped its contiguous slice of the global batch
        gt = np.concatenate([p["batch"]["joints3d"] for p in parts])
        np.testing.assert_array_equal(
            gt, np.asarray(full["batch"]["joints3d"])
        )


_MERGE_WORKER = r"""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
coord, rank = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=rank
)
from obman_train_tpu.train.metrics import EvalUtil


def batch(p, i, b=4, k=21):
    # deterministic per (process, feed) so both ranks can reconstruct the
    # expected global pool locally
    rng = np.random.default_rng((7, p, i))
    gt = rng.normal(0, 30, (b, k, 3))
    return gt, gt + rng.normal(0, 2, (b, k, 3))


def dists(p, i, b=4):
    gt, pred = batch(p, i, b)
    return np.linalg.norm(
        np.asarray(gt, np.float64) - np.asarray(pred, np.float64), axis=-1
    )


# --- uniform: same feed count + shapes on both ranks -> merged pool is
# bit-exactly the single-process global row order (feed-major, processes
# interleaved within each feed) ---
ev = EvalUtil()
for i in range(3):
    ev.feed(*batch(rank, i))
ev.merge_distributed()
want = [np.concatenate([dists(p, i) for p in range(2)]) for i in range(3)]
got = np.concatenate(ev._dists)
assert (got == np.concatenate(want)).all(), "uniform merge row order"

# --- divergent feed counts (the regression: the branch decision must be
# collective — a local decision deadlocks/crashes in mismatched
# allgathers).  rank 0 feeds 3 batches, rank 1 feeds 2 -> ragged path on
# BOTH ranks, pools concatenated per-process ---
ev = EvalUtil()
for i in range(3 - rank):
    ev.feed(*batch(rank, i))
ev.merge_distributed()
want = np.concatenate(
    [dists(0, 0), dists(0, 1), dists(0, 2), dists(1, 0), dists(1, 1)]
)
got = np.concatenate(ev._dists)
assert got.shape == want.shape, (got.shape, want.shape)
assert (got == want).all(), "ragged merge pool (rank-ordered concat)"
print("MERGE_OK")
"""


@pytest.mark.slow
def test_merge_distributed_branches(tmp_path):
    """Pins EvalUtil.merge_distributed's two collective branches across 2
    real processes: bit-exact global row order when feeds are uniform, and
    the ragged fallback when ranks disagree on feed COUNT — the case where
    a process-local branch decision issues mismatched collectives and
    deadlocks (regression test for the allgathered-summary predicate)."""
    coord = f"127.0.0.1:{_free_port()}"
    logs = [open(str(tmp_path / f"merge_rank{r}.log"), "w+") for r in range(2)]
    procs = [
        subprocess.Popen(
            # proc_id drops the per-process-keyed jit cache (see _env);
            # the worker passes coordinator/rank itself via argv
            [sys.executable, "-u", "-c", _MERGE_WORKER, coord, str(r)],
            env=_env(4, None, None, r), cwd=REPO,
            stdout=logs[r], stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    try:
        for p in procs:
            p.wait(timeout=600)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        raise
    finally:
        outs = []
        for f in logs:
            f.flush()
            f.seek(0)
            outs.append(f.read())
            f.close()
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and "MERGE_OK" in out, (
            f"merge rank {r} failed:\n{out[-4000:]}"
        )


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    else:
        out[prefix] = np.asarray(tree)
    return out
