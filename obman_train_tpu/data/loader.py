"""Batching, prefetching, and round-robin concatenation.

Replaces torch DataLoader workers + ConcatDataloader (traineval.py:223-230,
mano_train/datautils.py:5-37): samples are numpy dicts produced by
HandDataset; a thread pool overlaps augmentation with device compute (the
GIL is mostly released inside numpy), batches are fixed-shape stacked
arrays, and ConcatLoader cycles loaders round-robin injecting
dataset/root/split metadata (root = "palm" for stereohands, else "wrist" —
datautils.py:22-32).

``to_model_batch`` converts a query-keyed sample batch into the static-key
batch the model consumes ("images" NHWC float, "sides" int32 0=right/1=left)
and ``derive_spec`` builds the matching static BatchSpec.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from obman_train_tpu.data.queries import BaseQueries, TransQueries

SIDE_TO_INT = {"right": 0, "left": 1}


def collate(samples: Sequence[Dict]) -> Dict:
    """Stack a list of sample dicts into fixed-shape arrays; string fields
    (sides) stay lists, meta dicts stay lists."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def to_model_batch(batch: Dict) -> Dict[str, np.ndarray]:
    """Query-keyed collated batch -> model batch with plain string keys."""
    mapping = {
        TransQueries.images: "images",
        TransQueries.joints3d: "joints3d",
        TransQueries.verts3d: "verts3d",
        TransQueries.joints2d: "joints2d",
        TransQueries.objpoints3d: "objpoints3d",
        TransQueries.camintrs: "camintrs",
        TransQueries.center3d: "center3d",
        BaseQueries.hand_pcas: "hand_pcas",
    }
    out = {}
    for q, name in mapping.items():
        if q in batch:
            val = np.asarray(batch[q])
            if name == "images" and val.dtype == np.uint8:
                out[name] = val  # normalize on device (4x cheaper h2d)
            else:
                out[name] = val.astype(np.float32, copy=False)
    if "aug_factors" in batch:
        out["aug_factors"] = np.asarray(batch["aug_factors"], np.float32)
        # Per-batch op order (the in-graph jitter uses one order per batch).
        # Sample 0's draw is only a fallback for standalone use: BatchLoader
        # overrides it with a (seed, epoch, batch_idx)-derived value so the
        # order is identical across --distributed ranks, whose local slices
        # start at different global rows (see BatchLoader._finalize).
        out["aug_order"] = np.asarray(batch["aug_order"][0], np.int32)
    if BaseQueries.sides in batch:
        out["sides"] = np.asarray(
            [SIDE_TO_INT[s] for s in batch[BaseQueries.sides]], np.int32
        )
    return out


def derive_spec(batch: Dict, root: str = "wrist"):
    # lazy import: worker processes import this module without pulling jax
    from obman_train_tpu.models.handnet import BatchSpec

    return BatchSpec(
        has_joints3d="joints3d" in batch,
        has_verts3d="verts3d" in batch,
        has_joints2d="joints2d" in batch,
        has_camintrs="camintrs" in batch,
        has_objpoints3d="objpoints3d" in batch,
        has_center3d="center3d" in batch,
        has_pcas="hand_pcas" in batch,
        has_sides="sides" in batch,
        root=root,
    )


# ---------------------------------------------------------------------------
# Process-pool worker plumbing.  Workers are SPAWNED python interpreters with
# the axon TPU plugin disabled (they never touch jax), each holding its own
# copy of the dataset — the reference's torch-DataLoader worker model.
# Measured trade-off on the synthetic pipeline (single-core host): threads
# win (no pickle/pipe transfer of the ~13 MB batch results), and the uint8
# cv2 augmentation chain releases the GIL, so threads also scale on
# multi-core hosts; processes pay off only for adapters whose per-sample
# work holds the GIL (pure-python decode/pickle).
# ---------------------------------------------------------------------------

_WORKER_DATASET = None
_WORKER_EPOCH = None


def _proc_init(dataset):
    global _WORKER_DATASET, _WORKER_EPOCH
    _WORKER_DATASET = dataset
    _WORKER_EPOCH = None


def _proc_ping(_):
    time.sleep(0.3)  # hold the worker so every pool slot actually spawns
    return True


def _proc_load(idxs, epoch: int, model_batch: bool):
    global _WORKER_EPOCH
    ds = _WORKER_DATASET
    if epoch != _WORKER_EPOCH:
        if hasattr(ds, "reseed"):
            ds.reseed(epoch)
        _WORKER_EPOCH = epoch
    out = collate([ds[int(i)] for i in idxs])
    return to_model_batch(out) if model_batch else out


class BatchLoader:
    """Shuffling, drop-last batch iterator with prefetch.

    ``use_processes=True`` runs augmentation in spawned worker processes
    (the reference's torch DataLoader model, traineval.py:223-230);
    ``False`` uses threads (no spawn cost, fine for light pipelines).

    Multi-process SPMD (``--distributed``): pass ``process_rank`` /
    ``process_count`` and every process walks the SAME shuffled global
    order but loads only its contiguous ``batch_size/process_count``
    slice of each global batch.  ``parallel.shard_batch`` then assembles
    the global array as the rank-ordered concatenation of those slices,
    so the global training stream is IDENTICAL to a single-process run
    with the same seed — batch_size stays the GLOBAL batch size."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        model_batch: bool = True,
        use_processes: bool = False,
        process_rank: int = 0,
        process_count: int = 1,
        clamp_threads: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.model_batch = model_batch
        self.use_processes = use_processes
        self.process_rank = process_rank
        self.process_count = process_count
        self.clamp_threads = clamp_threads
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"{process_count} processes"
                )
            if not drop_last:
                raise ValueError(
                    "process-sliced loading needs drop_last=True (a ragged "
                    "tail batch cannot be split evenly across processes)"
                )
        self._pool = None
        self._epoch = 0

    def _ensure_pool(self):
        """Spawn the persistent process pool with a jax-free child env:
        PALLAS_AXON_POOL_IPS gates the axon PJRT registration in
        sitecustomize, and JAX_PLATFORMS=cpu is belt-and-braces — children
        must never contend for the TPU."""
        if self._pool is not None:
            return self._pool
        import multiprocessing
        import os
        from concurrent.futures import ProcessPoolExecutor

        ctx = multiprocessing.get_context("spawn")
        saved = {
            k: os.environ.pop(k, None)
            for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
        }
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            pool = ProcessPoolExecutor(
                self.num_workers, mp_context=ctx,
                initializer=_proc_init, initargs=(self.dataset,),
            )
            # submit would spawn workers lazily AFTER the env is restored;
            # force every slot to spawn inside this window
            list(pool.map(_proc_ping, range(self.num_workers)))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        self._pool = pool
        return pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _finalize(self, batch: Dict, epoch: int, batch_idx: int) -> Dict:
        """Post-load fixup of per-batch (not per-sample) leaves.

        ``aug_order`` must be one value per GLOBAL batch: deriving it from
        the first loaded sample would give each --distributed rank a
        different order (rank r's slice starts at global row r*B/P), which
        both diverges the training stream from the single-process run and
        violates the replicated-sharding equal-data invariant in
        parallel.shard_batch.  Derive it from (seed, epoch, batch_idx)
        instead — identical on every rank and for every process count.
        Raw (``model_batch=False``) batches keep their per-sample draws."""
        if self.model_batch and "aug_order" in batch:
            # 0-d ndarray, NOT a numpy scalar: the device-put path keeps
            # only isinstance(np.ndarray) leaves (it drops string metadata)
            batch["aug_order"] = np.asarray(
                np.random.default_rng(
                    (self.seed, epoch, batch_idx)
                ).integers(0, 24),
                np.int32,
            )
        return batch

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        # Advance the dataset's per-epoch augmentation stream (samples are
        # deterministic per (seed, epoch, idx), thread-safe under prefetch).
        if hasattr(self.dataset, "reseed"):
            self.dataset.reseed(self._epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        if self.process_count > 1:
            # this process's contiguous slice of each GLOBAL batch
            per = self.batch_size // self.process_count
            lo = self.process_rank * per
            batches = [b[lo : lo + per] for b in batches]

        from collections import deque

        if self.use_processes:
            pool = self._ensure_pool()

            def submit(idxs):
                return pool.submit(
                    _proc_load, idxs, self._epoch, self.model_batch
                )

            window = self.num_workers * 2
            futures = deque(submit(b) for b in batches[:window])
            next_submit = min(window, n_batches)
            yielded = 0
            while futures:
                yield self._finalize(
                    futures.popleft().result(), self._epoch, yielded
                )
                yielded += 1
                if next_submit < n_batches:
                    futures.append(submit(batches[next_submit]))
                    next_submit += 1
            return

        def load(idxs):
            samples = [self.dataset[int(i)] for i in idxs]
            out = collate(samples)
            return to_model_batch(out) if self.model_batch else out

        # By default clamp threads to the host's cores: for CPU-bound
        # augmentation, threads beyond the core count only thrash the GIL/
        # scheduler (measured on a 1-core host: 8 threads run bimodally at
        # 202-413 samples/s vs a stable 380 with 1; real multi-core hosts
        # keep their full worker count).  ``clamp_threads=False`` honors
        # the requested count exactly — right for I/O-bound datasets
        # (disk reads / jpeg decode release the GIL, so oversubscription
        # hides latency); the CLI disables the clamp when --workers is
        # passed explicitly.
        import os as _os

        threads = max(1, self.num_workers)
        if self.clamp_threads:
            threads = min(threads, _os.cpu_count() or 1)
        with ThreadPoolExecutor(threads) as pool:
            # Keep a bounded window of in-flight batches (prefetch depth 2x).
            window = threads * 2
            futures = deque(pool.submit(load, b) for b in batches[:window])
            next_submit = min(window, n_batches)
            yielded = 0
            while futures:
                yield self._finalize(
                    futures.popleft().result(), self._epoch, yielded
                )
                yielded += 1
                if next_submit < n_batches:
                    futures.append(pool.submit(load, batches[next_submit]))
                    next_submit += 1


class ConcatLoader:
    """Round-robin over several loaders, injecting metadata
    (reference: datautils.py:5-37; len = min-len * count)."""

    def __init__(self, loaders: List, metas: Optional[List[Dict]] = None):
        self.loaders = loaders
        self.metas = metas or [{} for _ in loaders]

    def __len__(self):
        return min(len(ld) for ld in self.loaders) * len(self.loaders)

    def __iter__(self):
        iters = [iter(ld) for ld in self.loaders]
        for _ in range(min(len(ld) for ld in self.loaders)):
            for it, meta in zip(iters, self.metas):
                batch = dict(next(it))
                batch.update(meta)
                yield batch


def loader_meta(dat_name: str, split: str) -> Dict:
    """dataset/root/split metadata injected per batch (datautils.py:22-32)."""
    root = "palm" if dat_name in ("stereohands", "zimsynth") else "wrist"
    return {"dataset": dat_name, "root": root, "split": split}
