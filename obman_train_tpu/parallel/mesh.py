"""Device mesh + sharding helpers.

The reference parallelizes with single-process ``torch.nn.DataParallel``
(traineval.py:130-131): parameters broadcast, batch scattered, gradients
reduced.  The TPU-native equivalent is one jit-compiled SPMD program over a
1-D ``data`` mesh axis: the batch is sharded on its leading dimension,
parameters/optimizer state are replicated, and XLA inserts the gradient
all-reduce over ICI automatically.  Multi-host runs fall out of
``jax.distributed.initialize`` + the same program.

This model is a small CNN (no TP/PP need — SURVEY.md §5 "long-context":
the large axes are batch and point counts, which fit on one chip), so the
mesh is deliberately 1-D; the helpers still accept arbitrary shapes for
forward-compatibility (e.g. ("data", "model")).

Multi-process (multi-host) runs: the training path keeps losses
replicated and lets XLA all-reduce gradients; the host-side eval
consumers (PCK evaluator feed, figures, result dumps) read their
process-LOCAL rows via :func:`local_shard` and the PCK evaluator
all-gathers its pooled errors across processes at epoch end
(train/metrics.py ``EvalUtil.merge_distributed``).  Artifact writers
(checkpoints, logs, figures) run on process 0 only.  Exercised for real
by tests/test_distributed.py, which SPAWNS two jax.distributed processes
and matches the single-process run.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices (default: all, 1-D data axis)."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch arrays: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_shard(arr) -> np.ndarray:
    """Host-read an array that may be globally sharded across processes.

    Fully-addressable arrays (single-process, or host numpy) pass through
    as ``np.asarray``.  On multi-process runs: replicated arrays return
    the full value from any local shard; leading-dim-sharded arrays
    return THIS process's rows concatenated in global index order — which
    are exactly the rows this process contributed through
    :func:`shard_batch` (``jax.make_array_from_process_local_data`` keeps
    process-local data on the process's own devices), so host-side
    consumers can pair them with the process-local input batch.
    """
    if isinstance(arr, np.ndarray) or not hasattr(arr, "addressable_shards"):
        return np.asarray(arr)
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    by_start = {}
    for s in arr.addressable_shards:
        start = 0
        if arr.ndim and s.index:
            start = s.index[0].start or 0
        by_start.setdefault(start, s.data)
    if len(by_start) == 1:
        only = np.asarray(next(iter(by_start.values())))
        if only.shape == arr.shape:  # replicated (incl. scalars)
            return only
    return np.concatenate(
        [np.asarray(by_start[k]) for k in sorted(by_start)], axis=0
    )


def infer_batch_size(batch: dict) -> int:
    """The batch's leading dimension: ``images`` when present (every model
    batch carries it), else the most common leading dim with a DETERMINISTIC
    largest-dim tie-break (spec-less trees)."""
    if "images" in batch:
        return int(batch["images"].shape[0])
    dims = [int(v.shape[0]) for v in batch.values() if getattr(v, "ndim", 0)]
    if not dims:
        return 0
    counts = {d: dims.count(d) for d in set(dims)}
    return max(sorted(counts), key=lambda d: (counts[d], d))


def shard_batch(
    batch: dict, mesh: Mesh, axis: str = "data", batch_size: int = None
) -> dict:
    """Device-put a host batch with the leading dim sharded over ``axis``.

    Per-batch scalars and arrays without the batch leading dim (e.g. the
    device-augment ``aug_order``) are replicated; batch-dim arrays are
    sharded.  Single-host: a plain sharded device_put.  Multi-host (after
    ``jax.distributed.initialize``, --distributed): each process passes its
    LOCAL per-host batch and the global array is assembled across hosts —
    the per-host loaders shard one deterministic global order, so the
    global batch is the concatenation of the per-process batches in rank
    order (data/loader.py ``process_slice``).

    ``batch_size`` pins which leading dim is "the batch"; when omitted it
    is inferred (images key, else most-common leading dim with a
    deterministic tie-break).  A batch dim that does not divide the mesh
    axis is an error rather than a silent mis-shard.
    """
    sharding = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    bsz = infer_batch_size(batch) if batch_size is None else batch_size
    n_shards = mesh.shape[axis]
    total = bsz * jax.process_count() if jax.process_count() > 1 else bsz
    if bsz and total % n_shards:
        raise ValueError(
            f"global batch {total} not divisible by mesh axis "
            f"'{axis}'={n_shards}"
        )

    def spec_for(x):
        return sharding if getattr(x, "ndim", 0) and x.shape[0] == bsz else rep

    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(spec_for(x), x),
            batch,
        )
    # one async tree put (a per-leaf python loop of synchronous transfers
    # costs a device round trip per array on remote/tunneled TPUs)
    return jax.device_put(
        batch, jax.tree_util.tree_map(spec_for, batch)
    )
