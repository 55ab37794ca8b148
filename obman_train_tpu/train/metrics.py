"""Host-side metrics: running means and the PCK/EPE/AUC evaluator.

``EvalUtil`` reimplements the evaluation *protocol* of the reference's
``mano_train/evaluation/zimeval.py`` (which is GPL'd third-party code and was
deliberately not copied — SURVEY.md §2.3 V1): per-keypoint Euclidean error
pools, PCK at linspace thresholds, mean/median EPE per keypoint, AUC as the
normalized trapezoid of the mean PCK curve.  Implementation here is
vectorized numpy over batched feeds rather than per-sample python loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class AverageMeter:
    """Running mean (reference: evaluation/evalutils.py:1-29)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class AverageMeters:
    def __init__(self):
        self.average_meters: Dict[str, AverageMeter] = {}

    def add_loss_value(self, name: str, val: float, n: int = 1):
        if name not in self.average_meters:
            self.average_meters[name] = AverageMeter()
        self.average_meters[name].update(val, n)

    def averages(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.average_meters.items()}


class EvalUtil:
    """Keypoint evaluator: feed batches of (gt, pred) joints in mm."""

    def __init__(self, num_kp: int = 21):
        self.num_kp = num_kp
        self._dists: List[np.ndarray] = []   # each (B, K) euclidean errors
        self._vis: List[np.ndarray] = []     # each (B, K) bool

    def feed(
        self,
        gt: np.ndarray,
        pred: np.ndarray,
        keypoint_vis: Optional[np.ndarray] = None,
    ):
        """Accepts a single sample (K, 3) or a batch (B, K, 3)."""
        gt = np.asarray(gt, np.float64)
        pred = np.asarray(pred, np.float64)
        if gt.ndim == 2:
            gt, pred = gt[None], pred[None]
            if keypoint_vis is not None:
                keypoint_vis = np.asarray(keypoint_vis)[None]
        dists = np.linalg.norm(gt - pred, axis=-1)  # (B, K)
        vis = (
            np.ones(dists.shape, bool)
            if keypoint_vis is None
            else np.asarray(keypoint_vis, bool).reshape(dists.shape)
        )
        self._dists.append(dists)
        self._vis.append(vis)

    def _pooled(self):
        if not self._dists:
            return None, None
        return np.concatenate(self._dists, 0), np.concatenate(self._vis, 0)

    def merge_distributed(self):
        """On multi-process runs, all-gather the pooled errors so every
        process computes the GLOBAL PCK/EPE/AUC (the eval consumers of the
        reference contract, epochpass3d.py:141-151/168-175, see a full
        validation set instead of one host's shard).  No-op single-process.

        When every process fed the same sequence of batch shapes (the
        process-sliced loader guarantees this), the merged pool is
        reassembled in GLOBAL row order — batch by batch, processes
        interleaved — so the result is bit-identical to the equivalent
        single-process evaluation (f64 reductions are order-sensitive).
        Otherwise it falls back to per-process concatenation, which pools
        the same samples in a different order.
        """
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils as mhu

        # The uniform/ragged decision MUST be identical on every rank (the
        # two branches issue different collectives), so it is derived only
        # from one allgathered (feed_count, batch, K) summary — never from
        # process-local state directly.  batch = -1 encodes locally
        # non-uniform feed shapes.
        local_shapes = {d.shape for d in self._dists}
        b, k = local_shapes.pop() if len(local_shapes) == 1 else (-1, -1)
        summary = np.asarray([len(self._dists), b, k], np.int32)
        all_sum = np.asarray(mhu.process_allgather(summary))  # (P, 3)
        uniform = bool(
            (all_sum == all_sum[:1]).all()
            and all_sum[0, 0] > 0
            and all_sum[0, 1] != -1
        )
        if uniform:
            # (F, b, K) f64, transported losslessly as uint32 pairs (the
            # gather itself runs without x64 enabled)
            d = np.ascontiguousarray(np.stack(self._dists))
            v = np.ascontiguousarray(np.stack(self._vis))
            f, b, k = d.shape
            d32 = d.view(np.uint32).reshape(f, b, 2 * k)
            all_d = np.asarray(mhu.process_allgather(d32))  # (P, F, b, 2K)
            all_v = np.asarray(mhu.process_allgather(
                v.astype(np.uint8)
            ))  # (P, F, b, K)
            p = all_d.shape[0]
            d_glob = (
                np.ascontiguousarray(all_d.transpose(1, 0, 2, 3))
                .view(np.float64)
                .reshape(f, p * b, k)
            )
            v_glob = (
                all_v.transpose(1, 0, 2, 3).reshape(f, p * b, k).astype(bool)
            )
            self._dists = [d_glob[i] for i in range(f)]
            self._vis = [v_glob[i] for i in range(f)]
            return
        # ragged fallback: pad to the max pool length, gather, unpad
        dists, vis = self._pooled()
        n = 0 if dists is None else dists.shape[0]
        counts = np.asarray(mhu.process_allgather(np.asarray(n, np.int32)))
        n_max = int(counts.max())
        if n_max == 0:
            return
        k = self.num_kp
        pad_d = np.zeros((n_max, k), np.float64)
        pad_v = np.zeros((n_max, k), np.uint8)
        if n:
            pad_d[:n] = dists
            pad_v[:n] = vis
        d32 = np.ascontiguousarray(pad_d).view(np.uint32).reshape(n_max, 2 * k)
        all_d = (
            np.ascontiguousarray(np.asarray(mhu.process_allgather(d32)))
            .view(np.float64)
            .reshape(-1, n_max, k)
        )
        all_v = np.asarray(mhu.process_allgather(pad_v))
        self._dists = [
            all_d[p, : counts[p]] for p in range(len(counts)) if counts[p]
        ]
        self._vis = [
            all_v[p, : counts[p]].astype(bool)
            for p in range(len(counts))
            if counts[p]
        ]

    def get_measures(self, val_min: float, val_max: float, steps: int):
        """Returns (epe_mean_all, epe_mean_per_kp, epe_median_all, auc_all,
        pck_curve_all, thresholds) following the reference protocol
        (zimeval.py:80-129, called as epochpass3d.py:168-175)."""
        thresholds = np.linspace(val_min, val_max, steps)
        dists, vis = self._pooled()
        if dists is None:
            nan = float("nan")
            return nan, [], nan, nan, np.full(steps, np.nan), thresholds

        epe_means, epe_medians, pck_curves, aucs = [], [], [], []
        for k in range(self.num_kp):
            d = dists[:, k][vis[:, k]]
            if d.size == 0:
                continue
            epe_means.append(d.mean())
            epe_medians.append(np.median(d))
            pck = (d[None, :] <= thresholds[:, None]).mean(axis=1)
            pck_curves.append(pck)
            auc = np.trapezoid(pck, thresholds) / (val_max - val_min)
            aucs.append(auc)

        if not aucs:
            nan = float("nan")
            return nan, [], nan, nan, np.full(steps, np.nan), thresholds
        pck_curve_all = np.mean(np.stack(pck_curves), axis=0)
        return (
            float(np.mean(epe_means)),
            epe_means,
            float(np.mean(epe_medians)),
            float(np.mean(aucs)),
            pck_curve_all,
            thresholds,
        )
