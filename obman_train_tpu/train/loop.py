"""Epoch engine and full training orchestration.

Equivalent of the reference's ``epoch_pass`` (mano_train/netscripts/
epochpass3d.py:17-215) and the ``traineval.main`` epoch loop
(traineval.py:281-404): per-batch step, AverageMeters accumulation,
PCK/EPE/AUC evaluation over (0, 50, 20) thresholds, per-epoch text/json
logging, best-checkpoint selection (val AUC if joints are evaluated, else
min total loss), StepLR via the optax schedule, and per-epoch regul decay
via the dynamic ``regul_scale``.

TPU specifics: batches from different datasets carry different static
BatchSpecs; step functions are compiled once per spec and cached.  Host
metrics work overlaps device compute (losses are fetched after dispatching
the next step).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, Optional

import jax
import numpy as np

from obman_train_tpu.config import ExperimentConfig
from obman_train_tpu.data.loader import derive_spec
from obman_train_tpu.models.handnet import BatchSpec, HandNet
from obman_train_tpu.train.checkpoint import save_checkpoint
from obman_train_tpu.train.metrics import AverageMeters, EvalUtil
from obman_train_tpu.train.steps import (
    TrainState,
    make_eval_step,
    make_train_step,
)
from obman_train_tpu.utils.logging import Monitor

EVAL_JOINT_IDXS = list(range(21))  # joints used for evaluation (epochpass3d.py:37)


class StepCache:
    """Compile-once-per-BatchSpec step functions."""

    def __init__(
        self, net: HandNet, tx, train_bn: bool, mesh=None, accum_steps=1
    ):
        self.net = net
        self.tx = tx
        self.train_bn = train_bn
        self.mesh = mesh
        self.accum_steps = accum_steps
        self._train: Dict[BatchSpec, object] = {}
        self._eval: Dict[BatchSpec, object] = {}

    def train_step(self, spec: BatchSpec):
        if spec not in self._train:
            # donate=True: the old TrainState's buffers are consumed by the
            # update (epoch_pass threads state linearly, never reusing it).
            self._train[spec] = make_train_step(
                self.net, self.tx, spec, train_bn=self.train_bn,
                mesh=self.mesh, donate=True,
                return_joints=spec.has_joints3d,
                accum_steps=self.accum_steps,
            )
        return self._train[spec]

    def eval_step(self, spec: BatchSpec):
        if spec not in self._eval:
            self._eval[spec] = make_eval_step(self.net, spec, mesh=self.mesh)
        return self._eval[spec]


def _to_device(batch: Dict, mesh=None):
    arrays = {
        k: v for k, v in batch.items() if isinstance(v, np.ndarray)
    }
    if mesh is not None:
        from obman_train_tpu.parallel.mesh import shard_batch

        return shard_batch(arrays, mesh)
    # One async device_put of the whole tree: passing numpy leaves straight
    # into the jitted step converts them one by one with a device sync per
    # array — on a remote/tunneled TPU that is a full round trip per leaf
    # (measured 480 ms/step vs 12 ms for the tree put at batch 64).
    return jax.device_put(arrays)


def epoch_pass(
    loader,
    net: HandNet,
    state: TrainState,
    steps: StepCache,
    epoch: int,
    train: bool = True,
    rng_seed: int = 0,
    save_results_dir: Optional[str] = None,
    monitor_cb=None,
    display_dir: Optional[str] = None,
    display_freq: int = 500,
    hand_faces: Optional[np.ndarray] = None,
):
    """One pass over ``loader``; returns (state, avg_meters, pck_info)."""
    from obman_train_tpu.parallel.mesh import local_shard

    avg_meters = AverageMeters()
    time_meters = AverageMeters()
    evaluator = EvalUtil()
    rng = jax.random.PRNGKey(rng_seed)
    if jax.process_count() > 1:
        # a process-local key can't feed the global-mesh jit, and passing
        # host numpy would make every step's input commit run a blocking
        # cross-process assert_equal — build the replicated global array
        # once, communication-free
        from obman_train_tpu.parallel.mesh import replicated

        rng = jax.make_array_from_process_local_data(
            replicated(steps.mesh), np.asarray(rng)
        )
    end = time.time()
    rank = jax.process_index()
    multiproc = jax.process_count() > 1
    # NOTE: anything jitted over the global mesh (the figure eval forward
    # included) is a COLLECTIVE program — every process must execute it in
    # the same order, so display_step/display_dir stay rank-independent
    # and only the file write below is gated to process 0.

    def _process_outputs(
        batch_idx, batch, device_batch, root, results, fig_results
    ):
        if display_dir is not None and fig_results is not None and rank == 0:
            # Periodic qualitative figure (epochpass3d.py:126-134);
            # single writer — process 0 renders its local rows.
            try:
                from obman_train_tpu.visualize.displaymano import (
                    visualize_batch,
                )

                os.makedirs(display_dir, exist_ok=True)
                faces = (
                    hand_faces
                    if hand_faces is not None
                    else _default_hand_faces()
                )
                def to_np(v):
                    # contact_info is a nested dict of arrays; local_shard
                    # reads the process-local rows of cross-process arrays
                    if isinstance(v, dict):
                        return {k: to_np(x) for k, x in v.items()}
                    return local_shard(v)

                visualize_batch(
                    os.path.join(display_dir, f"img_{batch_idx:06d}.png"),
                    {k: to_np(v) for k, v in device_batch.items()},
                    {k: to_np(v) for k, v in fig_results.items()},
                    faces,
                    obj_faces=np.asarray(net.ico_faces),
                )
            except Exception as e:
                print(f"visualize_batch skipped: {e}")

        if results is not None and "joints" in results:
            if "joints3d" in batch:
                # GT joints come from the HOST batch (already numpy, and
                # process-local on multi-process runs — matching the local
                # prediction rows local_shard reads); the device copy would
                # cost a d2h round trip per step
                evaluator.feed(
                    np.asarray(batch["joints3d"])[:, EVAL_JOINT_IDXS],
                    local_shard(results["joints"])[:, EVAL_JOINT_IDXS],
                )
            if not train and save_results_dir is not None:
                os.makedirs(save_results_dir, exist_ok=True)
                payload = {
                    "batch": {
                        k: np.asarray(v)
                        for k, v in batch.items()
                        if isinstance(v, np.ndarray)
                    },
                    "results": {
                        k: local_shard(v) for k, v in results.items()
                    },
                    "root": root,
                }
                # multi-process: each process dumps its own shard of the
                # val set (together they cover every sample exactly once)
                suffix = f"_rank{rank}" if multiproc else ""
                with open(
                    os.path.join(
                        save_results_dir,
                        f"batch_{batch_idx:06d}{suffix}.pkl",
                    ),
                    "wb",
                ) as f:
                    pickle.dump(payload, f)

    def prefetch_host(tree):
        """Start async device->host copies for everything process_host will
        read.  Issued at dispatch time so the transfers stream while the
        device computes the NEXT step; without this every float()/asarray
        in process_host is a separate blocking round trip — expensive on
        remote/tunneled TPUs (one RPC per loss key per step)."""
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

    def process_host(pending):
        """Host-side work for a completed step: metric floats (forces the
        device sync), evaluator feed, figures, result dumps.  Deferred by
        one batch so the device computes step N+1 while the host drains
        step N (jit dispatch is async; the float() here is the sync point).
        """
        batch_idx, batch, device_batch, root, losses, results, figr = pending
        for key, val in losses.items():
            if val is None:
                continue
            v = float(val)
            avg_meters.add_loss_value(key, v)
            if v > 1e5 and key == "total_loss":
                print(f"loss explosion? {key}={v} at batch {batch_idx}")
        _process_outputs(
            batch_idx, batch, device_batch, root, results, figr,
        )

    pending = None
    for batch_idx, batch in enumerate(loader):
        time_meters.add_loss_value("data_time", time.time() - end)
        root = batch.get("root", "wrist")
        # steps.mesh wires the SPMD path: shard_batch places the batch with
        # the data sharding (and on multi-host assembles the global array
        # from process-local shards) so the jitted step's in_shardings see
        # correctly-placed inputs
        device_batch = _to_device(batch, mesh=steps.mesh)
        spec = derive_spec(device_batch, root=root)

        # display_freq <= 0 disables batch-level figures entirely.
        display_step = (
            display_dir is not None
            and display_freq > 0
            and batch_idx % display_freq == 0
        )
        fig_results = None
        if train:
            if display_step:
                # The reference renders train-pass diagnostics from the
                # step's own forward (epochpass3d.py:126-134); the jitted
                # train step returns only joints, so run the cached eval
                # step on the pre-update state for the figure —
                # display_freq amortizes the extra forward.
                _, fig_results = steps.eval_step(spec)(state, device_batch)
            out = steps.train_step(spec)(state, device_batch, rng)
            if len(out) == 3:
                state, losses, joints = out
                results = {"joints": joints} if joints is not None else None
            else:
                state, losses = out
                results = None
        else:
            losses, results = steps.eval_step(spec)(state, device_batch)
            if display_step:
                fig_results = results

        # prefetch only what process_host will read: all loss scalars, the
        # joints (evaluator feed), the figure forward on display steps, and
        # the full results tree only when it is dumped — streaming
        # verts/objpoints every step would burn the d2h bandwidth this
        # prefetch conserves
        want_full = results is not None and (
            not train and save_results_dir is not None
        )
        prefetch_host((
            losses,
            fig_results,
            results if want_full
            else (results or {}).get("joints"),
        ))
        if pending is not None:
            process_host(pending)
        pending = (
            batch_idx, batch, device_batch, root, losses, results,
            fig_results,
        )

        time_meters.add_loss_value("batch_time", time.time() - end)
        end = time.time()
        if monitor_cb is not None:
            monitor_cb(batch_idx, avg_meters, time_meters)
    if pending is not None:
        process_host(pending)

    # surface loader/step timings in the logs (the reference's Bar telemetry,
    # epochpass3d.py:153-166)
    for key, meter in time_meters.average_meters.items():
        avg_meters.add_loss_value(key, meter.avg)

    pck_info = {}
    # multi-process: pool the per-process error shards so every process
    # reports the GLOBAL metrics (no-op single-process)
    evaluator.merge_distributed()
    epe_mean, _, epe_median, auc, pck_curve, thresholds = (
        evaluator.get_measures(0, 50, 20)
    )
    if np.isfinite(auc):
        pck_info = {
            "auc": auc,
            "epe_mean": epe_mean,
            "epe_median": epe_median,
            "pck_curve": pck_curve,
            "thres": thresholds,
        }
    return state, avg_meters, pck_info


def _default_hand_faces() -> np.ndarray:
    from obman_train_tpu.assets.contact_zones import _DATA

    return np.load(_DATA)["faces"].astype(np.int32)


def _save_pck_artifacts(cfg, epoch: int, pck_info: Dict, val_loader):
    """Per-epoch PCK curve image + pickle (epochpass3d.py:176-209), with the
    StereoHands literature overlay when evaluating that dataset."""
    pck_dir = os.path.join(cfg.exp_id, "pcks", "val")
    os.makedirs(pck_dir, exist_ok=True)
    overlay = None
    metas = getattr(val_loader, "metas", None)
    if metas and metas[0].get("dataset") == "stereohands":
        overlay = (
            "stereo_test" if metas[0].get("split") == "test" else "stereo_all"
        )
    try:
        from obman_train_tpu.visualize.displaymano import save_pck_img

        save_pck_img(
            pck_info["thres"], pck_info["pck_curve"], pck_info["auc"],
            os.path.join(pck_dir, f"epoch_{epoch}.png"), overlay=overlay,
        )
    except Exception as e:  # matplotlib-free environments
        print(f"pck plot skipped: {e}")
    with open(os.path.join(pck_dir, f"epoch_{epoch}.pkl"), "wb") as f:
        pickle.dump(pck_info, f)


def fit(
    cfg: ExperimentConfig,
    net: HandNet,
    state: TrainState,
    tx,
    train_loader,
    val_loader,
    mesh=None,
    start_epoch: int = 0,
):
    """Full training run (traineval.py:281-404 equivalent)."""
    import jax.numpy as jnp

    hosting = (
        # normpath: a trailing-slash exp_id would give an empty basename
        # and collapse every experiment's mirror into host_folder itself
        os.path.join(
            cfg.host_folder, os.path.basename(os.path.normpath(cfg.exp_id))
        )
        if getattr(cfg, "host_folder", None)
        else None
    )
    # multi-process: process 0 owns logs and figures (losses/metrics are
    # identical on every process: losses are replicated, PCK pools are
    # all-gathered); checkpoints go through orbax, whose multi-process
    # save coordinates its own single-writer protocol
    is_main = jax.process_index() == 0
    monitor = Monitor(cfg.exp_id, hosting_folder=hosting) if is_main else None
    multiproc = jax.process_count() > 1
    rep = None
    if multiproc:
        # init/restore produced process-LOCAL arrays; the global-mesh jit
        # needs globally-replicated inputs.  Every process holds identical
        # values (same seeds / same checkpoint), so build the global
        # arrays from the local data WITHOUT communication
        # (make_array_from_process_local_data, like parallel.shard_batch).
        # NOT jax.device_put: an eager device_put onto a cross-process
        # sharding runs a per-leaf assert_equal allgather — hundreds of
        # blocking gloo collectives whose 30 s rendezvous dies whenever
        # the ranks drift (observed on the 1-core CI host).
        from obman_train_tpu.parallel.mesh import local_shard, replicated

        rep = replicated(mesh)
        state = jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, local_shard(x)
            ),
            state,
        )
    steps = StepCache(
        net, tx, train_bn=not cfg.train.freeze_batchnorm, mesh=mesh,
        accum_steps=cfg.train.grad_accum,
    )
    best_score = None

    for epoch in range(start_epoch, cfg.train.epochs):
        display = (
            epoch % cfg.epoch_display_freq == 0 if cfg.epoch_display_freq
            else False
        )
        if not cfg.evaluate:
            state, train_meters, train_pck = epoch_pass(
                train_loader, net, state, steps, epoch,
                train=True, rng_seed=cfg.train.manual_seed + epoch,
                display_dir=(
                    os.path.join(
                        cfg.exp_id, "images", "train", f"epoch_{epoch}"
                    )
                    if display
                    else None
                ),
                display_freq=cfg.display_freq,
            )
            train_dict = train_meters.averages()
            for k in ("auc", "epe_mean", "epe_median"):
                if k in train_pck:
                    train_dict[k] = train_pck[k]
            # Log the lr/regul ACTUALLY applied this epoch: the schedule
            # evaluated at the live optimizer step counter (the count the
            # epoch's last update used) and the regul_scale the loss was
            # computed with — not a formula recomputed from the config, so
            # the convergence artifact can catch schedule-wiring
            # regressions (round-4 advisor finding).
            from obman_train_tpu.parallel.mesh import local_shard
            from obman_train_tpu.train.steps import lr_schedule

            step_count = int(np.asarray(local_shard(state.step)))
            schedule = lr_schedule(
                cfg.train, steps_per_epoch=max(len(train_loader), 1)
            )
            train_dict["lr"] = float(schedule(max(step_count - 1, 0)))
            train_dict["regul_scale"] = float(
                np.asarray(local_shard(state.regul_scale))
            )
            if monitor:
                monitor.log_train(epoch + 1, train_dict)

        save_dir = None
        if cfg.save_results:
            save_dir = os.path.join(
                cfg.exp_id, "save_results", "val", f"epoch_{epoch}"
            )
        state, val_meters, pck_info = epoch_pass(
            val_loader, net, state, steps, epoch,
            train=False, save_results_dir=save_dir,
            display_dir=(
                os.path.join(cfg.exp_id, "images", "val", f"epoch_{epoch}")
                if display
                else None
            ),
            display_freq=cfg.display_freq,
        )
        val_dict = val_meters.averages()
        for k in ("auc", "epe_mean", "epe_median"):
            if k in pck_info:
                val_dict[k] = pck_info[k]
        if monitor:
            monitor.log_val(epoch + 1, val_dict)
            if pck_info:
                _save_pck_artifacts(cfg, epoch, pck_info, val_loader)
            monitor.save_metrics()
            monitor.plot_metrics()

        if cfg.evaluate:
            return state, val_dict

        # Best-checkpoint rule (traineval.py:377-400)
        if "auc" in val_dict:
            score, is_better = val_dict["auc"], lambda s, b: s > b
        else:
            score, is_better = val_dict["total_loss"], lambda s, b: s < b
        is_best = best_score is None or is_better(score, best_score)
        best_score = score if is_best else best_score
        # every process calls: orbax saves run an internal cross-process
        # barrier (a rank-0-only call deadlocks); orbax itself writes the
        # arrays from the primary process only
        save_checkpoint(
            cfg.exp_id, state, epoch + 1, config=cfg,
            is_best=is_best, snapshot=cfg.train.snapshot,
        )
        # Regul decay (traineval.py:403-404 / handnet decay_regul)
        if cfg.train.regul_decay_gamma != 1.0 and (
            epoch % cfg.train.regul_decay_step == 0
        ):
            if multiproc:
                # eager math on cross-process arrays is restricted: decay
                # on the host, re-place replicated (communication-free —
                # see the state replication above for why not device_put)
                from obman_train_tpu.parallel.mesh import local_shard

                new_scale = jax.make_array_from_process_local_data(
                    rep,
                    local_shard(state.regul_scale)
                    * np.float32(cfg.train.regul_decay_gamma),
                )
            else:
                new_scale = state.regul_scale * jnp.asarray(
                    cfg.train.regul_decay_gamma
                )
            state = state._replace(regul_scale=new_scale)
    return state, (monitor.metrics if monitor else {})
