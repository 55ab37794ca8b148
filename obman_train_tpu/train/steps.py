"""Optimizer construction and the jitted SPMD train/eval steps.

Replaces the reference's single-process loop (traineval.py:113-127 optimizer
setup, epochpass3d.py:80-91 forward/backward/step, DataParallel scatter):
here one jit-compiled program takes a replicated TrainState and a
data-sharded batch; XLA SPMD partitioning inserts the gradient all-reduce
over ICI.  Frozen-BN training (the reference default, README.md:133 /
netutils.py:4-19) corresponds to ``train_bn=False``: BN uses running stats
and collects no updates while all other params still receive gradients.

Parameter freezing (``--freeze_encoder`` etc., traineval.py:91-101) is done
with optax.multi_transform: frozen subtrees get ``set_to_zero`` updates.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from obman_train_tpu.config import TrainConfig
from obman_train_tpu.models.handnet import BatchSpec, HandNet
from obman_train_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    regul_scale: jnp.ndarray    # dynamic decay factor for edge/laplacian reguls


def _freeze_labels(params, train_cfg: TrainConfig) -> Any:
    """Label pytree: 'frozen' for subtrees disabled by the freeze flags."""
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    labels = {}
    for path in flat:
        label = "trainable"
        if train_cfg.freeze_encoder and path.startswith("base_net/"):
            label = "frozen"
        if train_cfg.atlas_freeze_encoder and path.startswith("atlas_base_net/"):
            label = "frozen"
        if train_cfg.atlas_freeze_decoder and path.startswith(
            "atlas_branch/decoder/"
        ):
            label = "frozen"
        labels[path] = label
    return flax.traverse_util.unflatten_dict(labels, sep="/")


def lr_schedule(train_cfg: TrainConfig, steps_per_epoch: int = 1):
    """The StepLR schedule ``make_optimizer`` applies, as a callable of
    the optax update count.  Exposed so the training loop can log the lr
    ACTUALLY used each epoch (schedule evaluated at the live step counter)
    rather than a formula recomputed from the config — the convergence
    artifact asserts against these logged values (docs/convergence/)."""
    if train_cfg.lr_decay_gamma and train_cfg.lr_decay_gamma != 1.0:
        return optax.exponential_decay(
            init_value=train_cfg.lr,
            transition_steps=train_cfg.lr_decay_step * steps_per_epoch,
            decay_rate=train_cfg.lr_decay_gamma,
            staircase=True,
        )
    return lambda count: train_cfg.lr


def make_optimizer(
    train_cfg: TrainConfig, params=None, steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    """adam | rms | sgd with the reference's StepLR schedule
    (traineval.py:113-127, 179-182: per-epoch staircase decay)."""
    if train_cfg.lr_decay_gamma and train_cfg.lr_decay_gamma != 1.0:
        schedule = lr_schedule(train_cfg, steps_per_epoch)
    else:
        schedule = train_cfg.lr

    if train_cfg.optimizer == "adam":
        tx = optax.adamw(schedule, weight_decay=train_cfg.weight_decay) \
            if train_cfg.weight_decay else optax.adam(schedule)
    elif train_cfg.optimizer == "rms":
        tx = optax.rmsprop(schedule)
        if train_cfg.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(train_cfg.weight_decay), tx)
    elif train_cfg.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=train_cfg.momentum)
        if train_cfg.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(train_cfg.weight_decay), tx)
    else:
        raise ValueError(f"optimizer {train_cfg.optimizer} not in [adam|rms|sgd]")

    any_freeze = (
        train_cfg.freeze_encoder
        or train_cfg.atlas_freeze_encoder
        or train_cfg.atlas_freeze_decoder
    )
    if any_freeze:
        assert params is not None, "params needed to build freeze labels"
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()},
            _freeze_labels(params, train_cfg),
        )
    return tx


def create_train_state(
    net: HandNet,
    tx: optax.GradientTransformation,
    sample_batch: Dict,
    spec: BatchSpec,
    seed: int = 0,
    **init_kwargs,
) -> TrainState:
    variables = net.init(
        {
            "params": jax.random.PRNGKey(seed),
            "points": jax.random.PRNGKey(seed + 1),
            "dropout": jax.random.PRNGKey(seed + 2),
        },
        sample_batch,
        spec,
        **init_kwargs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        regul_scale=jnp.ones((), jnp.float32),
    )


def make_train_step(
    net: HandNet,
    tx: optax.GradientTransformation,
    spec: BatchSpec,
    train_bn: bool = False,
    mesh=None,
    donate: bool = True,
    return_joints: bool = False,
    accum_steps: int = 1,
) -> Callable[[TrainState, Dict, jnp.ndarray], Tuple[TrainState, Dict]]:
    """Build the jitted train step.  ``train_bn=False`` = frozen-BN recipe.

    ``return_joints=True`` additionally returns predicted joints so the
    epoch engine can feed the PCK evaluator during training as the
    reference does (epochpass3d.py:141-151); the step then returns
    ``(state, losses, joints)``.

    ``accum_steps=A > 1`` accumulates gradients over A microbatches under
    ``lax.scan`` before the single optimizer update — the standard
    micro-batching recipe for fitting contact-loss configs in HBM at
    large effective batch sizes.  Microbatches are STRIDED (rows i, i+A,
    i+2A, ...) so each one stays balanced across the data mesh under
    contiguous batch sharding, and BN stats, when training, update
    sequentially through the scan.  Losses/gradients are averaged over
    microbatches: for fixed-denominator losses (per-sample means — the
    MANO/Atlas/regul terms) this equals the full-batch mean exactly; for
    the contact terms, whose masked-mean denominator is the penetrating/
    close vertex count over the whole batch (ops/contact.py
    masked_mean_loss), it is the standard per-microbatch semantics —
    each microbatch normalizes by its own count, so the result can
    differ from the accum=1 value when counts are very uneven across
    microbatches (striding keeps them statistically matched).
    """

    def forward_grads(params, batch_stats, batch, regul_scale, rngs):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": batch_stats}
            if train_bn:
                (total, results, losses), updated = net.apply(
                    variables, batch, spec, train=True, rngs=rngs,
                    regul_scale=regul_scale, mutable=["batch_stats"],
                )
                new_stats = updated["batch_stats"]
            else:
                total, results, losses = net.apply(
                    variables, batch, spec, train=False, rngs=rngs,
                    regul_scale=regul_scale,
                )
                new_stats = batch_stats
            joints = results.get("joints") if return_joints else None
            return total, (losses, new_stats, joints)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return aux, grads

    def step_fn(state: TrainState, batch: Dict, rng: jnp.ndarray):
        step_rng = jax.random.fold_in(rng, state.step)

        if accum_steps == 1:
            dropout_rng, points_rng = jax.random.split(step_rng)
            (losses, new_stats, joints), grads = forward_grads(
                state.params, state.batch_stats, batch, state.regul_scale,
                {"dropout": dropout_rng, "points": points_rng},
            )
        else:
            from obman_train_tpu.parallel.mesh import infer_batch_size

            b = infer_batch_size(batch)
            if b % accum_steps:
                raise ValueError(
                    f"batch size {b} not divisible by accum_steps"
                    f" {accum_steps}"
                )

            # strided microbatches: row r goes to microbatch r % A.  Only
            # leaves with the batch leading dim are split; per-batch leaves
            # (e.g. the rank-0 device-augment ``aug_order``) are broadcast
            # to every microbatch unchanged so they can ride the scan xs.
            def to_micro(v):
                if getattr(v, "ndim", 0) and v.shape[0] == b:
                    return jnp.swapaxes(
                        v.reshape(b // accum_steps, accum_steps, *v.shape[1:]),
                        0, 1,
                    )
                return jnp.broadcast_to(
                    v, (accum_steps,) + tuple(getattr(v, "shape", ()))
                )

            micro = jax.tree_util.tree_map(to_micro, batch)

            def accum_body(carry, xs):
                stats, grad_acc, loss_acc = carry
                mb, idx = xs
                mb_rng = jax.random.fold_in(step_rng, idx)
                dropout_rng, points_rng = jax.random.split(mb_rng)
                (losses, new_stats, joints), grads = forward_grads(
                    state.params, stats, mb, state.regul_scale,
                    {"dropout": dropout_rng, "points": points_rng},
                )
                grad_acc = jax.tree_util.tree_map(
                    jnp.add, grad_acc, grads
                )
                loss_acc = jax.tree_util.tree_map(
                    jnp.add, loss_acc, losses
                )
                return (new_stats, grad_acc, loss_acc), joints

            idxs = jnp.arange(accum_steps)
            mb0 = jax.tree_util.tree_map(lambda v: v[0], micro)
            loss_shapes = jax.eval_shape(
                lambda p, s, m: forward_grads(
                    p, s, m, state.regul_scale,
                    {"dropout": step_rng, "points": step_rng},
                )[0][0],
                state.params, state.batch_stats, mb0,
            )
            zero_losses = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), loss_shapes
            )
            (new_stats, grads, losses), joints_stack = jax.lax.scan(
                accum_body,
                (
                    state.batch_stats,
                    jax.tree_util.tree_map(jnp.zeros_like, state.params),
                    zero_losses,
                ),
                (micro, idxs),
            )
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            losses = jax.tree_util.tree_map(lambda v: v * inv, losses)
            if return_joints and joints_stack is not None:
                # (A, B/A, ...) -> original row order
                joints = jnp.swapaxes(joints_stack, 0, 1).reshape(
                    b, *joints_stack.shape[2:]
                )
            else:
                joints = None

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            regul_scale=state.regul_scale,
        )
        if return_joints:
            return new_state, losses, joints
        return new_state, losses

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        rep = replicated(mesh)
        data = batch_sharding(mesh)
        # batch in_shardings stays None: the batch is pre-placed by
        # parallel.shard_batch (data-sharded batch-dim arrays, replicated
        # per-batch scalars like aug_order) — a blanket P("data") prefix
        # cannot express that mix and fails on rank-0 leaves
        kwargs["in_shardings"] = (rep, None, rep)
        if return_joints:
            kwargs["out_shardings"] = (rep, rep, data)
        else:
            kwargs["out_shardings"] = (rep, rep)
    return jax.jit(step_fn, **kwargs)


def make_train_step_syncbn(
    net: HandNet,
    tx: optax.GradientTransformation,
    spec: BatchSpec,
    mesh,
    return_joints: bool = False,
):
    """Train step with UNFROZEN BatchNorm whose batch statistics are
    synchronized across the data mesh (torch-SyncBN equivalent; the
    reference's DataParallel never syncs, SURVEY.md §5).

    flax BatchNorm's ``axis_name`` needs a bound mesh axis, which plain
    jit+NamedSharding SPMD does not provide — so the step body runs under
    shard_map: each shard computes grads on its local batch, all-reduces
    them with ``lax.pmean``, and applies identical updates, keeping params
    replicated.  Requires ModelConfig(sync_bn=True) so BN layers carry
    axis_name="data".
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def step_fn(state: TrainState, batch: Dict, rng: jnp.ndarray):
        step_rng = jax.random.fold_in(rng, state.step)
        dropout_rng, points_rng = jax.random.split(step_rng)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (total, results, losses), updated = net.apply(
                variables, batch, spec, train=True,
                rngs={"dropout": dropout_rng, "points": points_rng},
                regul_scale=state.regul_scale, mutable=["batch_stats"],
            )
            joints = results.get("joints") if return_joints else None
            return total, (losses, updated["batch_stats"], joints)

        (_, (losses, new_stats, joints)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # Cross-shard reductions: grads/losses averaged; BN running stats
        # were already computed from pmean'd batch stats (axis_name bound),
        # but the *updates* ran per-shard on identical inputs -> identical.
        grads = jax.lax.pmean(grads, "data")
        losses = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, "data") if x is not None else None,
            losses,
        )
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1, regul_scale=state.regul_scale,
        )
        if return_joints:
            return new_state, losses, joints
        return new_state, losses

    batch_spec_tree = P("data")
    rep = P()
    out_specs = (rep, rep, batch_spec_tree) if return_joints else (rep, rep)
    try:
        sharded = shard_map(
            step_fn,
            mesh=mesh,
            in_specs=(rep, batch_spec_tree, rep),
            out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # older jax uses check_rep
        sharded = shard_map(
            step_fn,
            mesh=mesh,
            in_specs=(rep, batch_spec_tree, rep),
            out_specs=out_specs,
            check_rep=False,
        )
    return jax.jit(sharded)


def make_eval_step(
    net: HandNet, spec: BatchSpec, mesh=None, no_loss: bool = False
):
    """Jitted eval step returning (losses, joints, verts, objpoints)."""

    def eval_fn(state: TrainState, batch: Dict):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        total, results, losses = net.apply(
            variables, batch, spec, train=False, no_loss=no_loss,
            rngs={"points": jax.random.PRNGKey(0)},
        )
        out = {
            k: results[k]
            for k in ("verts", "joints", "objpoints3d", "objtrans", "objscale",
                      "joints2d", "center3d")
            if k in results
        }
        return losses, out

    kwargs = {}
    if mesh is not None:
        rep = replicated(mesh)
        data = batch_sharding(mesh)
        # batch pre-placed by parallel.shard_batch (see make_train_step)
        kwargs["in_shardings"] = (rep, None)
        kwargs["out_shardings"] = (rep, data)
    return jax.jit(eval_fn, **kwargs)
