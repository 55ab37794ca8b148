"""Checkpointing: orbax save/restore with a JSON config sidecar, plus the
reference's special modes.

Reference behaviours reproduced (mano_train/modelutils/modelio.py:10-105,
exputils/argutils.py:49-52):
- ``<exp>/checkpoint`` always holds the latest state; every ``snapshot``
  epochs a ``checkpoint_<N>`` copy is kept; on a new best val metric the
  state is copied to ``model_best``;
- the config travels beside the weights (JSON here instead of ``opt.pkl``)
  and is the contract demos/reload rely on;
- multi-checkpoint **weight averaging** for evaluation (modelio.py:10-28);
- torch-checkpoint import for the released models, including DataParallel
  ``module.`` prefix stripping (modelio.py:35-41) and the
  ``base_net.* -> atlas_base_net.*`` remap used by ``--atlas_resume``
  (modelio.py:47-55).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from obman_train_tpu.config import ExperimentConfig

CONFIG_NAME = "opt.json"


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    exp_dir: str,
    state: Any,
    epoch: int,
    config: Optional[ExperimentConfig] = None,
    is_best: bool = False,
    snapshot: int = 0,
) -> str:
    """Write ``<exp_dir>/checkpoint`` (+ snapshot/best copies).

    Multi-process runs must call this on EVERY process: orbax's save runs
    an internal cross-process sync barrier, so a rank-0-only call
    deadlocks the primary (observed: rank 0 hung in save while rank 1 hit
    the jax shutdown barrier).  Cross-process (non-fully-addressable)
    state leaves — all replicated — are pulled to host numpy via their
    local shard first; orbax then writes host arrays from the primary
    process only.  The JSON sidecar is written by process 0 alone.
    """
    exp_dir = os.path.abspath(exp_dir)
    os.makedirs(exp_dir, exist_ok=True)
    if jax.process_count() > 1:
        from obman_train_tpu.parallel.mesh import local_shard

        state = jax.tree_util.tree_map(local_shard, state)
    payload = {"state": state, "epoch": np.asarray(epoch)}
    ckptr = _ckptr()
    path = os.path.join(exp_dir, "checkpoint")
    ckptr.save(path, payload, force=True)
    if snapshot and epoch % snapshot == 0:
        ckptr.save(os.path.join(exp_dir, f"checkpoint_{epoch}"), payload,
                   force=True)
    if is_best:
        ckptr.save(os.path.join(exp_dir, "model_best"), payload, force=True)
    if config is not None and jax.process_index() == 0:
        config.to_json(os.path.join(exp_dir, CONFIG_NAME))
    return path


def load_checkpoint(
    path: str, state_template: Any
) -> Tuple[Any, int]:
    """Restore a checkpoint; ``path`` may be an exp dir or a checkpoint dir.

    Restore targets take the template's shardings, so a checkpoint written
    under one mesh restores cleanly onto another (e.g. 8-device training ->
    single-chip eval)."""
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "checkpoint")):
        path = os.path.join(path, "checkpoint")
    template = {"state": state_template, "epoch": np.asarray(0)}

    def _restore_arg(x):
        if hasattr(x, "sharding"):
            return ocp.ArrayRestoreArgs(
                sharding=x.sharding, global_shape=x.shape, dtype=x.dtype
            )
        return ocp.RestoreArgs()

    restore_args = jax.tree_util.tree_map(_restore_arg, template)
    payload = _ckptr().restore(
        path, item=template, restore_args=restore_args
    )
    return payload["state"], int(payload["epoch"])


def load_checkpoint_lax(path: str, state_template: Any) -> Tuple[Any, int]:
    """Non-strict restore: load whatever the checkpoint contains (raw
    structure) and merge leaves whose paths+shapes match the template —
    the reference's strict->non-strict fallback (reload.py:103-110) and
    the basis for --atlas_resume's partial seeding."""
    import flax

    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "checkpoint")):
        path = os.path.join(path, "checkpoint")
    raw = _ckptr().restore(path)  # checkpoint's own structure, numpy leaves
    raw_state = raw.get("state", raw)
    epoch = int(np.asarray(raw.get("epoch", 0)))

    template_dict = (
        state_template._asdict()
        if hasattr(state_template, "_asdict")
        else state_template
    )
    flat_t = flax.traverse_util.flatten_dict(template_dict, sep="/")
    flat_r = flax.traverse_util.flatten_dict(raw_state, sep="/")
    merged = {}
    skipped = []
    for k, v in flat_t.items():
        # orbax may restore namedtuples as dicts with stringified int keys
        if k in flat_r and getattr(flat_r[k], "shape", None) == getattr(
            v, "shape", None
        ):
            merged[k] = jax.device_put(
                flat_r[k], getattr(v, "sharding", None)
            )
        else:
            merged[k] = v
            skipped.append(k)
    if skipped:
        print(f"load_checkpoint_lax: kept {len(skipped)} template leaves "
              f"(first: {skipped[:3]})")
    out = flax.traverse_util.unflatten_dict(merged, sep="/")
    if hasattr(state_template, "_asdict"):
        out = type(state_template)(**out)
    return out, epoch


def load_config(exp_dir: str) -> ExperimentConfig:
    return ExperimentConfig.from_json(os.path.join(exp_dir, CONFIG_NAME))


def load_checkpoints_averaged(paths, state_template) -> Tuple[Any, int]:
    """Average params over several checkpoints (eval-time weight averaging,
    reference modelio.py:10-28). Non-param leaves come from the first."""
    states, epochs = zip(*(load_checkpoint(p, state_template) for p in paths))
    n = float(len(states))
    avg_params = jax.tree_util.tree_map(
        lambda *xs: sum(xs) / n, *(s.params for s in states)
    )
    return states[0]._replace(params=avg_params), max(epochs)


# ---------------------------------------------------------------------------
# Torch checkpoint import (release models)
# ---------------------------------------------------------------------------

def strip_module_prefix(state_dict: dict) -> dict:
    """Remove DataParallel 'module.' prefixes (modelio.py:35-41)."""
    return {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}


def remap_atlas_resume(state_dict: dict) -> dict:
    """base_net.* -> atlas_base_net.* remap (modelio.py:47-55)."""
    out = dict(state_dict)
    for k, v in state_dict.items():
        if k.startswith("base_net."):
            out["atlas_base_net." + k[len("base_net."):]] = v
    return out


def _dense(flat, path, w=None, b=None):
    if w is not None:
        # torch Linear (out, in) -> flax (in, out); Conv1d k=1 (out, in, 1)
        w = np.asarray(w)
        if w.ndim == 3:
            w = w[:, :, 0]
        flat[f"{path}/kernel"] = np.transpose(w, (1, 0))
    if b is not None:
        flat[f"{path}/bias"] = np.asarray(b)


def _bn1d(flat_p, flat_s, path, torch_state, torch_prefix):
    flat_p[f"{path}/scale"] = np.asarray(torch_state[torch_prefix + ".weight"])
    flat_p[f"{path}/bias"] = np.asarray(torch_state[torch_prefix + ".bias"])
    flat_s[f"{path}/mean"] = np.asarray(
        torch_state[torch_prefix + ".running_mean"]
    )
    flat_s[f"{path}/var"] = np.asarray(
        torch_state[torch_prefix + ".running_var"]
    )


def import_torch_handnet(
    state_dict: dict, variables: dict, atlas_resume: bool = False
) -> dict:
    """Map a reference HandNet torch state_dict onto our flax variables.

    Covers: base_net / atlas_base_net (torchvision ResNet layout),
    mano_branch (MLP + pose/shape/trans heads + skeleton regs), atlas_branch
    (PointGenCon conv/bn stacks, decode_trans/scale), absolute and
    scaletrans branches.
    """
    import flax

    from obman_train_tpu.models.resnet import import_torch_state_dict

    state = strip_module_prefix(
        {k: np.asarray(v) for k, v in state_dict.items()}
    )
    if atlas_resume:
        state = remap_atlas_resume(state)

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    # Encoders via the resnet importer.
    for enc in ("base_net", "atlas_base_net"):
        if enc in params:
            sub = {
                "params": params[enc],
                "batch_stats": stats.get(enc, {}),
            }
            imported = import_torch_state_dict(state, sub, prefix=enc + ".")
            params[enc] = imported["params"]
            if enc in stats:
                stats[enc] = imported["batch_stats"]

    flat_p = flax.traverse_util.flatten_dict(params, sep="/")
    flat_s = flax.traverse_util.flatten_dict(stats, sep="/")

    def has(k):
        return k in state

    # --- mano branch ---
    # torch: mano_branch.base_layer.{0,2,...}.weight (Linear every 2 with ReLU)
    lin_idxs = sorted(
        {
            int(m.group(1))
            for k in state
            if (m := re.match(r"mano_branch\.base_layer\.(\d+)\.weight", k))
        }
    )
    for i, idx in enumerate(lin_idxs):
        _dense(
            flat_p, f"mano_branch/base/dense_{i}",
            state[f"mano_branch.base_layer.{idx}.weight"],
            state[f"mano_branch.base_layer.{idx}.bias"],
        )
    if has("mano_branch.pose_reg.weight"):
        _dense(flat_p, "mano_branch/pose_reg",
               state["mano_branch.pose_reg.weight"],
               state["mano_branch.pose_reg.bias"])
    if has("mano_branch.shape_reg.0.weight"):
        _dense(flat_p, "mano_branch/shape_reg",
               state["mano_branch.shape_reg.0.weight"],
               state["mano_branch.shape_reg.0.bias"])
    if has("mano_branch.trans_reg.weight"):
        _dense(flat_p, "mano_branch/trans_reg",
               state["mano_branch.trans_reg.weight"],
               state["mano_branch.trans_reg.bias"])
    for side in ("left", "right"):
        k = f"mano_branch.{side}_skeleton_reg.weight"
        if has(k) and f"mano_branch/{side}_skeleton_reg" in flat_p:
            # stored as torch Linear (out,in) applied to last dim; our einsum
            # uses W[j,k] directly == torch weight
            flat_p[f"mano_branch/{side}_skeleton_reg"] = np.asarray(state[k])

    # --- atlas decoder (PointGenCon) ---
    for i in (1, 2, 3, 4):
        k = f"atlas_branch.decoder.conv{i}.weight"
        if has(k):
            _dense(flat_p, f"atlas_branch/decoder/conv{i}",
                   state[k], state[f"atlas_branch.decoder.conv{i}.bias"])
    for i in (1, 2, 3):
        k = f"atlas_branch.decoder.bn{i}.weight"
        if has(k):
            _bn1d(flat_p, flat_s, f"atlas_branch/decoder/bn{i}",
                  state, f"atlas_branch.decoder.bn{i}")
    # residual decoder blocks
    for blk in (1, 2, 3):
        for i in (1, 2, 3):
            k = f"atlas_branch.decoder.residual{blk}.conv{i}.weight"
            if has(k):
                _dense(
                    flat_p,
                    f"atlas_branch/decoder/residual{blk}/conv{i}",
                    state[k],
                    state[f"atlas_branch.decoder.residual{blk}.conv{i}.bias"],
                )
        for i in (1, 2):
            k = f"atlas_branch.decoder.residual{blk}.bn{i}.weight"
            if has(k):
                _bn1d(flat_p, flat_s,
                      f"atlas_branch/decoder/residual{blk}/bn{i}",
                      state, f"atlas_branch.decoder.residual{blk}.bn{i}")

    # --- atlas trans/scale heads ---
    # Only import heads the flax model actually has — writing keys absent
    # from the template would smuggle unused branches into the checkpoint
    # and break strict restores later.
    if has("atlas_branch.decode_trans.0.weight") and (
        "atlas_branch/decode_trans/dense_0/kernel" in flat_p
    ):
        _dense(flat_p, "atlas_branch/decode_trans/dense_0",
               state["atlas_branch.decode_trans.0.weight"],
               state["atlas_branch.decode_trans.0.bias"])
        _dense(flat_p, "atlas_branch/decode_trans/final",
               state["atlas_branch.decode_trans.2.weight"],
               state["atlas_branch.decode_trans.2.bias"])
    if has("atlas_branch.decode_scale.0.weight") and (
        "atlas_branch/decode_scale_hidden/kernel" in flat_p
    ):
        _dense(flat_p, "atlas_branch/decode_scale_hidden",
               state["atlas_branch.decode_scale.0.weight"],
               state["atlas_branch.decode_scale.0.bias"])
        _dense(flat_p, "atlas_branch/decode_scale_out",
               state["atlas_branch.decode_scale.2.weight"],
               state["atlas_branch.decode_scale.2.bias"])

    # --- absolute / scaletrans branches ---
    for torch_name, flax_name in (
        ("absolute_branch", "absolute_branch"),
        ("scaletrans_branch", "scaletrans_branch"),
    ):
        if has(f"{torch_name}.decoder.0.weight") and (
            f"{flax_name}/dense_0/kernel" in flat_p
        ):
            _dense(flat_p, f"{flax_name}/dense_0",
                   state[f"{torch_name}.decoder.0.weight"],
                   state[f"{torch_name}.decoder.0.bias"])
            _dense(flat_p, f"{flax_name}/final",
                   state[f"{torch_name}.final_layer.weight"],
                   state[f"{torch_name}.final_layer.bias"])

    if has("atlas_adapter.weight") and "atlas_adapter/kernel" in flat_p:
        _dense(flat_p, "atlas_adapter", state["atlas_adapter.weight"],
               state["atlas_adapter.bias"])

    import jax.numpy as jnp

    out_p = flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat_p.items()}, sep="/"
    )
    out_s = flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat_s.items()}, sep="/"
    )
    return {"params": out_p, "batch_stats": out_s}
