"""Branch losses as pure functions returning ``(final_loss, loss_dict)``.

Key semantics preserved from the reference:
- a lambda of ``None`` disables the term entirely, while ``0`` disables its
  gradient but (for some metrics) still reports it — here both are handled
  statically through config truthiness exactly as the reference's
  ``if lambda:`` checks (manobranch.py:251-324, atlasbranch.py:199-287);
- which losses run also depends on which GT queries the batch carries — that
  is static per dataset, expressed through :class:`BatchSpec` flags.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from obman_train_tpu.config import AtlasConfig, ManoConfig
from obman_train_tpu.ops.chamfer import chamfer_loss, plane_dtype_for
from obman_train_tpu.ops.mesh import edge_loss, laplacian_loss

# Compute the centered + final atlas chamfer pair as ONE stacked
# chamfer_loss call on a (2B, N, M) plane instead of two (B, N, M) calls.
# Per-example math is identical (the batched einsum contracts each example
# independently) — eager the values are bit-identical to the two-call form
# (tests/test_losses.py); under jit XLA may fuse the stacked graph
# differently, shifting f32 low bits only.  In-context A/B on the full
# train step (tools/fusion_ab.py, fusion_ab.json, v5e batch 256): the
# stacked plane LOSES ~1.1 ms/step on both rungs (bf16 57.2 vs 56.0,
# fp32 80.6 vs 79.5) — XLA overlaps the two small planes with conv
# scheduling better than one double-batch plane plus its concatenates —
# so two calls stay the default and stacking is the measured opt-in.
_STACK_ATLAS_PLANES = os.environ.get("OBMAN_STACK_ATLAS", "0") == "1"


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def compute_mano_loss(
    preds: Dict,
    batch: Dict,
    cfg: ManoConfig,
    has_verts3d: bool,
    has_joints3d: bool,
    has_pcas: bool,
) -> Tuple[jnp.ndarray, Dict]:
    """ManoLoss.compute_loss equivalent (reference: manobranch.py:251-324)."""
    total = jnp.zeros((), jnp.float32)
    losses = {}
    if has_verts3d and cfg.lambda_verts:
        v_loss = mse(preds["verts"], batch["verts3d"])
        total = total + cfg.lambda_verts * v_loss
        losses["mano_verts3d"] = v_loss
    if has_joints3d and cfg.lambda_joints3d:
        j_loss = mse(preds["joints"], batch["joints3d"])
        total = total + cfg.lambda_joints3d * j_loss
        losses["mano_joints3d"] = j_loss
    if cfg.lambda_shape and preds.get("shape") is not None:
        s_loss = mse(preds["shape"], jnp.zeros_like(preds["shape"]))
        total = total + cfg.lambda_shape * s_loss
        losses["mano_shape"] = s_loss
    if cfg.lambda_pose_reg:
        p_loss = mse(preds["pose"][:, 3:], jnp.zeros_like(preds["pose"][:, 3:]))
        total = total + cfg.lambda_pose_reg * p_loss
        losses["pose_reg"] = p_loss
    if has_pcas and cfg.lambda_pca:
        pca_loss = mse(preds["pose"], batch["hand_pcas"])
        total = total + cfg.lambda_pca * pca_loss
        losses["mano_pca"] = pca_loss
    losses["mano_total_loss"] = total
    return total, losses


def compute_atlas_loss(
    preds: Dict,
    batch: Dict,
    cfg: AtlasConfig,
    has_objpoints3d: bool,
    has_center3d: bool,
    obj_faces,                      # static (F, 3) int array or None
    laplacian: Optional[jnp.ndarray],  # dense (V, V) or None
    regul_scale=1.0,
    geometry_dtype: str = "float32",
) -> Tuple[jnp.ndarray, Dict]:
    """AtlasLoss.compute_loss equivalent (reference: atlasbranch.py:199-287).

    ``regul_scale`` is a (possibly traced) multiplier on the edge/Laplacian
    regularizer weights implementing the reference's per-epoch regul decay
    (decay_regul, handnet.py:188-196) without recompilation: gating stays
    static on the config weights, the decay factor is dynamic.

    ``geometry_dtype`` != float32 selects chamfer neighbors on a
    low-precision plane and recomputes the min values exactly in f32
    (the --geometry_dtype rung, ops/chamfer.py).
    """
    plane_dtype = plane_dtype_for(geometry_dtype)
    edge_regul_lambda = cfg.lambda_regul_edges
    lambda_laplacian = cfg.lambda_laplacian

    losses: Dict = {}
    run_main = has_objpoints3d and (cfg.lambda_atlas or cfg.final_lambda_atlas)
    run_trans_only = has_center3d and cfg.trans_weight
    if not (run_main or run_trans_only):
        return jnp.zeros((), jnp.float32), losses

    final = jnp.zeros((), jnp.float32)
    sym_loss = None
    obj_mesh = None
    if (
        "objtrans" in preds
        and has_objpoints3d
        and "objpointscentered3d" in preds
    ):
        target = batch["objpoints3d"]
        centroids = jnp.mean(target, axis=1)  # (B, 3)
        trans_loss = mse(preds["objtrans"], centroids)
        losses["atlas_trans3d"] = trans_loss
        centered = target - centroids[:, None, :]
        scale_loss = jnp.zeros(())
        if "objscale" in preds:
            scales_gt = jnp.max(
                jnp.sqrt(jnp.sum(centered**2, axis=2) + 1e-16), axis=1
            )
            scale_loss = mse(preds["objscale"], scales_gt[:, None])
            losses["atlas_scale3d"] = scale_loss
        if _STACK_ATLAS_PLANES:
            # One (2B, N, M) plane for the centered+final pair; slicing the
            # per-example means back out reproduces the two-call values
            # bit-for-bit (each example's contraction is independent).
            B = target.shape[0]
            l1, l2 = chamfer_loss(
                jnp.concatenate(
                    [preds["objpointscentered3d"], preds["objpoints3d"]]
                ),
                jnp.concatenate([centered, target]),
                plane_dtype=plane_dtype,
            )
            sym_loss = jnp.mean(l1[:B] + l2[:B])
            sym_final = jnp.mean(l1[B:] + l2[B:])
        else:
            l1, l2 = chamfer_loss(preds["objpointscentered3d"], centered,
                                  plane_dtype=plane_dtype)
            sym_loss = jnp.mean(l1 + l2)
            f1, f2 = chamfer_loss(preds["objpoints3d"], target,
                                  plane_dtype=plane_dtype)
            sym_final = jnp.mean(f1 + f2)
        obj_mesh = preds["objpointscentered3d"]
        losses["final_chamfer_loss"] = sym_final
        final = (
            (cfg.lambda_atlas or 0.0) * sym_loss
            + (cfg.final_lambda_atlas or 0.0) * sym_final
            + cfg.trans_weight * trans_loss
            + cfg.scale_weight * scale_loss
        )
    elif has_objpoints3d and cfg.lambda_atlas:
        l1, l2 = chamfer_loss(preds["objpoints3d"], batch["objpoints3d"],
                              plane_dtype=plane_dtype)
        sym_loss = jnp.mean(l1 + l2)
        final = cfg.lambda_atlas * sym_loss
        obj_mesh = preds["objpoints3d"]

    if obj_mesh is not None and edge_regul_lambda and obj_faces is not None:
        e_loss = edge_loss(obj_mesh, obj_faces)
        losses["atlas_edge_regul"] = e_loss
        final = final + edge_regul_lambda * regul_scale * e_loss
    if obj_mesh is not None and lambda_laplacian and laplacian is not None:
        l_loss = laplacian_loss(obj_mesh, laplacian)
        losses["atlas_laplac"] = l_loss
        final = final + lambda_laplacian * regul_scale * l_loss

    if sym_loss is not None:
        losses["atlas_objpoints3d"] = sym_loss
    return final, losses
