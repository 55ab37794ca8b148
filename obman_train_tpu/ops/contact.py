"""Hand-object contact (attraction) and collision (repulsion) losses.

Reproduces ``compute_contact_loss`` (reference:
mano_train/networks/branches/contactloss.py:149-308) with static shapes:

- pairwise squared distances between 778 hand verts and the object points;
- inside/outside via the ray-parity test (both inputs stop-gradiented, as
  the reference detaches them, contactloss.py:170-172);
- attraction on exterior hand verts close to the object, repulsion on
  penetrating verts, with value modes ``dist_sq | dist | dist_tanh`` and
  gradient-target modes ``all | obj | hand`` via selective stop_gradient;
- zone filters ``all | tips | zones`` — the reference's per-zone
  "keep the closest vertex" python loop (contactloss.py:262-274) becomes a
  fixed-shape masked argmin + one-hot scatter.

All thresholds are in the reference's units: verts are in millimetres;
``dist_sq`` mode compares squared mm against thresh^2.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from obman_train_tpu.assets.contact_zones import tips_mask, zone_masks
from obman_train_tpu.ops.chamfer import (
    batch_pairwise_sqdist,
    chamfer_min_sqdist,
    plane_dtype_for,
)
from obman_train_tpu.ops.inside import batch_mesh_contains_points


# Nearest-object-point selection as a one-hot MXU matmul instead of
# gather + (under AD) scatter-add.  The round-5 step-budget trace
# (tools/step_budget.py, step_budget.json) showed the contact op's
# take_along_axis costing 1.3 ms forward plus a 2.9 ms serialized
# scatter-add in the backward (the gather's AD transpose) — together the
# single largest geometry sink in the bf16 train step.  The one-hot form
# computes results_close = onehot(argmin) @ obj_verts: products are
# value*1 (exact), each output row has exactly one nonzero term, so
# forward values are bit-identical, and the backward is the transposed
# matmul — dense MXU work, no scatter.  Default decided by the in-context
# A/B (tools/fusion_ab.py, fusion_ab.json).
_ONEHOT_GATHER = os.environ.get("OBMAN_ONEHOT_GATHER", "1") == "1"


def _select_closest(obj_verts: jnp.ndarray, idxs: jnp.ndarray) -> jnp.ndarray:
    """(B, H, 3) nearest object point per hand vert, differentiable w.r.t.
    ``obj_verts`` (the selection indices are constants under AD)."""
    if not _ONEHOT_GATHER:
        return jnp.take_along_axis(obj_verts, idxs[..., None], axis=1)
    onehot = (
        idxs[..., None]
        == jnp.arange(obj_verts.shape[1], dtype=idxs.dtype)[None, None, :]
    )
    oh = jax.lax.stop_gradient(onehot).astype(obj_verts.dtype)
    # One-hot rows are exact in bf16 (0/1); HIGHEST on the rhs keeps f32
    # coordinates exactly reconstructed through the bf16-pass MXU matmul
    # (each output element is a single 1*v product).
    return jnp.einsum(
        "bhm,bmd->bhd", oh, obj_verts,
        precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST),
    )


def thres_loss(vals: jnp.ndarray, thres: float = 25.0) -> jnp.ndarray:
    """Mean of values below a threshold (reference: contactloss.py:82-89)."""
    return masked_mean_loss(vals, vals < thres)


def compute_naive_contact_loss(
    points_1: jnp.ndarray, points_2: jnp.ndarray, contact_threshold: float = 25.0
) -> jnp.ndarray:
    """Symmetric thresholded nearest-neighbor loss
    (reference: contactloss.py:92-99)."""
    dists = batch_pairwise_sqdist(points_1, points_2)
    mins12 = jnp.min(dists, axis=1)
    mins21 = jnp.min(dists, axis=2)
    loss_1 = thres_loss(mins12, contact_threshold)
    loss_2 = thres_loss(mins21, contact_threshold)
    return jnp.mean((loss_1 + loss_2) / 2)


def masked_mean_loss(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``vals`` over ``mask``; 0 when the mask is empty
    (reference: contactloss.py:50-57)."""
    mask = mask.astype(vals.dtype)
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(vals * mask) / jnp.maximum(denom, 1.0), 0.0)


def _target_diff(results_close, hand_verts, contact_target: str):
    if contact_target == "all":
        return results_close - hand_verts
    if contact_target == "obj":
        return results_close - jax.lax.stop_gradient(hand_verts)
    if contact_target == "hand":
        return jax.lax.stop_gradient(results_close) - hand_verts
    raise ValueError(f"contact_target {contact_target} not in [all|obj|hand]")


def _mode_vals(diff, anchor_dists, mode: str, thresh: float):
    if mode == "dist_sq":
        return jnp.sum(diff**2, axis=2)
    if mode == "dist":
        return anchor_dists
    if mode == "dist_tanh":
        return thresh * jnp.tanh(anchor_dists / thresh)
    raise ValueError(f"mode {mode} not in [dist_sq|dist|dist_tanh]")


@partial(
    jax.jit,
    static_argnames=(
        "contact_thresh",
        "contact_mode",
        "collision_thresh",
        "collision_mode",
        "contact_target",
        "contact_sym",
        "contact_zones",
        "geometry_dtype",
    ),
)
def compute_contact_loss(
    hand_verts: jnp.ndarray,
    obj_verts: jnp.ndarray,
    obj_faces: jnp.ndarray,
    contact_thresh: float = 25.0,
    contact_mode: str = "dist_sq",
    collision_thresh: float = 25.0,
    collision_mode: str = "dist_sq",
    contact_target: str = "all",
    contact_sym: bool = False,
    contact_zones: str = "all",
    geometry_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict, Dict]:
    """Attraction + repulsion losses between a hand and an object mesh.

    Args:
      hand_verts: (B, 778, 3) in mm.
      obj_verts:  (B, V_o, 3) in mm.
      obj_faces:  (F_o, 3) int32 (static).
    Returns:
      (attraction_loss, penetration_loss, contact_info, metrics) — matching
      the reference's outputs (contactloss.py:283-308).
    """
    # Nearest-neighbor mins/argmins (reference builds the full matrix,
    # contactloss.py:164-166; here XLA fuses the small per-example plane,
    # with Pallas auto-dispatch for large clouds inside chamfer_min_sqdist).
    # geometry_dtype != float32 selects neighbors on a low-precision plane
    # and recomputes the min values exactly in f32 (--geometry_dtype rung).
    plane_dtype = plane_dtype_for(geometry_dtype)
    mins21, min21idxs, mins12, _ = chamfer_min_sqdist(
        hand_verts, obj_verts, plane_dtype=plane_dtype
    )

    obj_triangles = obj_verts[:, obj_faces]  # (B, F, 3, 3)
    if jax.default_backend() == "tpu":
        # Pallas kernel: ~8.4x vs the XLA path at the reference contact
        # config (B=256, 778 verts x 1280 tris; warmed sustained v5e
        # timing, 31.2 -> 3.7 ms — the XLA path materializes the (B, P, T)
        # interaction in HBM), exact agreement (ops/pallas/raytri_kernel.py).
        from obman_train_tpu.ops.pallas.raytri_kernel import (
            pallas_mesh_contains_points,
        )

        contains = pallas_mesh_contains_points
    else:
        contains = batch_mesh_contains_points
    exterior = contains(
        jax.lax.stop_gradient(hand_verts), jax.lax.stop_gradient(obj_triangles)
    )
    penetr_mask = ~exterior

    results_close = _select_closest(obj_verts, min21idxs)  # (B, H, 3)

    diff = _target_diff(results_close, hand_verts, contact_target)
    anchor_dists = jnp.sqrt(jnp.sum(diff**2, axis=2) + 1e-16)

    contact_vals = _mode_vals(diff, anchor_dists, contact_mode, contact_thresh)
    if contact_mode == "dist_sq":
        below_dist = mins21 < contact_thresh**2
    elif contact_mode == "dist":
        below_dist = mins21 < contact_thresh
    else:  # dist_tanh takes all points into account
        below_dist = jnp.ones_like(mins21, dtype=bool)

    collision_vals = _mode_vals(diff, anchor_dists, collision_mode, collision_thresh)

    missed_mask = below_dist & exterior
    if contact_zones == "tips":
        missed_mask = missed_mask & jnp.asarray(tips_mask())[None, :]
    elif contact_zones == "zones":
        zmasks = jnp.asarray(zone_masks())  # (Z, H) bool
        # Per zone: index of the hand vert (within the zone) closest to the
        # object; build a one-hot (B, H) membership of those winners.
        masked = jnp.where(
            zmasks[None, :, :], mins21[:, None, :], jnp.inf
        )  # (B, Z, H)
        win = jnp.argmin(masked, axis=2)  # (B, Z)
        matching = jnp.zeros(mins21.shape, dtype=bool)
        matching = matching.at[
            jnp.arange(mins21.shape[0])[:, None], win
        ].set(True)
        missed_mask = missed_mask & matching
    elif contact_zones != "all":
        raise ValueError(f"contact_zones {contact_zones} not in [tips|zones|all]")

    missed_loss = masked_mean_loss(contact_vals, missed_mask)
    penetr_loss = masked_mean_loss(collision_vals, penetr_mask)
    if contact_sym:
        obj2hand = jnp.sqrt(jnp.maximum(mins12, 0.0))
        sym_below = mins12 < contact_thresh
        missed_loss = missed_loss + masked_mean_loss(obj2hand, sym_below)

    anchor_sg = jax.lax.stop_gradient(anchor_dists)
    pmask = penetr_mask.astype(anchor_sg.dtype)
    max_penetr_depth = jnp.mean(jnp.max(anchor_sg * pmask, axis=1))
    mean_penetr_depth = jnp.mean(jnp.mean(anchor_sg * pmask, axis=1))

    contact_info = {
        "attraction_masks": missed_mask,
        "repulsion_masks": penetr_mask,
        "contact_points": results_close,
        "min_dists": mins21,
    }
    metrics = {"max_penetr": max_penetr_depth, "mean_penetr": mean_penetr_depth}
    return missed_loss, penetr_loss, contact_info, metrics
