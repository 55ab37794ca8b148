"""Mesh regularizers and contact-IoU metric.

TPU notes: the edge loss is a pure gather + VPU reduction; the Laplacian
loss is a single small on-device matmul against the precomputed dense
cotangent Laplacian (see assets/laplacian.py — this replaces the reference's
scipy-sparse CPU roundtrip, laplacianloss.py:92-135, and its hand-written
backward with plain AD since L is symmetric).
"""

from __future__ import annotations

import jax.numpy as jnp


def edge_loss(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Edge-length variance regularizer (reference: atlasbranch.py:153-167).

    Mean absolute deviation of squared edge lengths from their per-example
    mean, over all 3F face edges.

    Args:
      verts: (B, V, 3); faces: (F, 3) int.
    """
    va = verts[:, faces[:, 0]]
    vb = verts[:, faces[:, 1]]
    vc = verts[:, faces[:, 2]]
    e_a = jnp.sum((vb - va) ** 2, axis=2)
    e_b = jnp.sum((vc - vb) ** 2, axis=2)
    e_c = jnp.sum((va - vc) ** 2, axis=2)
    all_edges = jnp.concatenate([e_c, e_b, e_a], axis=1)  # (B, 3F)
    mean_edge = jnp.mean(all_edges, axis=1, keepdims=True)
    return jnp.mean(jnp.abs(all_edges - mean_edge))


def laplacian_loss(verts: jnp.ndarray, laplacian: jnp.ndarray) -> jnp.ndarray:
    """Mean curvature regularizer (reference: laplacianloss.py:36-41).

    ``mean_i ||(L @ verts)_i||_2`` over all batch-stacked vertices.

    Args:
      verts: (B, V, 3); laplacian: dense (V, V) from cotangent_laplacian.
    """
    lx = jnp.einsum("vw,bwd->bvd", laplacian, verts)
    norms = jnp.sqrt(jnp.sum(lx * lx, axis=-1) + 1e-12)
    return jnp.mean(norms)


def thresh_iou(gt_dists: jnp.ndarray, pred_dists: jnp.ndarray, thresh) -> jnp.ndarray:
    """Contact IoU at one threshold (reference: contactloss.py:22-32).

    Note: the reference feeds *squared* mm distances against mm thresholds;
    we reproduce that behaviour exactly for parity.
    """
    gt_c = gt_dists <= thresh
    pred_c = pred_dists <= thresh
    inter = jnp.sum((gt_c & pred_c).astype(jnp.float32), axis=1)
    union = jnp.sum((gt_c | pred_c).astype(jnp.float32), axis=1)
    return jnp.where(union != 0, inter / jnp.maximum(union, 1.0), 0.0)


def meshiou(
    gt_dists: jnp.ndarray,
    pred_dists: jnp.ndarray,
    threshs=tuple(range(1, 11)),
):
    """Contact IoU curve + AUC (reference: contactloss.py:35-47).

    Returns ``(batch_ious (num_threshs,), iou_auc scalar)`` where batch_ious
    is the per-threshold batch mean and the AUC is the trapezoid integral
    over thresholds averaged across the batch.
    """
    ious = jnp.stack(
        [thresh_iou(gt_dists, pred_dists, t) for t in threshs], axis=0
    )  # (T, B)
    xs = jnp.asarray(threshs, dtype=ious.dtype)
    auc_per_example = jnp.trapezoid(ious, x=xs, axis=0)
    return jnp.mean(ious, axis=1), jnp.mean(auc_per_example)
