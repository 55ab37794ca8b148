"""Activation attention maps for the demos.

Equivalent of the reference AttentionHook (mano_train/demo/attention.py:
13-57): mean squared activations of each ResNet stage, bilinearly resized to
the frame, multiplied together, colormapped and blended over the frame.  The
reference registers forward hooks and ships a hard-coded 768-entry jet LUT
(:59-847); here the encoder already returns its stage intermediates
(ResNet(..., return_inter=True)) and the colormap comes from matplotlib.
"""

from __future__ import annotations

from typing import List

import numpy as np


def stage_attention(inters: List[np.ndarray], frame_hw) -> np.ndarray:
    """Per-stage mean-squared activation maps -> product map in [0, 1].

    Args:
      inters: list of (B, h, w, C) stage activations (NHWC).
      frame_hw: (H, W) of the target frame.
    Returns (B, H, W) float map normalized per sample.
    """
    import jax
    import jax.numpy as jnp

    H, W = frame_hw
    prod = None
    for act in inters:
        act = jnp.asarray(act)
        amap = jnp.mean(act**2, axis=-1)  # (B, h, w)
        amap = jax.image.resize(
            amap, (amap.shape[0], H, W), method="bilinear"
        )
        prod = amap if prod is None else prod * amap
    prod = np.asarray(prod)
    mins = prod.min(axis=(1, 2), keepdims=True)
    maxs = prod.max(axis=(1, 2), keepdims=True)
    return (prod - mins) / np.maximum(maxs - mins, 1e-12)


def attention_overlay(
    frame: np.ndarray, attention: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Blend a jet-colormapped attention map over a uint8 RGB frame."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import cm

        heat = (cm.jet(attention)[:, :, :3] * 255).astype(np.uint8)
    except Exception:  # matplotlib-free fallback: red channel heat
        heat = np.stack(
            [
                (attention * 255).astype(np.uint8),
                np.zeros_like(attention, np.uint8),
                ((1 - attention) * 255).astype(np.uint8),
            ],
            axis=-1,
        )
    return (alpha * heat + (1 - alpha) * frame).astype(np.uint8)
