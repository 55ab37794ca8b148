"""Device-fused image preprocessing (the streaming/demo fast path).

The reference preprocesses frames on the host: center-crop to square, resize
to 256, BGR->RGB, flip, x/255 - 0.5 (mano_train/demo/preprocess.py:8-39),
plus PIL affine crops in the training pipeline.  Here the same operations are
expressed as batched XLA ops so a raw uint8 frame goes straight to the
device and preprocessing fuses into the model's first convolution — this is
what makes the >1k fps streaming path possible (one host->device copy of
uint8 data, everything else on-chip).

``affine_warp`` mirrors data/transforms.transform_img (inverse-mapped
bilinear sampling) for on-device augmentation with per-sample matrices.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B, H, W, 3) -> float32, x/255 - 0.5 (preprocess.py:30-38)."""
    return frames.astype(jnp.float32) / 255.0 - 0.5


def bgr_to_rgb(frames: jnp.ndarray) -> jnp.ndarray:
    return frames[..., ::-1]


def flip_horizontal(frames: jnp.ndarray, flip: jnp.ndarray) -> jnp.ndarray:
    """Conditionally mirror each frame; ``flip`` is a (B,) bool mask."""
    flipped = frames[:, :, ::-1]
    return jnp.where(flip[:, None, None, None], flipped, frames)


def center_crop_square(frames: jnp.ndarray) -> jnp.ndarray:
    """Crop the central square (preprocess_frame, preprocess.py:8-17)."""
    H, W = frames.shape[1:3]
    s = min(H, W)
    top = (H - s) // 2
    left = (W - s) // 2
    return frames[:, top : top + s, left : left + s]


def resize_bilinear(frames: jnp.ndarray, size: int) -> jnp.ndarray:
    """Resize square frames to (size, size) with bilinear interpolation."""
    import jax

    B, H, W, C = frames.shape
    return jax.image.resize(
        frames.astype(jnp.float32), (B, size, size, C), method="bilinear"
    )


def preprocess_frames(
    frames: jnp.ndarray,
    size: int = 256,
    flip: jnp.ndarray | None = None,
    bgr: bool = False,
) -> jnp.ndarray:
    """Full demo preprocessing chain, fused on device:
    [BGR->RGB] -> center square crop -> resize -> [flip] -> normalize."""
    if bgr:
        frames = bgr_to_rgb(frames)
    frames = center_crop_square(frames)
    frames = resize_bilinear(frames, size)
    if flip is not None:
        frames = flip_horizontal(frames, flip)
    return frames / 255.0 - 0.5


# ---------------------------------------------------------------------------
# Device-side photometric augmentation (color jitter in-graph).
# Mirrors data/transforms.py adjust_* semantics on [0, 1] images; factors are
# drawn on the host per sample, the op order is drawn per batch (the
# reference shuffles per sample, imgtrans.py:48 — a per-batch order keeps the
# in-graph cost at 1x instead of 24 branches per sample).
# ---------------------------------------------------------------------------


def _rgb_to_gray(img):
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]


def adjust_brightness_batch(img, factor):
    return jnp.clip(img * factor[:, None, None, None], 0.0, 1.0)


def adjust_contrast_batch(img, factor):
    mean = jnp.mean(_rgb_to_gray(img), axis=(1, 2, 3), keepdims=True)
    f = factor[:, None, None, None]
    return jnp.clip(f * img + (1 - f) * mean, 0.0, 1.0)


def adjust_saturation_batch(img, factor):
    gray = _rgb_to_gray(img)
    f = factor[:, None, None, None]
    return jnp.clip(f * img + (1 - f) * gray, 0.0, 1.0)


def adjust_hue_batch(img, factor):
    """Hue shift by ``factor`` turns, vectorized HSV roundtrip."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = (h + factor[:, None, None]) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r_out = jnp.select([i == k for k in range(6)], [v, q, p, p, t, v])
    g_out = jnp.select([i == k for k in range(6)], [t, v, v, q, p, p])
    b_out = jnp.select([i == k for k in range(6)], [p, p, t, v, v, q])
    return jnp.clip(jnp.stack([r_out, g_out, b_out], axis=-1), 0.0, 1.0)


_JITTER_OPS = (
    adjust_brightness_batch,   # factor column 0
    adjust_saturation_batch,   # column 1
    adjust_hue_batch,          # column 2
    adjust_contrast_batch,     # column 3
)


def batched_color_jitter(
    images: jnp.ndarray, factors: jnp.ndarray, order_idx: jnp.ndarray
) -> jnp.ndarray:
    """Apply the 4 jitter ops in one of the 24 permutations.

    Args:
      images: (B, H, W, 3) in [0, 1].
      factors: (B, 4) per-sample [brightness, saturation, hue, contrast]
        factors (neutral = [1, 1, 0, 1]).
      order_idx: scalar int32 in [0, 24) selecting the batch's op order.
    """
    import itertools

    perms = list(itertools.permutations(range(4)))

    def make_branch(perm):
        def branch(img):
            for op_i in perm:
                img = _JITTER_OPS[op_i](img, factors[:, op_i])
            return img
        return branch

    import jax

    return jax.lax.switch(
        order_idx, [make_branch(p) for p in perms], images
    )


def affine_warp(
    images: jnp.ndarray,
    affine: jnp.ndarray,
    out_size: int,
) -> jnp.ndarray:
    """Batched inverse-mapped bilinear affine warp.

    Args:
      images: (B, H, W, C) float.
      affine: (B, 3, 3) forward transforms (original -> crop pixels), same
        convention as data/transforms.get_affine_transform.
      out_size: output height == width.
    Returns (B, out_size, out_size, C); out-of-bounds samples are 0.
    """
    B, H, W, C = images.shape
    inv = jnp.linalg.inv(affine)  # (B, 3, 3)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_size, dtype=jnp.float32),
        jnp.arange(out_size, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    grid = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # (P, 3)
    src = jnp.einsum("bij,pj->bpi", inv, grid)  # (B, P, 3)
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = images.reshape(B, H * W, C)
        idx = yi_c * W + xi_c  # (B, P)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None]

    out = (
        gather(y0, x0) * (1 - wx) * (1 - wy)
        + gather(y0, x0 + 1) * wx * (1 - wy)
        + gather(y0 + 1, x0) * (1 - wx) * wy
        + gather(y0 + 1, x0 + 1) * wx * wy
    )
    return out.reshape(B, out_size, out_size, C)
