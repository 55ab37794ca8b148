"""Rotation utilities (axis-angle <-> rotation matrices).

The reference's MANO kinematics come from the external manopth package,
which converts axis-angle pose parameters to rotation matrices via a
quaternion intermediate.  We use the same quaternion formulation: it is
smooth at the origin (no 0/0 from sin(theta)/theta) which matters because
the pose parameters are learned and pass through zero.

All functions are jit/vmap-friendly with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def rodrigues(axisang: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Quaternion-based exponential map: q = (cos(t/2), sin(t/2) * axis).
    Exactly equals the classic Rodrigues formula but with well-defined
    gradients at ||axisang|| = 0.
    """
    angle = jnp.sqrt(jnp.sum(axisang * axisang, axis=-1) + 1e-16)
    half = angle * 0.5
    # sin(t/2)/t — bounded, smooth; 1e-16 under the sqrt keeps t > 0.
    sinc_half = jnp.sin(half) / angle
    qw = jnp.cos(half)
    qxyz = axisang * sinc_half[..., None]
    qx, qy, qz = qxyz[..., 0], qxyz[..., 1], qxyz[..., 2]

    w2, x2, y2, z2 = qw * qw, qx * qx, qy * qy, qz * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz

    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * (xy - wz), 2 * (wy + xz),
            2 * (wz + xy), w2 - x2 + y2 - z2, 2 * (yz - wx),
            2 * (xz - wy), 2 * (wx + yz), w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(axisang.shape[:-1] + (3, 3))


def rotmat_to_axis_angle(rot: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3)."""
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    angle = jnp.arccos(cos)
    axis = jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(angle)
    scale = angle / jnp.maximum(2.0 * sin, eps)
    return axis * scale[..., None]
