"""Differentiable MANO hand layer, TPU-native.

Re-implements the external ``manopth.ManoLayer`` used by the reference
(mano_train/networks/branches/manobranch.py:92-105, called at :169-182) as a
single fused XLA program: PCA pose basis matmul, quaternion Rodrigues,
shape/pose blendshapes, 16-joint kinematic chain, linear blend skinning of
778 vertices, 21-joint regression with fingertip vertices, optional
root-palm recentering, center-joint recentering, and the final x1000
metres->millimetres scaling (dataset GT is in mm,
handobjectdatasets/obman.py:408,413).

Everything is batch-first with static shapes; the 16-step kinematic chain is
a Python-unrolled loop (static tree) which XLA schedules as a handful of
tiny fused ops — the heavy work (blendshape and skinning einsums) lands on
the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Full f32 accumulation: MANO parity to 1e-4 mm requires it (default TPU
# matmul precision is bf16-class). These einsums are tiny.
_HIGHEST = jax.lax.Precision.HIGHEST

from obman_train_tpu.assets.mano_assets import (
    JOINT_REORDER,
    ManoAssets,
    PALM_VERT_IDS,
    TIPS,
)
from obman_train_tpu.ops.rotations import rodrigues


class ManoParams(NamedTuple):
    """Constant MANO tables as device arrays (one side)."""

    v_template: jnp.ndarray        # (778, 3)
    shapedirs: jnp.ndarray         # (778, 3, 10)
    posedirs: jnp.ndarray          # (778, 3, 135)
    J_regressor: jnp.ndarray       # (16, 778)
    weights: jnp.ndarray           # (778, 16)
    hands_components: jnp.ndarray  # (45, 45)
    hands_mean: jnp.ndarray        # (45,)


def mano_params_from_assets(assets: ManoAssets, dtype=jnp.float32) -> ManoParams:
    return ManoParams(
        v_template=jnp.asarray(assets.v_template, dtype),
        shapedirs=jnp.asarray(assets.shapedirs, dtype),
        posedirs=jnp.asarray(assets.posedirs, dtype),
        J_regressor=jnp.asarray(assets.J_regressor, dtype),
        weights=jnp.asarray(assets.weights, dtype),
        hands_components=jnp.asarray(assets.hands_components, dtype),
        hands_mean=jnp.asarray(assets.hands_mean, dtype),
    )


# MANO kinematic tree (static python ints so the chain unrolls at trace time).
_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)


def _pose_to_rotmats(
    pose: jnp.ndarray, params: ManoParams, use_pca: bool, ncomps: int
) -> jnp.ndarray:
    """(B, ncomps+3) PCA/axis-angle or (B, 16, 3, 3) rotmats -> (B, 16, 3, 3)."""
    if pose.ndim == 4:  # rotation-matrix mode (reference manobranch.py:126-128)
        return pose
    root = pose[:, :3]
    if use_pca:
        hand = jnp.matmul(
            pose[:, 3 : 3 + ncomps],
            params.hands_components[:ncomps],
            precision=_HIGHEST,
        )
    else:
        hand = pose[:, 3:48]
    full = params.hands_mean + hand  # (B, 45)
    aa = jnp.concatenate([root, full], axis=1).reshape(-1, 16, 3)
    return rodrigues(aa)


def mano_forward(
    params: ManoParams,
    pose: jnp.ndarray,
    betas: Optional[jnp.ndarray] = None,
    trans: Optional[jnp.ndarray] = None,
    *,
    use_pca: bool = True,
    ncomps: int = 6,
    center_idx: Optional[int] = 9,
    root_palm: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MANO kinematics for one hand side.

    Args:
      pose: (B, ncomps+3) PCA coefficients prefixed with 3 global axis-angle
        params (use_pca=True), (B, 48) raw axis-angle (use_pca=False), or
        (B, 16, 3, 3) rotation matrices.
      betas: (B, 10) shape coefficients or None (zeros).
      trans: (B, 3) translation or None; when None the output is recentered
        on joint ``center_idx`` (manopth semantics: trans and centering are
        mutually exclusive).
    Returns:
      (verts (B, 778, 3), joints (B, 21, 3)) in millimetres.
    """
    rots = _pose_to_rotmats(pose, params, use_pca, ncomps)  # (B, 16, 3, 3)
    B = rots.shape[0]
    dtype = rots.dtype

    if betas is None:
        v_shaped = jnp.broadcast_to(params.v_template, (B, 778, 3))
    else:
        v_shaped = params.v_template + jnp.einsum(
            "vds,bs->bvd", params.shapedirs, betas, precision=_HIGHEST
        )
    joints_rest = jnp.einsum(
        "jv,bvd->bjd", params.J_regressor, v_shaped, precision=_HIGHEST
    )  # (B, 16, 3)

    eye = jnp.eye(3, dtype=dtype)
    pose_feat = (rots[:, 1:] - eye).reshape(B, 135)
    v_posed = v_shaped + jnp.einsum("vdp,bp->bvd", params.posedirs, pose_feat, precision=_HIGHEST)

    # Kinematic chain: world transform per joint, unrolled over the static tree.
    def make_T(rot, t):
        T = jnp.zeros((B, 4, 4), dtype=dtype)
        T = T.at[:, :3, :3].set(rot)
        T = T.at[:, :3, 3].set(t)
        T = T.at[:, 3, 3].set(1.0)
        return T

    transforms = [make_T(rots[:, 0], joints_rest[:, 0])]
    for j in range(1, 16):
        p = _PARENTS[j]
        local = make_T(rots[:, j], joints_rest[:, j] - joints_rest[:, p])
        transforms.append(jnp.einsum("bij,bjk->bik", transforms[p], local, precision=_HIGHEST))
    G = jnp.stack(transforms, axis=1)  # (B, 16, 4, 4)

    joints_posed = G[:, :, :3, 3]  # (B, 16, 3)

    # Remove the rest-pose reference from each joint transform so skinning
    # maps rest vertices directly (standard SMPL/MANO "A = G - pack(G R J)").
    corr = jnp.einsum("bjik,bjk->bji", G[:, :, :3, :3], joints_rest, precision=_HIGHEST)  # (B,16,3)
    A = G.at[:, :, :3, 3].add(-corr)

    T = jnp.einsum("vj,bjik->bvik", params.weights, A, precision=_HIGHEST)  # (B, 778, 4, 4)
    verts = (
        jnp.einsum("bvij,bvj->bvi", T[:, :, :3, :3], v_posed, precision=_HIGHEST) + T[:, :, :3, 3]
    )

    tips = verts[:, np.asarray(TIPS)]
    joints = jnp.concatenate([joints_posed, tips], axis=1)[
        :, np.asarray(JOINT_REORDER)
    ]  # (B, 21, 3)

    if root_palm:
        palm = (verts[:, PALM_VERT_IDS[0]] + verts[:, PALM_VERT_IDS[1]]) / 2.0
        joints = joints.at[:, 0].set(palm)

    if trans is not None:
        verts = verts + trans[:, None, :]
        joints = joints + trans[:, None, :]
    elif center_idx is not None:
        center = joints[:, center_idx : center_idx + 1]
        verts = verts - center
        joints = joints - center

    # millimetres, matching manopth / the dataset GT convention.
    return verts * 1000.0, joints * 1000.0
