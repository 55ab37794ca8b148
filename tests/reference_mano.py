"""Independent numpy MANO implementation used as a golden reference.

Written from the SMPL/MANO papers' math (axis-angle Rodrigues, shape/pose
blendshapes, kinematic chain, LBS), deliberately structured differently from
the JAX layer (per-sample loops, explicit 4x4 matrices, classic Rodrigues
formula instead of quaternions) so agreement is meaningful.
"""

import numpy as np

PARENTS = [-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14]
TIPS = [745, 317, 444, 556, 673]
REORDER = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]


def rodrigues_np(r):
    """Classic Rodrigues formula for a single 3-vector."""
    theta = np.linalg.norm(r)
    if theta < 1e-10:
        return np.eye(3)
    k = r / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], dtype=np.float64
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def mano_np(
    assets,
    pose,
    betas=None,
    trans=None,
    use_pca=True,
    ncomps=6,
    center_idx=9,
    root_palm=False,
):
    """Single- or batched-sample numpy MANO. pose: (B, ncomps+3) or (B,16,3,3)."""
    pose = np.asarray(pose, np.float64)
    B = pose.shape[0]
    all_verts, all_joints = [], []
    for b in range(B):
        if pose.ndim == 4:
            rots = pose[b]
        else:
            if use_pca:
                hand = pose[b, 3 : 3 + ncomps] @ assets.hands_components[:ncomps]
            else:
                hand = pose[b, 3:48]
            full = np.concatenate(
                [pose[b, :3], assets.hands_mean + hand]
            ).reshape(16, 3)
            rots = np.stack([rodrigues_np(full[j]) for j in range(16)])

        beta = np.zeros(10) if betas is None else np.asarray(betas[b], np.float64)
        v_shaped = assets.v_template + assets.shapedirs @ beta
        J = assets.J_regressor @ v_shaped  # (16, 3)

        pose_feat = (rots[1:] - np.eye(3)).reshape(135)
        v_posed = v_shaped + assets.posedirs @ pose_feat

        G = [None] * 16
        for j in range(16):
            T = np.eye(4)
            T[:3, :3] = rots[j]
            if PARENTS[j] < 0:
                T[:3, 3] = J[j]
                G[j] = T
            else:
                T[:3, 3] = J[j] - J[PARENTS[j]]
                G[j] = G[PARENTS[j]] @ T
        joints16 = np.stack([G[j][:3, 3] for j in range(16)])

        verts = np.zeros((778, 3))
        for v in range(778):
            T = np.zeros((4, 4))
            for j in range(16):
                w = assets.weights[v, j]
                if w == 0:
                    continue
                A = G[j].copy()
                A[:3, 3] -= A[:3, :3] @ J[j]
                T += w * A
            verts[v] = T[:3, :3] @ v_posed[v] + T[:3, 3]

        joints = np.concatenate([joints16, verts[TIPS]], axis=0)[REORDER]
        if root_palm:
            joints[0] = (verts[95] + verts[218]) / 2
        if trans is not None:
            verts = verts + trans[b]
            joints = joints + trans[b]
        elif center_idx is not None:
            c = joints[center_idx].copy()
            verts = verts - c
            joints = joints - c
        all_verts.append(verts * 1000.0)
        all_joints.append(joints * 1000.0)
    return np.stack(all_verts), np.stack(all_joints)
