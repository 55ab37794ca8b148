"""MANO model assets.

The reference depends on the external ``manopth`` package, which reads the
official ``MANO_{LEFT,RIGHT}.pkl`` model files (reference:
mano_train/networks/branches/manobranch.py:92-105; the files themselves are
user-supplied, README.md:48-58).  Those pickles contain chumpy arrays and
scipy sparse matrices; this module unpickles them without chumpy installed,
converts everything to plain float32/int32 numpy arrays, and can cache the
result as ``.npz``.

Because neither the MANO data files nor release checkpoints ship with this
repository, :func:`synthetic_mano_assets` builds a structurally faithful
synthetic model (real MANO mesh topology + rest vertices taken from the
contact-zones asset, real kinematic tree, random orthonormal PCA basis and
small random blendshapes) so every kernel and model test can run hermetically.
"""

from __future__ import annotations

import io
import os
import pickle
from dataclasses import dataclass, fields

import numpy as np

from obman_train_tpu.assets.contact_zones import load_contact_zones

# MANO kinematic tree: 16 joints, wrist root; fingers in native MANO order
# index(1-3), middle(4-6), pinky(7-9), ring(10-12), thumb(13-15).
MANO_PARENTS = np.array(
    [-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14], dtype=np.int32
)

NUM_VERTS = 778
NUM_JOINTS = 16
NUM_BETAS = 10
NUM_POSE_AA = 45          # 15 articulated joints x 3 axis-angle
NUM_POSE_BLEND = 135      # 15 joints x 9 rotmat entries

# Fingertip vertex ids appended as joints 16-20 before reordering
# (thumb, index, middle, ring, pinky tips).
TIPS = np.array([745, 317, 444, 556, 673], dtype=np.int32)

# Reorder of [16 chain joints + 5 tips] into the 21-joint output convention:
# wrist, thumb1-3+tip, index1-3+tip, middle1-3+tip, ring1-3+tip, pinky1-3+tip.
JOINT_REORDER = np.array(
    [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20],
    dtype=np.int32,
)

# Vertices whose mean replaces the wrist joint in root_palm mode
# (mirrors handobjectdatasets/obman.py:398-401).
PALM_VERT_IDS = (95, 218)


@dataclass(frozen=True)
class ManoAssets:
    """Numeric tables for one hand side, all plain numpy."""

    v_template: np.ndarray        # (778, 3)
    shapedirs: np.ndarray         # (778, 3, 10)
    posedirs: np.ndarray          # (778, 3, 135)
    J_regressor: np.ndarray       # (16, 778) dense
    weights: np.ndarray           # (778, 16) LBS skinning weights
    hands_components: np.ndarray  # (45, 45) PCA pose basis (rows = components)
    hands_mean: np.ndarray        # (45,) mean pose offset
    faces: np.ndarray             # (1538, 3) int32
    parents: np.ndarray = None    # (16,) int32
    side: str = "right"

    def __post_init__(self):
        if self.parents is None:
            object.__setattr__(self, "parents", MANO_PARENTS.copy())

    def validate(self):
        assert self.v_template.shape == (NUM_VERTS, 3)
        assert self.shapedirs.shape == (NUM_VERTS, 3, NUM_BETAS)
        assert self.posedirs.shape == (NUM_VERTS, 3, NUM_POSE_BLEND)
        assert self.J_regressor.shape == (NUM_JOINTS, NUM_VERTS)
        assert self.weights.shape == (NUM_VERTS, NUM_JOINTS)
        assert self.hands_components.shape == (NUM_POSE_AA, NUM_POSE_AA)
        assert self.hands_mean.shape == (NUM_POSE_AA,)
        assert self.faces.shape[1] == 3
        return self

    def save_npz(self, path: str):
        np.savez(
            path,
            side=np.array(self.side),
            **{
                f.name: getattr(self, f.name)
                for f in fields(self)
                if f.name != "side"
            },
        )

    @classmethod
    def load_npz(cls, path: str) -> "ManoAssets":
        data = np.load(path, allow_pickle=False)
        kw = {k: data[k] for k in data.files if k != "side"}
        side = str(data["side"]) if "side" in data.files else "right"
        return cls(side=side, **kw).validate()


class _ChumpyShim:
    """Stand-in for chumpy.Ch objects during unpickling: keeps only the
    underlying numpy payload."""

    def __init__(self, *args, **kwargs):
        self.__dict__ = {}

    def __setstate__(self, state):
        self.__dict__.update(state)

    @property
    def r(self):
        for key in ("x", "a", "v"):
            if key in self.__dict__ and isinstance(self.__dict__[key], np.ndarray):
                return self.__dict__[key]
        raise ValueError("chumpy shim: no numpy payload found")


class _ManoUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyShim
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if isinstance(x, _ChumpyShim):
        x = x.r
    if hasattr(x, "toarray"):  # scipy sparse
        x = x.toarray()
    return np.asarray(x)


def load_mano_pkl(path: str, side: str) -> ManoAssets:
    """Load an official MANO pkl into :class:`ManoAssets`."""
    with open(path, "rb") as f:
        data = _ManoUnpickler(f, encoding="latin1").load()
    kintree = _to_np(data["kintree_table"]).astype(np.int64)
    parents = kintree[0].astype(np.int32)
    parents[0] = -1
    return ManoAssets(
        v_template=_to_np(data["v_template"]).astype(np.float32),
        shapedirs=_to_np(data["shapedirs"]).astype(np.float32),
        posedirs=_to_np(data["posedirs"]).astype(np.float32),
        J_regressor=_to_np(data["J_regressor"]).astype(np.float32),
        weights=_to_np(data["weights"]).astype(np.float32),
        hands_components=_to_np(data["hands_components"]).astype(np.float32),
        hands_mean=_to_np(data["hands_mean"]).astype(np.float32),
        faces=_to_np(data["f"]).astype(np.int32),
        parents=parents,
        side=side,
    ).validate()


def load_mano_assets(
    mano_root: str, side: str, fix_left_shapedirs: bool = False
) -> ManoAssets:
    """Load one side from ``mano_root``, preferring a cached ``.npz``.

    ``fix_left_shapedirs`` applies the known MANO_LEFT data fix (the
    official left-hand pkl ships un-mirrored x shape blendshapes; newer
    manopth versions negate shapedirs[:, 0]).  Default False to match the
    historical behaviour the reference was trained with.
    """
    base = f"MANO_{side.upper()}"
    npz = os.path.join(mano_root, base + ".npz")
    if os.path.exists(npz):
        assets = ManoAssets.load_npz(npz)
    else:
        pkl = os.path.join(mano_root, base + ".pkl")
        if not os.path.exists(pkl):
            raise FileNotFoundError(
                f"No MANO assets for side={side} under {mano_root} "
                f"(expected {base}.npz or {base}.pkl)"
            )
        assets = load_mano_pkl(pkl, side)
    if fix_left_shapedirs and side == "left":
        shapedirs = assets.shapedirs.copy()
        shapedirs[:, 0, :] *= -1
        import dataclasses

        assets = dataclasses.replace(assets, shapedirs=shapedirs)
    return assets


def synthetic_mano_assets(side: str = "right", seed: int = 0) -> ManoAssets:
    """Structurally faithful synthetic MANO model for hermetic tests.

    Uses the real MANO mesh topology and rest vertices (from the
    contact-zones asset, metres scale) and the real kinematic tree; blend
    shapes, skinning weights, joint regressor, and the PCA basis are random
    but well-conditioned (orthonormal PCA rows, rows of J_regressor and
    weights sum to 1).
    """
    rng = np.random.default_rng(seed + (1 if side == "left" else 0))
    rest_verts, _ = load_contact_zones()
    _, zones = load_contact_zones()
    del zones
    data = np.load(
        os.path.join(os.path.dirname(__file__), "data", "contact_zones.npz")
    )
    faces = data["faces"].astype(np.int32)
    # The stored rest verts are ALREADY metres (bbox ~0.19 x 0.06 x 0.17 m,
    # a real MANO template); an earlier /1000 "mm -> metres" conversion
    # here shrank the synthetic hand to ~0.2 mm, at which scale the random
    # blendshapes dominate and every consumer saw a noise cloud instead of
    # a hand (flat EPE/AUC on synthetic training runs).
    v_template = rest_verts.astype(np.float32)
    if side == "left":
        v_template = v_template * np.array([-1.0, 1.0, 1.0], dtype=np.float32)

    # Joint rest positions: pick anchor vertices spread over the mesh and
    # build a smooth J_regressor by inverse-distance weighting.
    anchor_ids = rng.choice(NUM_VERTS, size=NUM_JOINTS, replace=False)
    anchors = v_template[anchor_ids]
    d = np.linalg.norm(
        v_template[None, :, :] - anchors[:, None, :], axis=-1
    )  # (16, 778)
    J_regressor = np.exp(-d / (d.mean() * 0.05))
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)

    # Skinning weights: softmax over joint proximity, sharpened.
    w = np.exp(-(d.T) / (d.mean() * 0.15))  # (778, 16)
    weights = w / w.sum(axis=1, keepdims=True)

    shapedirs = rng.normal(0, 0.002, (NUM_VERTS, 3, NUM_BETAS))
    posedirs = rng.normal(0, 0.0005, (NUM_VERTS, 3, NUM_POSE_BLEND))

    q, _ = np.linalg.qr(rng.normal(0, 1, (NUM_POSE_AA, NUM_POSE_AA)))
    hands_components = q * rng.uniform(0.5, 2.0, (NUM_POSE_AA, 1))
    hands_mean = rng.normal(0, 0.1, (NUM_POSE_AA,))

    return ManoAssets(
        v_template=v_template.astype(np.float32),
        shapedirs=shapedirs.astype(np.float32),
        posedirs=posedirs.astype(np.float32),
        J_regressor=J_regressor.astype(np.float32),
        weights=weights.astype(np.float32),
        hands_components=hands_components.astype(np.float32),
        hands_mean=hands_mean.astype(np.float32),
        faces=faces,
        parents=MANO_PARENTS.copy(),
        side=side,
    ).validate()
