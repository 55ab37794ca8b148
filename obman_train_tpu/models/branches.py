"""Model branches: MANO hand branch, AtlasNet object branch, absolute branch.

TPU-first redesign notes vs the reference:

- **Left/right hands** — the reference splits the batch by side and runs two
  ManoLayers on variable-size sub-batches (manobranch.py:132-207), which
  cannot jit.  Here both sides run on the full batch with shared MLP outputs
  and a per-sample ``where`` select; MANO is tiny next to the encoder, so
  computing both sides costs almost nothing and keeps shapes static.
- **PointGenCon** — the reference uses Conv1d(k=1) stacks (atlasutils.py:
  42-149); a 1x1 conv over points is exactly a per-point Dense layer, which
  XLA maps onto one big (B*N, C) MXU matmul.
- **BatchNorm1d over points** normalizes channels across batch*points; flax
  BatchNorm with default feature axis reproduces it (frozen mode = running
  averages, matching the freeze_batchnorm training recipe).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from obman_train_tpu.models.mano import ManoParams, mano_forward

# Hard-coded StereoHands shape coefficients (reference: manobranch.py:34-47).
STEREO_SHAPE = np.array(
    [
        -0.00298099, -0.0013994, -0.00840144, 0.00362311, 0.00248761,
        0.00044125, 0.00381337, -0.00183374, -0.00149655, 0.00137479,
    ],
    dtype=np.float32,
)

SIDE_RIGHT = 0
SIDE_LEFT = 1


def _rotmat_head_init(key, shape, dtype=jnp.float32):
    """Initializer for the non-PCA pose head: keep only (abs of) the weights
    feeding rotation-matrix diagonal entries (reference: manobranch.py:69-79,
    transposed to flax's (in, out) kernel layout)."""
    w = nn.initializers.lecun_normal()(key, shape, dtype)
    mask = jnp.tile(jnp.eye(3, dtype=dtype).reshape(9), 16)  # (144,)
    return jnp.abs(w) * mask[None, :]


class MLP(nn.Module):
    """Dense+ReLU stack (used as the shared 'base' of several branches)."""

    hidden: Sequence[int]
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden):
            if self.dropout:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
            x = nn.Dense(h, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return x


class AbsoluteBranch(nn.Module):
    """Tiny MLP head (reference: absolutebranch.py:4-20); used both for the
    absolute root position (input [focal, u0, v0, features]) and the
    orthographic scale+trans head (out_dim=3: [scale, tx, ty])."""

    hidden: Sequence[int]
    out_dim: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="final")(x)


class ManoBranch(nn.Module):
    """MLP + pose/shape/trans heads + dual-side MANO layer
    (reference: manobranch.py:11-218)."""

    mano_right: ManoParams
    mano_left: ManoParams
    ncomps: int = 6
    base_neurons: Sequence[int] = (1024, 256)  # hidden sizes (input implicit)
    center_idx: Optional[int] = 9
    use_shape: bool = False
    use_trans: bool = False
    use_pca: bool = True
    adapt_skeleton: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,       # (B, C) image features
        sides: jnp.ndarray,          # (B,) int32: 0=right, 1=left
        root_palm: bool = False,
        use_stereoshape: bool = False,
        train: bool = False,
    ) -> dict:
        B = features.shape[0]
        base = MLP(self.base_neurons, self.dropout, self.dtype, name="base")(
            features, train=train
        )
        pose_size = (self.ncomps + 3) if self.use_pca else 16 * 9
        if self.use_pca:
            pose = nn.Dense(pose_size, dtype=self.dtype, name="pose_reg")(base)
            mano_pose = pose
        else:
            pose = nn.Dense(
                pose_size,
                dtype=self.dtype,
                kernel_init=_rotmat_head_init,
                bias_init=nn.initializers.zeros,
                name="pose_reg",
            )(base)
            mano_pose = pose.reshape(B, 16, 3, 3)

        if use_stereoshape:
            shape = jnp.broadcast_to(jnp.asarray(STEREO_SHAPE), (B, 10))
        elif self.use_shape:
            shape = nn.Dense(10, dtype=self.dtype, name="shape_reg")(base)
        else:
            shape = None

        trans = (
            nn.Dense(3, dtype=self.dtype, name="trans_reg")(base)
            if self.use_trans
            else None
        )

        # The MANO layer always runs in f32 regardless of the encoder's
        # compute dtype — mm-level parity needs full precision.
        kw = dict(
            betas=None if shape is None else shape.astype(jnp.float32),
            trans=None if trans is None else trans.astype(jnp.float32),
            use_pca=self.use_pca,
            ncomps=self.ncomps,
            center_idx=self.center_idx,
            root_palm=root_palm,
        )
        mano_pose32 = mano_pose.astype(jnp.float32)
        verts_r, joints_r = mano_forward(self.mano_right, mano_pose32, **kw)
        verts_l, joints_l = mano_forward(self.mano_left, mano_pose32, **kw)

        if self.adapt_skeleton:
            # Per-side learned 21x21 joint mixing, init=identity
            # (reference: manobranch.py:106-111,183-191).
            w_r = self.param(
                "right_skeleton_reg",
                lambda k, s: jnp.eye(21, dtype=self.dtype), (21, 21),
            )
            w_l = self.param(
                "left_skeleton_reg",
                lambda k, s: jnp.eye(21, dtype=self.dtype), (21, 21),
            )
            joints_r = jnp.einsum("jk,bkd->bjd", w_r, joints_r)
            joints_l = jnp.einsum("jk,bkd->bjd", w_l, joints_l)

        is_right = (sides == SIDE_RIGHT)[:, None, None]
        verts = jnp.where(is_right, verts_r, verts_l)
        joints = jnp.where(is_right, joints_r, joints_l)

        results = {"verts": verts, "joints": joints, "shape": shape, "pose": pose}
        if self.use_trans:
            results["trans"] = trans
        return results


class PointGenCon(nn.Module):
    """AtlasNet point decoder: 4 per-point Dense layers with BN+ReLU,
    output scaled by ``out_factor`` (reference: atlasutils.py:42-75)."""

    bottleneck_size: int            # input channels = 3 + feature size
    out_factor: float = 200.0
    use_tanh: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, N, bottleneck_size)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        b = self.bottleneck_size
        x = nn.relu(bn("bn1")(nn.Dense(b, dtype=self.dtype, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Dense(b // 2, dtype=self.dtype, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Dense(b // 4, dtype=self.dtype, name="conv3")(x)))
        x = nn.Dense(3, dtype=self.dtype, name="conv4")(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return self.out_factor * x


class DecoderBlock(nn.Module):
    """Residual decoder block (reference: atlasutils.py:78-103)."""

    res_size: int = 256
    out_factor: float = 1.0
    residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        coords = x[..., :3]
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        y = nn.relu(bn("bn1")(nn.Dense(self.res_size, dtype=self.dtype,
                                       name="conv1")(x)))
        y = nn.relu(bn("bn2")(nn.Dense(self.res_size, dtype=self.dtype,
                                       name="conv2")(y)))
        y = nn.Dense(3, dtype=self.dtype, name="conv3")(y)
        if self.residual:
            y = y + coords * self.out_factor
        return y


class PointGenConResidual(nn.Module):
    """3 DecoderBlocks with coordinate-residual connections
    (reference: atlasutils.py:106-149)."""

    bottleneck_size: int
    res_size: int = 256
    out_factor: float = 200.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x[..., 3:]
        y = DecoderBlock(self.res_size, 1.0, True, self.dtype, name="residual1")(
            x, train=train
        )
        y = DecoderBlock(self.res_size, 1.0, True, self.dtype, name="residual2")(
            jnp.concatenate([y, features], axis=-1), train=train
        )
        y = DecoderBlock(self.res_size, 1.0, False, self.dtype, name="residual3")(
            jnp.concatenate([y, features], axis=-1), train=train
        )
        return self.out_factor * y


def _scale_head_bias_init(key, shape, dtype=jnp.float32):
    # decode_scale final bias initialized to 1 (reference: atlasbranch.py:61)
    return jnp.ones(shape, dtype)


class AtlasBranch(nn.Module):
    """Object decoder (reference: atlasbranch.py:13-150).

    ``test_verts``/``test_faces`` (the icosphere template) are passed in as
    static numpy arrays; inference mode decodes at the template vertices so
    faces are known, train (non-mesh) mode decodes ``points_nb`` random
    unit-sphere points drawn from the 'points' RNG stream.
    """

    bottleneck_size: int
    test_verts: np.ndarray          # (V, 3) float32
    use_residual: bool = False
    points_nb: int = 600
    use_tanh: bool = False
    out_factor: float = 200.0
    predict_trans: bool = False
    predict_scale: bool = False
    separate_encoder: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.use_residual:
            self.decoder = PointGenConResidual(
                bottleneck_size=3 + self.bottleneck_size,
                out_factor=self.out_factor,
                dtype=self.dtype,
            )
        else:
            self.decoder = PointGenCon(
                bottleneck_size=3 + self.bottleneck_size,
                out_factor=self.out_factor,
                use_tanh=self.use_tanh,
                dtype=self.dtype,
            )
        if self.predict_trans:
            self.decode_trans = AbsoluteBranch(
                hidden=(self.bottleneck_size // 2,), out_dim=3,
                dtype=self.dtype,
            )
        if self.predict_scale:
            self.decode_scale_hidden = nn.Dense(
                self.bottleneck_size // 2, dtype=self.dtype
            )
            self.decode_scale_out = nn.Dense(
                1, dtype=self.dtype, bias_init=_scale_head_bias_init
            )

    def _decode(self, grid, features, train):
        # grid (B, N, 3), features (B, C) -> (B, N, 3)
        B, N = grid.shape[:2]
        tiled = jnp.broadcast_to(features[:, None, :], (B, N, features.shape[-1]))
        return self.decoder(jnp.concatenate([grid, tiled], axis=-1), train=train)

    def __call__(self, img_features, train: bool = False) -> dict:
        """Random-cloud mode (reference: atlasbranch.py:78-108)."""
        B = img_features.shape[0]
        key = self.make_rng("points")
        rand = jax.random.normal(key, (B, self.points_nb, 3), self.dtype)
        rand = rand / jnp.sqrt(
            jnp.sum(rand**2, axis=-1, keepdims=True) + 1e-12
        )
        verts = self._decode(rand, img_features, train)
        if self.predict_trans:
            trans = self.decode_trans(img_features)
            return {
                "objpoints3d": verts + trans[:, None, :],
                "objtrans": trans,
                "objpointscentered3d": verts,
            }
        return {"objpoints3d": verts}

    def forward_inference(
        self, img_features, separate_encoder_features=None, train: bool = False
    ) -> dict:
        """Mesh mode on the icosphere template
        (reference: atlasbranch.py:110-150)."""
        B = img_features.shape[0]
        grid = jnp.broadcast_to(
            jnp.asarray(self.test_verts, self.dtype)[None],
            (B,) + self.test_verts.shape,
        )
        dec_feats = (
            separate_encoder_features if self.separate_encoder else img_features
        )
        verts = self._decode(grid, dec_feats, train)

        results = {}
        if self.predict_scale:
            scales = self.decode_scale_out(
                nn.relu(self.decode_scale_hidden(img_features))
            )  # (B, 1)
            verts_out = scales[:, None, :] * verts
            results["objscale"] = scales
        else:
            verts_out = verts
        if self.predict_trans:
            trans = self.decode_trans(img_features)
            results.update(
                objpoints3d=verts_out + trans[:, None, :],
                objtrans=trans,
                objpointscentered3d=verts,
            )
        else:
            results["objpoints3d"] = verts_out
        return results
