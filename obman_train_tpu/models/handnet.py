"""HandNet: the top-level multi-branch model.

Functional equivalent of the reference HandNet
(mano_train/networks/handnet.py:20-392): ResNet encoder -> MANO hand branch,
AtlasNet object branch, optional absolute-position and orthographic
scale+trans heads, with multi-task losses accumulated into
``(total_loss, results, losses)`` using the same loss-dict keys.

Branch gating is static: the reference inspects dict-key presence at runtime
(handnet.py:216-313); here a hashable :class:`BatchSpec` describes which GT
queries a batch carries (static per dataset), so each dataset's step
compiles to one fused XLA program with no dynamic control flow.

Loss accumulation order and the reference's quirks are preserved:
- when the absolute loss is first it enters total_loss UNSCALED
  (handnet.py:248-252) — kept for loss-trajectory parity;
- contact losses require the mano branch to have run (same in reference).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from obman_train_tpu.assets.icosphere import icosphere
from obman_train_tpu.assets.laplacian import cotangent_laplacian
from obman_train_tpu.config import ModelConfig
from obman_train_tpu.models.branches import AbsoluteBranch, AtlasBranch, ManoBranch
from obman_train_tpu.models.losses import compute_atlas_loss, compute_mano_loss, mse
from obman_train_tpu.models.mano import ManoParams
from obman_train_tpu.models.resnet import resnet18, resnet50
from obman_train_tpu.ops.chamfer import min_sqdist_to, plane_dtype_for
from obman_train_tpu.ops.contact import compute_contact_loss
from obman_train_tpu.ops.mesh import meshiou


@dataclass(frozen=True)
class BatchSpec:
    """Static description of which GT queries a batch carries (one per
    dataset/split; hashable so it can be a jit static argument)."""

    has_joints3d: bool = True
    has_verts3d: bool = True
    has_joints2d: bool = False
    has_camintrs: bool = False
    has_objpoints3d: bool = True
    has_center3d: bool = False
    has_pcas: bool = False
    has_sides: bool = True
    root: str = "wrist"             # "wrist" | "palm" (datautils.py:22-32)
    use_stereoshape: bool = False

    @property
    def root_palm(self) -> bool:
        return self.root == "palm"


class HandNet(nn.Module):
    """Top-level model; construct with :func:`build_handnet`."""

    cfg: ModelConfig
    mano_right: ManoParams
    mano_left: ManoParams
    ico_verts: np.ndarray           # (V, 3) template for the object decoder
    ico_faces: np.ndarray           # (F, 3)
    laplacian: Optional[np.ndarray]  # (V, V) or None

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        feat = cfg.img_feature_size
        make_resnet = {18: resnet18, 50: resnet50}[int(cfg.resnet_version)]
        bn_axis = "data" if cfg.sync_bn else None
        self.base_net = make_resnet(dtype=dtype, bn_axis_name=bn_axis)
        if cfg.atlas.separate_encoder:
            self.atlas_base_net = make_resnet(dtype=dtype, bn_axis_name=bn_axis)
        if cfg.atlas.adapt_decoder:
            self.atlas_adapter = nn.Dense(feat, dtype=dtype)
        # The reference only instantiates this head lazily/buggily
        # (handnet.py:121-126 never creates absolute_branch); we create it
        # whenever either consumer is configured.
        if cfg.absolute_lambda or cfg.mano.lambda_joints2d:
            self.absolute_branch = AbsoluteBranch(
                hidden=(feat // 2,), out_dim=3, dtype=dtype
            )
        if cfg.mano.lambda_joints2d:
            self.scaletrans_branch = AbsoluteBranch(
                hidden=(feat // 2,), out_dim=3, dtype=dtype
            )
        self.mano_branch = ManoBranch(
            mano_right=self.mano_right,
            mano_left=self.mano_left,
            ncomps=cfg.mano.ncomps,
            base_neurons=tuple(cfg.mano.base_neurons),
            center_idx=cfg.mano.center_idx,
            use_shape=cfg.mano.use_shape,
            use_trans=cfg.mano.use_trans,
            use_pca=cfg.mano.use_pca,
            adapt_skeleton=cfg.mano.adapt_skeleton,
            dropout=cfg.fc_dropout,
            dtype=dtype,
        )
        self.atlas_branch = AtlasBranch(
            bottleneck_size=feat,
            test_verts=self.ico_verts,
            use_residual=cfg.atlas.use_residual,
            points_nb=cfg.atlas.points_nb,
            use_tanh=cfg.atlas.use_tanh,
            out_factor=cfg.atlas.out_factor,
            predict_trans=cfg.atlas.predict_trans,
            predict_scale=cfg.atlas.predict_scale,
            separate_encoder=cfg.atlas.separate_encoder,
            dtype=dtype,
        )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        spec: BatchSpec,
        train: bool = False,
        no_loss: bool = False,
        return_features: bool = False,
        force_objects: bool = False,
        force_hand: bool = False,
        regul_scale=1.0,
        feature_probe: Optional[jnp.ndarray] = None,
    ) -> Tuple[Optional[jnp.ndarray], Dict, Dict]:
        cfg = self.cfg
        total_loss = None
        results: Dict[str, Any] = {}
        losses: Dict[str, Any] = {}

        image = batch["images"]
        if jnp.issubdtype(image.dtype, jnp.integer):
            # uint8 pipeline: normalization fused on device
            # (x/255 - 0.5 = to_tensor + normalize, handataset.py:385-407)
            image = image.astype(jnp.float32) / 255.0
            if "aug_factors" in batch:
                # device-side color jitter (host only draws the factors)
                from obman_train_tpu.ops.image import batched_color_jitter

                image = batched_color_jitter(
                    image, batch["aug_factors"], batch["aug_order"]
                )
            image = image - 0.5
        features, _ = self.base_net(image, train=train)
        features = features.astype(jnp.float32)
        if feature_probe is not None:
            # Zero-valued probe for per-loss feature-gradient inspection
            # (the inspect_weights mode, epochpass3d.py:92-108): gradients
            # w.r.t. the probe equal gradients w.r.t. the features.
            features = features + feature_probe
        if cfg.atlas.separate_encoder:
            atlas_infeatures, _ = self.atlas_base_net(image, train=train)
            atlas_infeatures = atlas_infeatures.astype(jnp.float32)
            if return_features:
                results["atlas_features"] = atlas_infeatures
        if return_features:
            results["img_features"] = features

        # ----- absolute root position (handnet.py:216-252) -----
        predict_center = spec.has_camintrs and bool(
            (cfg.absolute_lambda and spec.has_center3d) or cfg.mano.lambda_joints2d
        )
        supervise_center = bool(
            cfg.absolute_lambda and spec.has_center3d and spec.has_camintrs
        )
        if predict_center:
            intr = batch["camintrs"]
            absolute_input = jnp.concatenate(
                [intr[:, 0:1, 0], intr[:, 0:1, 2], intr[:, 1:2, 2], features],
                axis=1,
            )
            pred_center3d = self.absolute_branch(absolute_input)
            results["center3d"] = pred_center3d
            if not no_loss and supervise_center:
                absolute_loss = mse(pred_center3d, batch["center3d"])
                if total_loss is None:
                    # Reference quirk: unscaled when first (handnet.py:248-249).
                    total_loss = absolute_loss
                else:
                    total_loss = total_loss + cfg.absolute_lambda * absolute_loss
                losses["absolute_loss"] = absolute_loss

        # ----- MANO branch (handnet.py:253-309) -----
        mano_results = None
        # force_hand replaces the reference demos' dummy-GT trick
        # (image_demo.py:20-32) for GT-free inference.
        run_mano = (
            (
                spec.has_joints3d
                or spec.has_verts3d
                or (spec.has_joints2d and spec.has_camintrs)
                or force_hand
            )
            and spec.has_sides
            and cfg.mano_lambdas
        )
        if run_mano:
            mano_results = self.mano_branch(
                features,
                sides=batch["sides"],
                root_palm=spec.root_palm,
                use_stereoshape=spec.use_stereoshape,
                train=train,
            )
            if not no_loss:
                mano_total, mano_losses = compute_mano_loss(
                    mano_results,
                    batch,
                    cfg.mano,
                    has_verts3d=spec.has_verts3d,
                    has_joints3d=spec.has_joints3d,
                    has_pcas=spec.has_pcas,
                )
                total_loss = (
                    mano_total if total_loss is None else total_loss + mano_total
                )
                losses.update(mano_losses)
            results.update(mano_results)

            if cfg.mano.lambda_joints2d:
                scaletrans = self.scaletrans_branch(features)
                trans = scaletrans[:, 1:]
                scale = jnp.abs(scaletrans[:, :1])
                # 100 ~ the scale of 2D joint coordinates (handnet.py:296-301)
                proj = (
                    mano_results["joints"][:, :, :2] * scale[:, None, :]
                    + 100.0 * trans[:, None, :]
                )
                results["joints2d"] = proj
                if not no_loss and spec.has_joints2d:
                    j2d = mse(proj, batch["joints2d"].astype(jnp.float32))
                    losses["joints2d"] = j2d
                    total_loss = total_loss + cfg.mano.lambda_joints2d * j2d

        # ----- Atlas branch (handnet.py:310-386) -----
        predict_atlas = (spec.has_objpoints3d or force_objects) and bool(
            cfg.atlas.lambda_atlas or cfg.atlas.final_lambda_atlas
        )
        if predict_atlas:
            if cfg.atlas.mesh:
                atlas_features = (
                    self.atlas_adapter(features)
                    if cfg.atlas.adapt_decoder
                    else features
                )
                atlas_results = self.atlas_branch.forward_inference(
                    atlas_features,
                    separate_encoder_features=(
                        atlas_infeatures if cfg.atlas.separate_encoder else None
                    ),
                    train=train,
                )
                atlas_results["objfaces"] = self.ico_faces
            else:
                atlas_results = self.atlas_branch(features, train=train)

            if cfg.need_collisions and mano_results is not None:
                attr_loss, penetr_loss, contact_infos, contact_metrics = (
                    compute_contact_loss(
                        mano_results["verts"],
                        atlas_results["objpoints3d"],
                        jnp.asarray(self.ico_faces),
                        contact_thresh=cfg.contact.contact_thresh,
                        contact_mode=cfg.contact.contact_mode,
                        collision_thresh=cfg.contact.collision_thresh,
                        collision_mode=cfg.contact.collision_mode,
                        contact_target=cfg.contact.contact_target,
                        contact_sym=cfg.contact.contact_sym,
                        contact_zones=cfg.contact.contact_zones,
                        geometry_dtype=cfg.geometry_dtype,
                    )
                )
                if not no_loss:
                    if spec.has_verts3d and spec.has_objpoints3d:
                        dist_h2o_gt = min_sqdist_to(
                            batch["verts3d"], batch["objpoints3d"],
                            plane_dtype=plane_dtype_for(cfg.geometry_dtype),
                        )
                        contact_ious, contact_auc = meshiou(
                            dist_h2o_gt, contact_infos["min_dists"]
                        )
                        contact_infos["batch_ious"] = contact_ious
                        losses["contact_auc"] = contact_auc
                    contact_loss = (
                        cfg.contact.contact_lambda * attr_loss
                        + cfg.contact.collision_lambda * penetr_loss
                    )
                    total_loss = total_loss + contact_loss
                    losses["penetration_loss"] = penetr_loss
                    losses["attraction_loss"] = attr_loss
                    losses["contact_loss"] = contact_loss
                    losses.update(contact_metrics)
                results["contact_info"] = contact_infos

            results.update(atlas_results)
            if not no_loss:
                atlas_total, atlas_losses = compute_atlas_loss(
                    atlas_results,
                    batch,
                    cfg.atlas,
                    has_objpoints3d=spec.has_objpoints3d,
                    has_center3d=spec.has_center3d,
                    obj_faces=self.ico_faces,
                    laplacian=(
                        jnp.asarray(self.laplacian)
                        if self.laplacian is not None
                        else None
                    ),
                    regul_scale=regul_scale,
                    geometry_dtype=cfg.geometry_dtype,
                )
                total_loss = (
                    atlas_total if total_loss is None else total_loss + atlas_total
                )
                losses.update(atlas_losses)

        losses["total_loss"] = total_loss
        return total_loss, results, losses


def build_handnet(
    cfg: ModelConfig,
    mano_right: ManoParams,
    mano_left: ManoParams,
) -> HandNet:
    """Construct HandNet with its static mesh templates."""
    ico_verts, ico_faces = icosphere(cfg.atlas.ico_divisions)
    lap = (
        cotangent_laplacian(ico_verts, ico_faces)
        if cfg.atlas.lambda_laplacian
        else None
    )
    return HandNet(
        cfg=cfg,
        mano_right=mano_right,
        mano_left=mano_left,
        ico_verts=ico_verts,
        ico_faces=ico_faces,
        laplacian=lap,
    )
