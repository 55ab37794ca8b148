"""Demo inference wrapper: checkpoint reload + fused single/dual-frame
forward.

Replaces the reference's ``reload_model`` + ``forward_pass_3d``
(mano_train/netscripts/reload.py:35-111, image_demo.py:20-32).  Branch
gating is static config, so no dummy GT tensors are needed to switch
branches on (the reference passes ones() joints/objpoints to trigger them).
The dual flipped/unflipped evaluation of image_demo runs as ONE jitted batch
of 2 (SURVEY.md §7.11).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from obman_train_tpu.config import ExperimentConfig
from obman_train_tpu.models.handnet import BatchSpec


class DemoModel:
    def __init__(
        self,
        exp_dir: Optional[str] = None,
        config: Optional[ExperimentConfig] = None,
        mano_assets: Optional[str] = None,
        image_size: Optional[int] = None,
    ):
        """``image_size=None`` (default) uses the experiment's own
        ``config.model.image_size`` from the restored opt.json, so demos run
        at the resolution the checkpoint was trained at; pass an int to
        override (e.g. for latency experiments)."""
        import jax

        from obman_train_tpu.cli.traineval import load_mano_pair
        from obman_train_tpu.models import build_handnet
        from obman_train_tpu.train import create_train_state, make_optimizer

        if config is None:
            assert exp_dir is not None
            config = ExperimentConfig.from_json(os.path.join(exp_dir, "opt.json"))
        self.cfg = config
        if image_size is None:
            image_size = int(getattr(config.model, "image_size", 256))
        self.image_size = image_size
        mano_dir = mano_assets or config.mano_assets
        net = build_handnet(config.model, *load_mano_pair(mano_dir))
        self.net = net
        self.spec = BatchSpec(
            has_joints3d=False, has_verts3d=False, has_joints2d=False,
            has_camintrs=False, has_objpoints3d=False, has_center3d=False,
        )
        dummy = {
            "images": np.zeros((2, image_size, image_size, 3), np.float32),
            "sides": np.zeros((2,), np.int32),
        }
        tx = make_optimizer(config.train)
        # force_objects traces the atlas branch so its params exist even
        # though no object GT is present at inference time.
        self.state = create_train_state(
            net, tx, dummy, self.spec, no_loss=True, force_objects=True,
            force_hand=True
        )
        if exp_dir is not None and os.path.isdir(
            os.path.join(exp_dir, "checkpoint")
        ):
            from obman_train_tpu.train.checkpoint import load_checkpoint

            self.state, self.epoch = load_checkpoint(exp_dir, self.state)
        else:
            self.epoch = 0

        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }

        @jax.jit
        def infer(variables, frames_u8, sides, flip):
            from obman_train_tpu.ops.image import preprocess_frames

            images = preprocess_frames(
                frames_u8.astype(np.float32) * 1.0, size=image_size, flip=flip
            )
            _, results, _ = net.apply(
                variables,
                {"images": images, "sides": sides},
                self.spec,
                no_loss=True,
                force_objects=True,
                force_hand=True,
            )
            keep = (
                "verts", "joints", "objpoints3d", "objtrans", "objscale",
                "joints2d",
            )
            return {k: results[k] for k in keep if k in results}

        # Standalone encoder module (flax modules are stateless, so a fresh
        # instance applied with the base_net params is the same network).
        from obman_train_tpu.models.resnet import resnet18, resnet50

        import jax.numpy as jnp_

        encoder = {18: resnet18, 50: resnet50}[
            int(config.model.resnet_version)
        ](dtype=jnp_.dtype(config.model.compute_dtype))

        @jax.jit
        def encoder_inters(variables, frames_u8):
            """ResNet stage intermediates for attention maps (the
            AttentionHook role, demo/attention.py)."""
            from obman_train_tpu.ops.image import preprocess_frames

            images = preprocess_frames(
                frames_u8.astype(np.float32) * 1.0, size=image_size
            )
            _, inters = encoder.apply(
                {
                    "params": variables["params"]["base_net"],
                    "batch_stats": variables["batch_stats"].get("base_net", {}),
                },
                images,
                return_inter=True,
            )
            return inters

        self._infer = infer
        self._encoder_inters = encoder_inters
        self._variables = variables
        self.hand_faces = np.asarray(
            # faces are shared by both sides' assets in our loader
            _load_faces(mano_dir)
        )
        self.obj_faces = net.ico_faces

    def predict(
        self, frame: np.ndarray, hand_side: str = "left", flip: bool = False
    ):
        """Single frame (H, W, 3) uint8 -> results dict (batch dim 1).

        Transfers are batched: ONE ``jax.device_put`` of the input tree and
        ONE ``jax.device_get`` of the output tree (async copies first).  The
        per-leaf ``jnp.asarray``/``np.asarray`` form this replaces cost a
        device sync per array — ~45 ms per leaf through the tunneled TPU,
        ~90 ms/frame for this call's 3-in/6-out trees (CLAUDE.md transfer
        note; bench_details.json: demo_coldstart steady_ms before/after)."""
        import jax

        if np.ndim(frame) != 3:
            raise ValueError(
                f"predict takes ONE (H, W, 3) frame, got shape "
                f"{np.shape(frame)}; for batches call predict_dual per "
                f"frame or model._infer directly"
            )

        frames, sides, flips = jax.device_put((
            np.ascontiguousarray(frame[None]),
            np.asarray([0 if hand_side == "right" else 1], np.int32),
            np.asarray([flip], bool),
        ))
        out = self._infer(self._variables, frames, sides, flips)
        return jax.device_get(out)

    def attention_maps(self, frames: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 frames -> (B, size, size) attention in [0, 1]
        (the webcam demo's activation heatmaps, webcam_demo.py:90-131)."""
        import jax

        from obman_train_tpu.demo.attention import stage_attention

        inters = self._encoder_inters(
            self._variables, jax.device_put(np.ascontiguousarray(frames))
        )
        return stage_attention(
            jax.device_get(list(inters)),
            (self.image_size, self.image_size),
        )

    def predict_dual(self, frame: np.ndarray, hand_side: str = "left"):
        """The image_demo path: original + horizontally flipped frame in one
        batch of 2 (flipped input treated as the opposite side).  Same
        one-put/one-get transfer batching as :meth:`predict`."""
        import jax

        side_idx = 0 if hand_side == "right" else 1
        frames, sides, flips = jax.device_put((
            np.stack([frame, frame]),
            np.asarray([side_idx, 1 - side_idx], np.int32),
            np.asarray([False, True]),
        ))
        out = self._infer(self._variables, frames, sides, flips)
        return jax.device_get(out)


def _load_faces(mano_dir: str):
    if mano_dir == "synthetic":
        from obman_train_tpu.assets import synthetic_mano_assets

        return synthetic_mano_assets("right").faces
    from obman_train_tpu.assets import load_mano_assets

    return load_mano_assets(mano_dir, "right").faces
