"""Import a reference (PyTorch) HandNet checkpoint into this framework.

Takes a ``checkpoint.pth.tar`` produced by hassony2/obman_train (plus its
``opt.pkl``-style settings supplied as CLI flags), maps the weights onto the
flax model (train/checkpoint.import_torch_handnet) and saves an orbax
checkpoint + opt.json that every CLI here can consume:

  python -m obman_train_tpu.cli.import_torch \
      --torch_checkpoint release_models/obman/checkpoint.pth.tar \
      --mano_assets misc/mano --resnet_version 18 --mano_comps 30 \
      --atlas_predict_trans --atlas_predict_scale --exp_id checkpoints/ported
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_checkpoint", required=True)
    parser.add_argument("--exp_id", required=True)
    parser.add_argument("--mano_assets", default="misc/mano")
    parser.add_argument("--resnet_version", type=int, default=18)
    parser.add_argument("--mano_comps", type=int, default=30,
                        help="release demo models use 30 (reload.py:93)")
    parser.add_argument("--hidden_neurons", nargs="+", type=int,
                        default=[1024, 256])
    parser.add_argument("--mano_use_shape", action="store_true")
    parser.add_argument("--atlas_predict_trans", action="store_true")
    parser.add_argument("--atlas_predict_scale", action="store_true")
    parser.add_argument("--atlas_separate_encoder", action="store_true")
    parser.add_argument("--atlas_resume_remap", action="store_true",
                        help="remap base_net.* to atlas_base_net.*")
    parser.add_argument("--opt_pkl", default=None,
                        help="reference opt.pkl beside the checkpoint; when "
                        "given (or auto-detected next to the checkpoint) the "
                        "model flags above are filled from it with the "
                        "reference's backfill defaults (reload.py:42-100)")
    args = parser.parse_args(argv)

    import numpy as np
    import torch

    opt_pkl = args.opt_pkl
    if opt_pkl is None:
        candidate = os.path.join(
            os.path.dirname(os.path.abspath(args.torch_checkpoint)), "opt.pkl"
        )
        if os.path.exists(candidate):
            opt_pkl = candidate
    if opt_pkl:
        import pickle
        import sys

        with open(opt_pkl, "rb") as f:
            opts = pickle.load(f)
        if not isinstance(opts, dict):  # argparse.Namespace in old pickles
            opts = vars(opts)
        # reference backfill defaults for old checkpoints (reload.py:42-72);
        # an EXPLICIT CLI flag wins over the pkl (the repo's CLI-wins rule)
        raw = argv if argv is not None else sys.argv[1:]
        explicit = {a.split("=", 1)[0] for a in raw if a.startswith("--")}
        get = lambda k, d: opts.get(k, d)

        def fill(name, value):
            if f"--{name}" not in explicit:
                setattr(args, name, value)

        fill("resnet_version", int(get("resnet_version", 18)))
        # ncomps is absent from old release pkls; the release models use 30
        # (reload.py:93) — honor it when recorded
        fill("mano_comps", int(get("mano_comps", 30)))
        fill("hidden_neurons", list(get("hidden_neurons", [1024, 256])))
        fill("mano_use_shape", bool(get("use_shape", args.mano_use_shape)))
        fill("atlas_predict_trans", bool(get("atlas_predict_trans", False)))
        fill("atlas_predict_scale", bool(get("atlas_predict_scale", False)))
        fill(
            "atlas_separate_encoder",
            bool(get("atlas_separate_encoder", False)),
        )
        args.mano_lambda_joints2d = get("mano_lambda_joints2d", 0) or None
        args.absolute_lambda = get("absolute_lambda", 0) or None
        print(f"Filled model flags from {opt_pkl}")
    else:
        args.mano_lambda_joints2d = None
        args.absolute_lambda = None

    from obman_train_tpu.cli.traineval import load_mano_pair
    from obman_train_tpu.config import (
        AtlasConfig,
        ExperimentConfig,
        ManoConfig,
        ModelConfig,
    )
    from obman_train_tpu.models import BatchSpec, build_handnet
    from obman_train_tpu.train import create_train_state, make_optimizer
    from obman_train_tpu.train.checkpoint import (
        import_torch_handnet,
        save_checkpoint,
    )

    cfg = ExperimentConfig(
        exp_id=args.exp_id,
        mano_assets=args.mano_assets,
        model=ModelConfig(
            resnet_version=args.resnet_version,
            absolute_lambda=args.absolute_lambda,
            mano=ManoConfig(
                ncomps=args.mano_comps,
                base_neurons=tuple(args.hidden_neurons),
                use_shape=args.mano_use_shape,
                lambda_joints2d=args.mano_lambda_joints2d,
            ),
            atlas=AtlasConfig(
                predict_trans=args.atlas_predict_trans,
                predict_scale=args.atlas_predict_scale,
                separate_encoder=args.atlas_separate_encoder,
            ),
        ),
    )
    net = build_handnet(cfg.model, *load_mano_pair(cfg.mano_assets))
    spec = BatchSpec(
        has_joints3d=False, has_verts3d=False, has_objpoints3d=False,
        has_camintrs=False, has_center3d=False,
    )
    dummy = {
        "images": np.zeros((1, cfg.model.image_size, cfg.model.image_size, 3),
                           np.float32),
        "sides": np.zeros((1,), np.int32),
    }
    tx = make_optimizer(cfg.train)
    state = create_train_state(
        net, tx, dummy, spec, no_loss=True, force_hand=True,
        force_objects=True,
    )

    payload = torch.load(args.torch_checkpoint, map_location="cpu",
                         weights_only=False)
    state_dict = payload.get("state_dict", payload)
    state_np = {k: v.numpy() for k, v in state_dict.items()
                if hasattr(v, "numpy")}
    epoch = int(payload.get("epoch", 0))

    variables = import_torch_handnet(
        state_np,
        {"params": state.params, "batch_stats": state.batch_stats},
        atlas_resume=args.atlas_resume_remap,
    )
    state = state._replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    path = save_checkpoint(args.exp_id, state, epoch, config=cfg)
    print(f"Imported {len(state_np)} torch tensors from epoch {epoch} "
          f"-> {path}")
    print(f"Use it with: --resume {args.exp_id} or DemoModel('{args.exp_id}')")
    return state


if __name__ == "__main__":
    main()
