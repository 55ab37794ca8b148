"""Export a trained model to a self-contained serving artifact.

    python -m obman_train_tpu.cli.export --resume checkpoints/exp \
        --out model.jaxexp --platforms tpu cpu

The artifact is the jitted uint8-RGB -> hand+object-mesh inference function
(device-fused preprocessing included, weights baked in) serialized as
versioned StableHLO via jax.export; load it anywhere with
``obman_train_tpu.demo.export.load_exported`` — no model code, config, or
checkpoint needed.  The reference has no ahead-of-time deployment path
(its demos re-instantiate the torch model from opt.pkl, reload.py:35-111).
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resume", required=True,
                   help="experiment dir (opt.json + checkpoint/)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--mano_assets", default=None,
                   help="override MANO asset dir ('synthetic' for testing)")
    p.add_argument("--image_size", type=int, default=None,
                   help="model input resolution (default: the experiment's "
                        "config.model.image_size)")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms (e.g. tpu cpu); default: "
                        "current backend")
    p.add_argument("--batch_size", type=int, default=None,
                   help="pin a static batch; default exports a symbolic "
                        "batch dimension (any batch size)")
    p.add_argument("--smoke", action="store_true",
                   help="reload the artifact and run one call (at the "
                        "pinned --batch_size, else batch 1) against the "
                        "live model as a consistency check")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import numpy as np

    from obman_train_tpu.cli import apply_platform_override

    apply_platform_override()

    from obman_train_tpu.demo.export import export_model, load_exported
    from obman_train_tpu.demo.inference import DemoModel

    model = DemoModel(
        exp_dir=args.resume,
        mano_assets=args.mano_assets,
        image_size=args.image_size,
    )
    info = export_model(
        model, args.out, platforms=args.platforms,
        batch_size=args.batch_size,
    )
    print(json.dumps(info))

    if args.smoke:
        serve = load_exported(args.out)
        # a static-batch artifact accepts only its pinned batch size
        b = args.batch_size or 1
        frame = np.zeros(
            (b, model.image_size, model.image_size, 3), np.uint8
        )
        sides = np.zeros((b,), np.int32)
        flip = np.zeros((b,), bool)
        out = serve(frame, sides, flip)
        live = model._infer(model._variables, frame, sides, flip)
        for k in live:
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(live[k]),
                rtol=1e-5, atol=2e-3,
            )
        print(f"smoke OK: exported == live on {sorted(live)}")


if __name__ == "__main__":
    main()
