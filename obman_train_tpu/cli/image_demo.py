"""Single-image inference demo (reference: image_demo.py).

Runs the flipped + unflipped frame as one batch of 2 and renders the
predicted hand/object meshes and 2D joints to a PNG.

  python -m obman_train_tpu.cli.image_demo --image path.jpg \
      --resume checkpoints/exp --output demo_out.png
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--resume", default=None,
                        help="experiment dir with opt.json + checkpoint")
    parser.add_argument("--from_export", default=None,
                        help="serve from a cli.export artifact (skips "
                        "checkpoint restore and jit compile at startup; "
                        "needs the artifact's .meta.json sidecar)")
    parser.add_argument("--output", default="image_demo_out.png")
    parser.add_argument("--hand_side", default="left",
                        choices=["left", "right"])
    parser.add_argument("--mano_assets", default=None)
    parser.add_argument("--no_flip", action="store_true")
    args = parser.parse_args(argv)

    from PIL import Image

    from obman_train_tpu.cli import apply_platform_override
    from obman_train_tpu.utils.compcache import enable_persistent_cache

    apply_platform_override()
    # Fresh-process first-frame is compile-dominated (200+ s measured on
    # the tunneled TPU); the persistent cache makes every process after
    # the first skip it.  OBMAN_COMPCACHE=0 disables.
    enable_persistent_cache()

    if args.from_export is not None:
        from obman_train_tpu.demo.export import ExportedModel

        model = ExportedModel(args.from_export)
    else:
        from obman_train_tpu.demo import DemoModel

        if args.resume is None:
            from obman_train_tpu.config import ExperimentConfig

            model = DemoModel(
                config=ExperimentConfig(),
                mano_assets=args.mano_assets or "synthetic",
            )
        else:
            model = DemoModel(exp_dir=args.resume, mano_assets=args.mano_assets)

    frame = np.asarray(Image.open(args.image).convert("RGB"))
    if args.no_flip:
        results = model.predict(frame, hand_side=args.hand_side)
    else:
        results = model.predict_dual(frame, hand_side=args.hand_side)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from obman_train_tpu.visualize.displaymano import add_mesh

    n = results["verts"].shape[0]
    fig = plt.figure(figsize=(4 * (n + 1), 4))
    ax = fig.add_subplot(1, n + 1, 1)
    ax.imshow(frame)
    ax.set_title("input")
    ax.axis("off")
    for i in range(n):
        ax = fig.add_subplot(1, n + 1, i + 2, projection="3d")
        add_mesh(ax, results["verts"][i], model.hand_faces, c="b")
        if "objpoints3d" in results:
            add_mesh(ax, results["objpoints3d"][i], model.obj_faces, c="r")
        ax.set_title(["unflipped", "flipped"][i] if n == 2 else "pred")
        ax.axis("off")
    fig.savefig(args.output, dpi=100)
    print(f"Saved {args.output}")
    print(
        "verts", results["verts"].shape,
        "joints", results["joints"].shape,
        "obj", results.get("objpoints3d", np.zeros(())).shape,
    )
    return results


if __name__ == "__main__":
    main()
