"""Streaming video/webcam demo (reference: webcam_demo.py).

Sources: a webcam (cv2, if installed), a video file (cv2), or a directory of
frames (PIL — works in this image).  Frames are batched (``--batch``) and
preprocessing runs on-device fused with the model (ops/image.py), which
removes the matplotlib-render bottleneck the reference acknowledges
(README.md:116): rendering here is optional and off the hot path.

  python -m obman_train_tpu.cli.video_demo --frames_dir demo_frames/ \
      --resume checkpoints/exp --out_dir video_out/
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def iter_frames(args):
    if args.frames_dir:
        from PIL import Image

        names = sorted(os.listdir(args.frames_dir))
        for name in names:
            path = os.path.join(args.frames_dir, name)
            yield name, np.asarray(Image.open(path).convert("RGB"))
    else:
        try:
            import cv2
        except ImportError as e:
            raise SystemExit(
                "cv2 unavailable: use --frames_dir with extracted frames"
            ) from e
        cap = cv2.VideoCapture(args.video if args.video else 0)
        idx = 0
        while True:
            ret, bgr = cap.read()
            if not ret:
                break
            yield f"frame_{idx:06d}", bgr[:, :, ::-1]
            idx += 1


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames_dir", default=None)
    parser.add_argument("--video", default=None)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--mano_assets", default=None)
    parser.add_argument("--hand_side", default="left", choices=["left", "right"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--out_dir", default="video_demo_out")
    parser.add_argument("--render", action="store_true",
                        help="render mesh overlays (slow, host-side)")
    parser.add_argument("--attention", action="store_true")
    parser.add_argument("--max_frames", type=int, default=None)
    args = parser.parse_args(argv)

    from obman_train_tpu.demo import DemoModel

    if args.resume is None:
        from obman_train_tpu.config import ExperimentConfig

        model = DemoModel(
            config=ExperimentConfig(), mano_assets=args.mano_assets or "synthetic"
        )
    else:
        model = DemoModel(exp_dir=args.resume, mano_assets=args.mano_assets)

    os.makedirs(args.out_dir, exist_ok=True)
    names, frames = [], []
    n_done, t0 = 0, time.perf_counter()

    def flush():
        nonlocal n_done
        if not frames:
            return
        import jax.numpy as jnp

        # Pad the tail batch to keep shapes static.
        pad = args.batch - len(frames)
        stack = np.stack(frames + [frames[-1]] * pad)
        sides = jnp.full((len(stack),), 0 if args.hand_side == "right" else 1,
                         np.int32)
        out = model._infer(
            model._variables, jnp.asarray(stack), sides,
            jnp.zeros((len(stack),), bool),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        att = None
        if args.attention:
            from obman_train_tpu.demo.attention import attention_overlay
            from obman_train_tpu.demo.preprocess import preprocess_frame

            att = model.attention_maps(stack)
        for i, name in enumerate(names):
            if att is not None:
                small = preprocess_frame(frames[i], model.image_size)
                blended = attention_overlay(small, att[i])
                from PIL import Image

                Image.fromarray(blended).save(
                    os.path.join(args.out_dir, f"{name}_attention.png")
                )
            np.savez(
                os.path.join(args.out_dir, f"{name}.npz"),
                verts=out["verts"][i], joints=out["joints"][i],
                **(
                    {"objpoints3d": out["objpoints3d"][i]}
                    if "objpoints3d" in out
                    else {}
                ),
            )
            if args.render:
                _render(args, model, frames[i], out, i, name)
        n_done += len(names)
        names.clear()
        frames.clear()

    for name, frame in iter_frames(args):
        names.append(name)
        frames.append(frame)
        if len(frames) == args.batch:
            flush()
        if args.max_frames and n_done + len(frames) >= args.max_frames:
            break
    flush()
    dt = time.perf_counter() - t0
    print(f"Processed {n_done} frames in {dt:.2f}s ({n_done / max(dt, 1e-9):.1f} fps incl. IO)")


def _render(args, model, frame, out, i, name):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from obman_train_tpu.visualize.displaymano import add_mesh

    fig = plt.figure(figsize=(8, 4))
    ax = fig.add_subplot(1, 2, 1)
    ax.imshow(frame)
    if "joints2d" in out:
        from obman_train_tpu.visualize.viz2d import visualize_joints_2d

        # joints2d are in crop coordinates; scale to the raw frame's square
        scale = min(frame.shape[:2]) / model.image_size
        off_x = (frame.shape[1] - min(frame.shape[:2])) / 2
        off_y = (frame.shape[0] - min(frame.shape[:2])) / 2
        j2d = out["joints2d"][i] * scale + [off_x, off_y]
        visualize_joints_2d(ax, j2d)
    ax.axis("off")
    ax = fig.add_subplot(1, 2, 2, projection="3d")
    add_mesh(ax, out["verts"][i], model.hand_faces, c="b")
    if "objpoints3d" in out:
        add_mesh(ax, out["objpoints3d"][i], model.obj_faces, c="r")
    ax.axis("off")
    fig.savefig(os.path.join(args.out_dir, f"{name}.png"), dpi=80)
    plt.close(fig)


if __name__ == "__main__":
    main()
