"""Dataset sanity-inspection harnesses.

Headless (save-to-file) equivalents of the reference's interactive
``HandDataset.visualize_original / visualize_transformed /
visualize_3d_transformed / visualize_3d_proj`` plots
(handobjectdatasets/handataset.py:425-629) — the visual QA workflow used to
validate new dataset adapters and augmentation settings.

Each function takes the wrapped :class:`HandDataset`, a sample index, and a
path; it returns the path after writing a PNG.
"""

from __future__ import annotations

import numpy as np

from obman_train_tpu.data.queries import BaseQueries, TransQueries


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _available(dataset, queries):
    return [q for q in queries if q in dataset.pose_dataset.all_queries]


def visualize_original(dataset, idx: int, save_path: str) -> str:
    """Raw image + annotated 2D joints / object points
    (reference handataset.py:425-459)."""
    from obman_train_tpu.visualize.viz2d import visualize_joints_2d

    plt = _plt()
    queries = _available(
        dataset,
        [
            BaseQueries.sides, BaseQueries.images, BaseQueries.joints2d,
            BaseQueries.objpoints2d,
        ],
    )
    sample = dataset.get_sample(idx, query=queries)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(np.asarray(sample[BaseQueries.images]))
    if BaseQueries.sides in sample:
        ax.set_title(f"{sample[BaseQueries.sides]} hand")
    if BaseQueries.joints2d in sample:
        visualize_joints_2d(ax, np.asarray(sample[BaseQueries.joints2d]))
    if BaseQueries.objpoints2d in sample:
        pts = np.asarray(sample[BaseQueries.objpoints2d])
        ax.scatter(pts[:, 0], pts[:, 1], alpha=0.05, s=2)
    ax.axis("off")
    fig.savefig(save_path, dpi=90)
    plt.close(fig)
    return save_path


def _transformed_image(sample):
    img = np.asarray(sample[TransQueries.images])
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return np.clip(img + 0.5, 0, 1)


def visualize_transformed(dataset, idx: int, save_path: str) -> str:
    """Augmented crop + transformed 2D joints
    (reference handataset.py:576-629)."""
    from obman_train_tpu.visualize.viz2d import visualize_joints_2d

    plt = _plt()
    queries = [TransQueries.images] + _available(
        dataset, [BaseQueries.sides, TransQueries.joints2d]
    )
    sample = dataset.get_sample(idx, query=queries)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(_transformed_image(sample))
    if BaseQueries.sides in sample:
        ax.set_title(f"{sample[BaseQueries.sides]} hand (transformed)")
    if TransQueries.joints2d in sample:
        visualize_joints_2d(ax, np.asarray(sample[TransQueries.joints2d]))
    ax.axis("off")
    fig.savefig(save_path, dpi=90)
    plt.close(fig)
    return save_path


def visualize_3d_transformed(dataset, idx: int, save_path: str) -> str:
    """3D scatter of the transformed joints/verts/object points
    (reference handataset.py:532-574)."""
    plt = _plt()
    queries = _available(
        dataset,
        [TransQueries.joints3d, TransQueries.verts3d, TransQueries.objpoints3d],
    )
    sample = dataset.get_sample(idx, query=queries)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    if TransQueries.verts3d in sample:
        v = np.asarray(sample[TransQueries.verts3d])
        ax.scatter(v[:, 0], v[:, 1], v[:, 2], s=1, alpha=0.3, label="hand verts")
    if TransQueries.joints3d in sample:
        j = np.asarray(sample[TransQueries.joints3d])
        ax.scatter(j[:, 0], j[:, 1], j[:, 2], s=20, c="r", label="joints")
    if TransQueries.objpoints3d in sample:
        o = np.asarray(sample[TransQueries.objpoints3d])
        ax.scatter(o[:, 0], o[:, 1], o[:, 2], s=1, alpha=0.3, c="g",
                   label="object")
    ax.legend(loc="upper right")
    fig.savefig(save_path, dpi=90)
    plt.close(fig)
    return save_path


def visualize_3d_proj(dataset, idx: int, save_path: str) -> str:
    """Crop + the three axis projections of the transformed 3D annotations
    (reference handataset.py:493-530)."""
    from obman_train_tpu.visualize.viz2d import visualize_joints_2d

    plt = _plt()
    queries = [TransQueries.images] + _available(
        dataset,
        [
            TransQueries.joints3d, TransQueries.verts3d,
            TransQueries.objpoints3d, TransQueries.joints2d,
        ],
    )
    sample = dataset.get_sample(idx, query=queries)
    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    axes[0].imshow(_transformed_image(sample))
    if TransQueries.joints2d in sample:
        visualize_joints_2d(axes[0], np.asarray(sample[TransQueries.joints2d]))
    axes[0].axis("off")
    for ax, (i, j, label) in zip(
        axes[1:], [(0, 1, "xy"), (0, 2, "xz"), (1, 2, "yz")]
    ):
        for q, color, size in [
            (TransQueries.verts3d, "b", 1),
            (TransQueries.objpoints3d, "g", 1),
            (TransQueries.joints3d, "r", 12),
        ]:
            if q in sample:
                pts = np.asarray(sample[q])
                ax.scatter(pts[:, i], pts[:, j], s=size, c=color, alpha=0.4)
        ax.set_title(label)
        ax.set_aspect("equal", "box")
        if label == "xy":
            ax.invert_yaxis()
    fig.savefig(save_path, dpi=90)
    plt.close(fig)
    return save_path
