"""Score-sorted sample triage.

Equivalent of the reference's notebook triage tooling
(mano_train/visualize/jupytervis.py:21-402): rank evaluated samples by a
score (e.g. per-sample chamfer or joint error), render best / median /
worst grids, and export meshes for inspection — headless, from the saved
``batch_*.pkl`` result dumps instead of a live notebook session.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def score_samples(samples: List[Dict], metric: str = "chamfer") -> np.ndarray:
    """Per-sample scalar scores (lower is better)."""
    scores = []
    for s in samples:
        if metric == "chamfer" and "gt_objpoints3d" in s:
            from obman_train_tpu.ops.chamfer import chamfer_loss

            import jax.numpy as jnp

            l1, l2 = chamfer_loss(
                jnp.asarray(s["obj_verts"])[None],
                jnp.asarray(s["gt_objpoints3d"])[None],
            )
            scores.append(float(l1[0] + l2[0]))
        elif metric == "max_depth":
            scores.append(float(s.get("max_depth", 0.0)))
        else:
            scores.append(0.0)
    return np.asarray(scores)


def load_eval_samples(results_dir: str) -> List[Dict]:
    """Load all saved batches; attach GT object points when present."""
    import pickle

    from obman_train_tpu.simulation.savemano import load_batch_info

    samples: List[Dict] = []
    for name in sorted(os.listdir(results_dir)):
        if not (name.startswith("batch_") and name.endswith(".pkl")):
            continue
        path = os.path.join(results_dir, name)
        batch_samples = load_batch_info(path, compute_depth=False)
        with open(path, "rb") as f:
            payload = pickle.load(f)
        gt_obj = payload["batch"].get("objpoints3d")
        gt_img = payload["batch"].get("images")
        for i, s in enumerate(batch_samples):
            if gt_obj is not None:
                s["gt_objpoints3d"] = np.asarray(gt_obj[i])
            if gt_img is not None:
                s["image"] = np.asarray(gt_img[i])
            samples.append(s)
    return samples


def triage(
    results_dir: str,
    out_dir: Optional[str] = None,
    metric: str = "chamfer",
    n_show: int = 3,
    export_meshes: bool = False,
):
    """Render best/median/worst sample grids; optionally export OBJ meshes.

    Returns {"best": idxs, "median": idxs, "worst": idxs, "scores": array}.
    """
    samples = load_eval_samples(results_dir)
    if not samples:
        raise ValueError(f"no saved batches under {results_dir}")
    scores = score_samples(samples, metric)
    order = np.argsort(scores)
    mid = len(order) // 2
    groups = {
        "best": order[:n_show],
        "median": order[max(0, mid - n_show // 2): max(0, mid - n_show // 2) + n_show],
        "worst": order[::-1][:n_show],
    }
    out_dir = out_dir or os.path.join(results_dir, "triage")
    os.makedirs(out_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from obman_train_tpu.visualize.displaymano import add_mesh

    for group, idxs in groups.items():
        fig = plt.figure(figsize=(4 * len(idxs), 5))
        for col, idx in enumerate(idxs):
            s = samples[idx]
            ax = fig.add_subplot(1, len(idxs), col + 1, projection="3d")
            add_mesh(ax, s["hand_verts"], s["hand_faces"], c="b")
            if s.get("obj_faces") is not None:
                add_mesh(ax, s["obj_verts"], s["obj_faces"], c="r")
            ax.set_title(f"#{idx} {metric}={scores[idx]:.1f}")
            ax.axis("off")
            if export_meshes:
                from obman_train_tpu.simulation.savemano import save_obj

                save_obj(
                    os.path.join(out_dir, f"{group}_{idx}_hand.obj"),
                    s["hand_verts"], s["hand_faces"],
                )
                save_obj(
                    os.path.join(out_dir, f"{group}_{idx}_obj.obj"),
                    s["obj_verts"], s.get("obj_faces"),
                )
        fig.savefig(os.path.join(out_dir, f"{group}.png"), dpi=80)
        plt.close(fig)
        if len(idxs):
            from obman_train_tpu.visualize.html_mesh import export_sample_html

            s0 = samples[idxs[0]]
            export_sample_html(
                os.path.join(out_dir, f"{group}.html"),
                s0["hand_verts"], s0["hand_faces"],
                s0["obj_verts"], s0.get("obj_faces"),
            )
    return {**groups, "scores": scores}
