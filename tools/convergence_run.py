"""Multi-epoch convergence artifact: run the FULL training recipe on the
hermetic synthetic dataset and distill the evidence into committed files.

The engine tests are step- or single-epoch-level; this proves the whole
recipe of the reference's traineval loop (reference traineval.py:286-404)
end to end over many epochs: StepLR decay, edge-regularizer decay,
per-epoch val PCK/EPE/AUC, and best-checkpoint selection on val AUC.

Writes (committed under docs/convergence/):
  metrics.json   the run's Monitor output (per-epoch train/val series)
  summary.json   distilled evidence: AUC trajectory, scheduled lr by
                 epoch, regul-scale trajectory, best epoch (read from the
                 model_best checkpoint, cross-checked against the AUC
                 argmax), and the assertion results
  auc.png        the val AUC curve

tests/test_convergence_artifact.py re-asserts the committed artifact.

    python tools/convergence_run.py                      # real TPU, ~15 min
    OBMAN_PLATFORM=cpu python tools/convergence_run.py   # hermetic, hours
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "convergence")

EPOCHS = int(os.environ.get("OBMAN_CONV_EPOCHS", 40))
LR_DECAY_STEP = int(os.environ.get("OBMAN_CONV_LR_STEP", 15))
LR = os.environ.get("OBMAN_CONV_LR", "1e-3")
# 2560 samples x 40 epochs = 6,400 optimizer steps: a from-scratch
# ResNet-18 needs thousands of steps before val EPE enters the 0-50 mm
# PCK band where AUC visibly climbs (640x40 = 1,600 steps left the AUC
# curve nearly flat).  Val scenes are disjoint from train
# (data/synthetic.py split-seeded streams), so the curve is generalization.
ARGS = [
    "--train_datasets", "synthetic", "--val_datasets", "synthetic",
    "--mano_assets", "synthetic",
    "--synthetic_size", os.environ.get("OBMAN_CONV_SIZE", "2560"),
    "--epochs", str(EPOCHS),
    "--train_batch", "16", "--test_batch", "16",
    "--atlas_predict_trans", "--atlas_predict_scale",
    "--atlas_lambda_regul_edges", "0.167",
    "--lr", LR,
    "--lr_decay_step", str(LR_DECAY_STEP), "--lr_decay_gamma", "0.5",
    "--regul_decay_step", "1", "--regul_decay_gamma", "0.9",
    "--display_freq", "0", "--epoch_display_freq", "1000",
    "--manual_seed", "0",
    # The reference's own default: --freeze_batchnorm is store_true/False
    # (nets3dopts.py:176).  Frozen BN only makes sense with ImageNet
    # running stats; from scratch it pins random init statistics.
    "--no_freeze_batchnorm",
]


def _read_best_epoch(exp_dir: str) -> int:
    """The epoch stored in model_best (orbax raw restore, host-side)."""
    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(
        os.path.join(exp_dir, "model_best")
    )
    return int(payload["epoch"])


def main() -> int:
    exp_dir = os.path.join(OUT, "run")
    shutil.rmtree(exp_dir, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)

    # Honor OBMAN_PLATFORM as-is: unset runs on the default backend (the
    # real TPU when present — a 40-epoch run is minutes there vs hours on
    # the 1-core CPU host); OBMAN_PLATFORM=cpu forces the hermetic path.
    env = dict(os.environ)
    cmd = [sys.executable, "-u", "-m", "obman_train_tpu.cli.traineval",
           "--exp_id", exp_dir] + ARGS
    print("running:", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)

    with open(os.path.join(exp_dir, "metrics.json")) as f:
        metrics = json.load(f)
    auc = {int(e): v for e, v in metrics["auc"]["val"].items()}
    epochs = sorted(auc)
    best_epoch_ckpt = _read_best_epoch(exp_dir)
    best_epoch_auc = max(epochs, key=lambda e: auc[e])

    # Scheduled lr by epoch (StepLR on the epoch counter, train/steps.py)
    lr0, gamma = float(LR), 0.5
    lr_by_epoch = {
        e: lr0 * gamma ** ((e - 1) // LR_DECAY_STEP) for e in epochs
    }
    regul_by_epoch = {e: 0.9 ** e for e in epochs}

    checks = {
        "auc_improves": auc[epochs[-1]] > auc[epochs[0]],
        "best_auc_improves_on_first": auc[best_epoch_auc] > auc[epochs[0]],
        "best_ckpt_matches_auc_argmax": best_epoch_ckpt == best_epoch_auc,
        "lr_decayed": lr_by_epoch[epochs[-1]] < lr_by_epoch[epochs[0]],
    }
    summary = {
        "args": ARGS,
        "epochs": epochs,
        "val_auc_by_epoch": {str(e): auc[e] for e in epochs},
        "val_epe_by_epoch": {
            str(e): metrics["epe_mean"]["val"][str(e)]
            for e in epochs if str(e) in metrics.get("epe_mean", {}).get("val", {})
        },
        "scheduled_lr_by_epoch": {str(e): lr_by_epoch[e] for e in epochs},
        "regul_scale_by_epoch": {str(e): regul_by_epoch[e] for e in epochs},
        "best_epoch_from_checkpoint": best_epoch_ckpt,
        "best_epoch_from_auc": best_epoch_auc,
        "checks": checks,
    }
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    shutil.copy(os.path.join(exp_dir, "metrics.json"),
                os.path.join(OUT, "metrics.json"))
    auc_png = os.path.join(exp_dir, "plots", "auc.png")
    if os.path.exists(auc_png):
        shutil.copy(auc_png, os.path.join(OUT, "auc.png"))

    epe = {int(e): v for e, v in summary["val_epe_by_epoch"].items()}
    readme = f"""# Multi-epoch convergence artifact

One `traineval` run of the FULL training recipe (StepLR decay,
edge-regularizer decay, per-epoch val PCK/EPE/AUC, best-checkpoint
selection on val AUC — reference traineval.py:286-404) on the hermetic
synthetic dataset, val scenes disjoint from train
(`data/synthetic.py` split-seeded streams).

| | epoch {epochs[0]} | epoch {epochs[-1]} | best (epoch {best_epoch_auc}) |
|---|---|---|---|
| val AUC (PCK 0-50 mm) | {auc[epochs[0]]:.3f} | {auc[epochs[-1]]:.3f} | {auc[best_epoch_auc]:.3f} |
| val EPE mean (mm) | {epe.get(epochs[0], float("nan")):.1f} | {epe.get(epochs[-1], float("nan")):.1f} | {epe.get(best_epoch_auc, float("nan")):.1f} |

Recipe checks (asserted by `tests/test_convergence_artifact.py`):
{json.dumps(checks, indent=1)}

Regenerate with `python tools/convergence_run.py` (real TPU; add
`OBMAN_PLATFORM=cpu` for the hermetic-but-slow path).  `summary.json`
carries the full per-epoch trajectories; `metrics.json` is the run's
raw Monitor output; `auc.png` is the val-AUC curve.
"""
    with open(os.path.join(OUT, "README.md"), "w") as f:
        f.write(readme)

    print(json.dumps(checks, indent=1))
    failed = [k for k, ok in checks.items() if not ok]
    if failed:
        print("FAILED checks:", failed, file=sys.stderr)
        return 1
    print(f"artifact written to {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
