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

    OBMAN_PLATFORM=cpu python tools/convergence_run.py   # ~15-30 min CPU
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "convergence")

EPOCHS = int(os.environ.get("OBMAN_CONV_EPOCHS", 20))
LR_DECAY_STEP = int(os.environ.get("OBMAN_CONV_LR_STEP", 8))
ARGS = [
    "--train_datasets", "synthetic", "--val_datasets", "synthetic",
    "--mano_assets", "synthetic",
    "--synthetic_size", os.environ.get("OBMAN_CONV_SIZE", "160"),
    "--epochs", str(EPOCHS),
    "--train_batch", "16", "--test_batch", "16",
    "--atlas_predict_trans", "--atlas_predict_scale",
    "--atlas_lambda_regul_edges", "0.167",
    "--lr", "5e-4",
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

    env = dict(os.environ)
    env.setdefault("OBMAN_PLATFORM", "cpu")
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
    lr0, gamma = 5e-4, 0.5
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

    print(json.dumps(checks, indent=1))
    failed = [k for k, ok in checks.items() if not ok]
    if failed:
        print("FAILED checks:", failed, file=sys.stderr)
        return 1
    print(f"artifact written to {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
