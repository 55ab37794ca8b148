"""Re-assert the committed multi-epoch convergence artifact.

tools/convergence_run.py runs the FULL training recipe (StepLR decay,
edge-regul decay, per-epoch val PCK/EPE/AUC, best-checkpoint selection —
reference traineval.py:286-404) for ~20 epochs on the hermetic synthetic
dataset and commits the distilled evidence under docs/convergence/.  This
test keeps that artifact honest: the committed summary must exist, its
internal checks must all have passed, and its numbers must be mutually
consistent (AUC trajectory really improves, the best checkpoint really is
the AUC argmax, the lr schedule really decays).

Regenerate with:  OBMAN_PLATFORM=cpu python tools/convergence_run.py
"""

import json
import os

import pytest

pytestmark = pytest.mark.fast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "convergence")


@pytest.fixture(scope="module")
def summary():
    path = os.path.join(OUT, "summary.json")
    assert os.path.exists(path), (
        "docs/convergence/summary.json missing — run "
        "`OBMAN_PLATFORM=cpu python tools/convergence_run.py` and commit "
        "the artifact"
    )
    with open(path) as f:
        return json.load(f)


def test_all_recipe_checks_passed(summary):
    failed = [k for k, ok in summary["checks"].items() if not ok]
    assert not failed, f"convergence artifact checks failed: {failed}"


def test_auc_trajectory_improves(summary):
    auc = {int(e): v for e, v in summary["val_auc_by_epoch"].items()}
    epochs = sorted(auc)
    assert len(epochs) >= 10, "artifact should cover a multi-epoch run"
    assert auc[epochs[-1]] > auc[epochs[0]]
    assert max(auc.values()) > auc[epochs[0]]


def test_best_checkpoint_is_auc_argmax(summary):
    auc = {int(e): v for e, v in summary["val_auc_by_epoch"].items()}
    argmax = max(sorted(auc), key=lambda e: auc[e])
    assert summary["best_epoch_from_checkpoint"] == argmax
    assert summary["best_epoch_from_auc"] == argmax


def test_lr_schedule_decayed(summary):
    lr = {int(e): v for e, v in summary["scheduled_lr_by_epoch"].items()}
    epochs = sorted(lr)
    assert lr[epochs[-1]] < lr[epochs[0]]
    # StepLR: piecewise-constant, non-increasing
    assert all(lr[b] <= lr[a] for a, b in zip(epochs, epochs[1:]))


def test_regul_scale_decayed(summary):
    rs = {int(e): v for e, v in summary["regul_scale_by_epoch"].items()}
    epochs = sorted(rs)
    assert rs[epochs[-1]] < rs[epochs[0]]


def test_metrics_json_backs_the_summary(summary):
    with open(os.path.join(OUT, "metrics.json")) as f:
        metrics = json.load(f)
    for e, v in summary["val_auc_by_epoch"].items():
        assert metrics["auc"]["val"][e] == pytest.approx(v)
