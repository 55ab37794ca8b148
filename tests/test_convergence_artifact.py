"""Re-assert the committed multi-epoch convergence artifact.

tools/convergence_run.py runs the FULL flagship recipe (StepLR decay,
edge-regul decay, contact + collision losses at the reference defaults,
per-epoch val PCK/EPE/AUC, best-checkpoint selection — reference
traineval.py:286-404 + nets3dopts.py:36-222) for ~40 epochs on the
hermetic synthetic dataset and commits the distilled evidence under
docs/convergence/.  This test keeps that artifact honest: the committed
summary must exist, its internal checks must all have passed, and its
numbers must be mutually consistent (AUC trajectory really improves, the
best checkpoint really is the AUC argmax, the LOGGED lr — the schedule
the run actually applied, not a formula — really decays and matches the
intended StepLR, and the contact trajectories really were exercised).

Regenerate with:  python tools/convergence_run.py   (real TPU)
"""

import json
import math
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
        "`python tools/convergence_run.py` and commit the artifact"
    )
    with open(path) as f:
        return json.load(f)


def test_all_recipe_checks_passed(summary):
    failed = [k for k, ok in summary["checks"].items() if not ok]
    assert not failed, f"convergence artifact checks failed: {failed}"


def test_recipe_includes_contact_losses(summary):
    args = summary["args"]
    assert "--contact_lambda" in args and "--collision_lambda" in args, (
        "the convergence artifact must run the flagship contact recipe"
    )
    assert float(args[args.index("--contact_lambda") + 1]) > 0
    assert float(args[args.index("--collision_lambda") + 1]) > 0


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


def test_logged_lr_decayed_and_matches_intended(summary):
    lr = {int(e): v for e, v in summary["logged_lr_by_epoch"].items()}
    epochs = sorted(lr)
    assert lr[epochs[-1]] < lr[epochs[0]]
    # StepLR: piecewise-constant, non-increasing
    assert all(lr[b] <= lr[a] for a, b in zip(epochs, epochs[1:]))
    intended = summary["intended_lr_by_epoch"]
    for e in epochs:
        assert lr[e] == pytest.approx(intended[str(e)], rel=1e-6), (
            f"epoch {e}: logged lr {lr[e]} != intended StepLR "
            f"{intended[str(e)]} — the loop's schedule wiring drifted"
        )


def test_logged_regul_scale_decayed(summary):
    rs = {int(e): v for e, v in summary["logged_regul_scale_by_epoch"].items()}
    epochs = sorted(rs)
    assert rs[epochs[-1]] < rs[epochs[0]]
    # the value USED in epoch e (decay applies after the epoch): 0.9**(e-1)
    for e in epochs:
        assert rs[e] == pytest.approx(0.9 ** (e - 1), rel=1e-5)


def test_contact_trajectories_present_and_finite(summary):
    epochs = summary["epochs"]
    for key in ("val_contact_auc_by_epoch", "val_max_penetr_by_epoch",
                "val_mean_penetr_by_epoch"):
        series = summary[key]
        assert len(series) == len(epochs), f"{key} missing epochs"
        assert all(math.isfinite(v) for v in series.values()), key


def test_contact_terms_fired(summary):
    attr = summary["val_attraction_loss_by_epoch"]
    pen = summary["val_penetration_loss_by_epoch"]
    assert any(v > 0 for v in attr.values()), (
        "attraction never fired — the recipe saw no near-contacts"
    )
    assert any(v > 0 for v in pen.values()), (
        "repulsion never fired — the recipe saw no penetrations"
    )


def test_metrics_json_backs_the_summary(summary):
    with open(os.path.join(OUT, "metrics.json")) as f:
        metrics = json.load(f)
    for e, v in summary["val_auc_by_epoch"].items():
        assert metrics["auc"]["val"][e] == pytest.approx(v)
    for e, v in summary["logged_lr_by_epoch"].items():
        assert metrics["lr"]["train"][e] == pytest.approx(v)
