import numpy as np
import pytest

def test_bfloat16_encoder_path(rng):
    """bf16 compute dtype must keep MANO outputs f32 and losses finite."""
    import jax
    import jax.numpy as jnp

    from obman_train_tpu.assets import synthetic_mano_assets
    from obman_train_tpu.config import ModelConfig
    from obman_train_tpu.models import (
        BatchSpec,
        build_handnet,
        mano_params_from_assets,
    )
    from tests.test_models import make_batch

    cfg = ModelConfig(compute_dtype="bfloat16")
    net = build_handnet(
        cfg,
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    batch = make_batch(rng, B=2)
    spec = BatchSpec()
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, spec,
    )
    total, results, losses = net.apply(variables, batch, spec)
    assert results["verts"].dtype == jnp.float32
    assert np.isfinite(float(total))


@pytest.mark.fast
def test_host_preprocess(rng):
    from obman_train_tpu.demo.preprocess import prepare_input, preprocess_frame

    frame = rng.integers(0, 255, (480, 640, 3), np.uint8)
    out = preprocess_frame(frame, 256)
    assert out.shape == (256, 256, 3)
    prepared = prepare_input(out, flip_left_right=True, bgr=True)
    assert prepared.shape == (1, 256, 256, 3)
    assert prepared.min() >= -0.5 and prepared.max() <= 0.5


@pytest.mark.fast
def test_tables(tmp_path):
    import json

    from obman_train_tpu.utils.tables import (
        make_table,
        metric_direction,
        render_html,
        render_markdown,
    )

    assert metric_direction("auc") == "max"
    assert metric_direction("total_loss") == "min"
    assert metric_direction("epe_mean") == "min"
    exp = tmp_path / "exp1"
    exp.mkdir()
    metrics = {
        "auc": {"val": {"1": 0.2, "2": 0.5, "3": 0.4}},
        "total_loss": {"val": {"1": 10.0, "2": 5.0, "3": 7.0}},
    }
    with open(exp / "metrics.json", "w") as f:
        json.dump(metrics, f)
    rows = make_table([str(exp)])
    assert rows[0]["auc"] == 0.5 and rows[0]["auc@epoch"] == 2
    assert rows[0]["total_loss"] == 5.0 and rows[0]["total_loss@epoch"] == 2
    assert "0.5000" in render_markdown(rows)
    assert "<table" in render_html(rows)


@pytest.mark.fast
def test_log_line_roundtrip():
    from obman_train_tpu.utils.logging import format_log_line, parse_log_line

    line = format_log_line(7, {"total_loss": 1.5, "auc": 0.25})
    epoch, vals = parse_log_line(line)
    assert epoch == 7
    assert vals["total_loss"] == pytest.approx(1.5)
    assert vals["auc"] == pytest.approx(0.25)


@pytest.mark.fast
def test_eval_util_protocol(rng):
    from obman_train_tpu.train.metrics import EvalUtil

    ev = EvalUtil()
    gt = rng.normal(0, 30, (50, 21, 3))
    # predictions offset by exactly 10mm on one axis -> EPE 10, PCK step at 10
    pred = gt + np.array([10.0, 0, 0])
    ev.feed(gt, pred)
    epe_mean, _, epe_median, auc, pck, thresholds = ev.get_measures(0, 50, 20)
    assert epe_mean == pytest.approx(10.0)
    assert epe_median == pytest.approx(10.0)
    # PCK = 0 below 10mm, 1 above; AUC = fraction of [0,50] above 10mm
    assert pck[0] == 0.0 and pck[-1] == 1.0
    assert auc == pytest.approx((50 - 10) / 50, abs=0.04)
