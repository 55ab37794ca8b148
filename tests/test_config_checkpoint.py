import numpy as np
import pytest

from obman_train_tpu.config import (
    AtlasConfig,
    ExperimentConfig,
    ManoConfig,
    ModelConfig,
    TrainConfig,
)


def test_config_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        exp_id="exp/x",
        model=ModelConfig(
            resnet_version=50,
            mano=ManoConfig(ncomps=30, lambda_verts=None),
            atlas=AtlasConfig(predict_trans=True),
        ),
        train=TrainConfig(lr=3e-4, optimizer="sgd"),
    )
    p = str(tmp_path / "opt.json")
    cfg.to_json(p)
    back = ExperimentConfig.from_json(p)
    assert back == cfg
    assert back.model.mano.lambda_verts is None
    assert back.model.resnet_version == 50


def test_config_backfill_unknown_and_missing():
    # Old checkpoints with missing fields backfill defaults; unknown keys
    # are ignored (reference reload.py:42-72 behaviour).
    back = ExperimentConfig.from_json(
        '{"exp_id": "a", "bogus_key": 1, "model": {"resnet_version": 50}}'
    )
    assert back.exp_id == "a"
    assert back.model.resnet_version == 50
    assert back.model.mano.ncomps == 6  # backfilled default
    assert back.train.lr == pytest.approx(1e-4)


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from obman_train_tpu.assets import synthetic_mano_assets
    from obman_train_tpu.models import (
        BatchSpec,
        build_handnet,
        mano_params_from_assets,
    )
    from obman_train_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from obman_train_tpu.train.checkpoint import (
        load_checkpoint,
        load_checkpoints_averaged,
        save_checkpoint,
    )
    from tests.test_models import make_batch

    net = build_handnet(
        ModelConfig(),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    batch = make_batch(rng, B=2)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)
    step = make_train_step(net, tx, spec, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    d = str(tmp_path / "exp")
    save_checkpoint(d, state, epoch=1, config=ExperimentConfig(), is_best=True)
    restored, epoch = load_checkpoint(d, state)
    assert epoch == 1
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # weight averaging over [ckpt, best] == same values (identical copies)
    avg, _ = load_checkpoints_averaged(
        [d, str(tmp_path / "exp/model_best")], state
    )
    c = jax.tree_util.tree_leaves(avg.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-7)
