import numpy as np

from obman_train_tpu.assets import synthetic_mano_assets
from obman_train_tpu.config import ModelConfig, TrainConfig
from obman_train_tpu.models import BatchSpec, build_handnet, mano_params_from_assets
from obman_train_tpu.train import create_train_state, make_optimizer, make_train_step
from obman_train_tpu.train.debug import inspect_feature_grads
from tests.test_models import make_batch


def test_inspect_feature_grads(rng):
    net = build_handnet(
        ModelConfig(),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    batch = make_batch(rng, B=2)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)
    grads = inspect_feature_grads(net, state, batch, spec)
    assert "mano_verts3d" in grads and "total_loss" in grads
    assert all(np.isfinite(v) for v in grads.values())
    assert grads["total_loss"] > 0
    # per-loss feature-gradients must differ across losses
    assert grads["mano_verts3d"] != grads["atlas_objpoints3d"]


def test_train_step_returns_joints(rng):
    import jax

    net = build_handnet(
        ModelConfig(),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    batch = make_batch(rng, B=2)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)
    step = make_train_step(net, tx, spec, donate=False, return_joints=True)
    state, losses, joints = step(state, batch, jax.random.PRNGKey(0))
    assert joints.shape == (2, 21, 3)
    assert np.isfinite(np.asarray(joints)).all()
