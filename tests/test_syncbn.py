import jax
import numpy as np
import pytest

from obman_train_tpu.assets import synthetic_mano_assets
from obman_train_tpu.config import ModelConfig, TrainConfig
from obman_train_tpu.models import BatchSpec, build_handnet, mano_params_from_assets
from obman_train_tpu.parallel import make_mesh, shard_batch
from obman_train_tpu.train import create_train_state, make_optimizer
from obman_train_tpu.train.steps import make_train_step_syncbn
from tests.test_models import make_batch


def test_syncbn_train_step(rng):
    """Unfrozen BN with cross-shard stat sync: stats must equal the global-
    batch stats, not per-shard ones."""
    mesh = make_mesh(axis_names=("data",))
    net = build_handnet(
        ModelConfig(sync_bn=True),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    batch = make_batch(rng, B=16)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)
    step = make_train_step_syncbn(net, tx, spec, mesh)
    new_state, losses = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total_loss"]))
    # BN running means must have moved away from init (0) after one step
    bn_mean = np.asarray(new_state.batch_stats["base_net"]["bn1"]["mean"])
    assert np.abs(bn_mean).sum() > 0
    # params stay replicated and identical across devices
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    gathered = [np.asarray(s.data) for s in leaf.addressable_shards]
    for g in gathered[1:]:
        np.testing.assert_array_equal(gathered[0], g)


def test_syncbn_matches_global_batch_stats(rng):
    """The pmean'd BN batch statistics equal what a single device computes
    on the full batch (the definition of SyncBN)."""
    mesh = make_mesh(axis_names=("data",))
    net = build_handnet(
        ModelConfig(sync_bn=True),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    net_nosync = build_handnet(
        ModelConfig(sync_bn=False),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    batch = make_batch(rng, B=16)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig(lr=0.0))  # lr 0: isolate the stats path
    state = create_train_state(net, tx, batch, spec)

    step_sync = make_train_step_syncbn(net, tx, spec, mesh)
    s1, _ = step_sync(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))

    from obman_train_tpu.train.steps import make_train_step

    step_single = make_train_step(
        net_nosync, tx, spec, train_bn=True, donate=False
    )
    s2, _ = step_single(state, batch, jax.random.PRNGKey(0))

    m1 = np.asarray(s1.batch_stats["base_net"]["bn1"]["mean"])
    m2 = np.asarray(s2.batch_stats["base_net"]["bn1"]["mean"])
    np.testing.assert_allclose(m1, m2, atol=1e-5)
