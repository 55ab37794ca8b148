import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obman_train_tpu.assets import synthetic_mano_assets
from obman_train_tpu.config import ModelConfig, TrainConfig
from obman_train_tpu.models import BatchSpec, build_handnet, mano_params_from_assets
from obman_train_tpu.parallel import make_mesh, shard_batch
from obman_train_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from tests.test_models import make_batch


@pytest.fixture(scope="module")
def net():
    return build_handnet(
        ModelConfig(),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )


def test_train_step_decreases_loss(net, rng):
    batch = make_batch(rng, B=4)
    spec = BatchSpec()
    tcfg = TrainConfig(lr=1e-3, lr_decay_gamma=1.0)
    tx = make_optimizer(tcfg)
    state = create_train_state(net, tx, batch, spec)
    step = make_train_step(net, tx, spec, donate=False)
    key = jax.random.PRNGKey(0)
    _, losses0 = step(state, batch, key)
    for _ in range(15):
        state, losses = step(state, batch, key)
    assert float(losses["total_loss"]) < float(losses0["total_loss"])
    assert int(state.step) == 15


def test_train_step_sharded_over_mesh(net, rng):
    """8 virtual CPU devices, batch sharded over the data axis."""
    mesh = make_mesh(axis_names=("data",))
    assert mesh.devices.size == 8
    batch = make_batch(rng, B=16)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)
    step = make_train_step(net, tx, spec, mesh=mesh, donate=False)
    sharded = shard_batch(batch, mesh)
    new_state, losses = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total_loss"]))
    # params replicated: every device holds the same value
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_matches_single_device(net, rng):
    """The SPMD step computes the same result as the unsharded step."""
    mesh = make_mesh(axis_names=("data",))
    batch = make_batch(rng, B=8)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)

    step_single = make_train_step(net, tx, spec, donate=False)
    s1, losses1 = step_single(state, batch, jax.random.PRNGKey(0))

    step_mesh = make_train_step(net, tx, spec, mesh=mesh, donate=False)
    s2, losses2 = step_mesh(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        float(losses1["total_loss"]), float(losses2["total_loss"]), rtol=1e-4
    )
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_freeze_encoder(net, rng):
    batch = make_batch(rng, B=2)
    spec = BatchSpec()
    tcfg = TrainConfig(freeze_encoder=True, lr=1e-2)
    # params needed for labels -> two-phase init
    tx0 = make_optimizer(TrainConfig())
    state0 = create_train_state(net, tx0, batch, spec)
    tx = make_optimizer(tcfg, params=state0.params)
    state = state0._replace(opt_state=tx.init(state0.params))
    step = make_train_step(net, tx, spec, donate=False)
    new_state, _ = step(state, batch, jax.random.PRNGKey(0))
    before = np.asarray(
        jax.tree_util.tree_leaves(state.params["base_net"])[0]
    )
    after = np.asarray(
        jax.tree_util.tree_leaves(new_state.params["base_net"])[0]
    )
    np.testing.assert_array_equal(before, after)
    b_mano = jax.tree_util.tree_leaves(state.params["mano_branch"])[0]
    a_mano = jax.tree_util.tree_leaves(new_state.params["mano_branch"])[0]
    assert not np.allclose(np.asarray(b_mano), np.asarray(a_mano))


def test_eval_step(net, rng):
    batch = make_batch(rng, B=2)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)
    eval_step = make_eval_step(net, spec)
    losses, out = eval_step(state, batch)
    assert "joints" in out and out["joints"].shape == (2, 21, 3)
    assert np.isfinite(float(losses["total_loss"]))


@pytest.mark.fast
def test_grad_accum_matches_single_step(rng):
    """accum_steps=2 must reproduce the accum=1 update exactly for a
    deterministic (hands-only, frozen-BN) config: equal-size strided
    microbatches average to the full-batch mean loss and gradient."""
    from obman_train_tpu.config import AtlasConfig

    net = build_handnet(
        ModelConfig(atlas=AtlasConfig(lambda_atlas=None,
                                      final_lambda_atlas=None)),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    batch = make_batch(rng, B=8, with_obj=False)
    spec = BatchSpec(has_objpoints3d=False)
    # SGD at lr 1: params_new = params - grads, so the param comparison IS
    # an exact gradient comparison (Adam's first step is ~lr*sign(g) and
    # amplifies f32-noise sign flips on near-zero grads).
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=1.0, momentum=0.0,
                                    lr_decay_gamma=1.0))
    state = create_train_state(net, tx, batch, spec)
    key = jax.random.PRNGKey(0)
    s1, l1 = make_train_step(net, tx, spec, donate=False)(state, batch, key)
    s2, l2 = make_train_step(net, tx, spec, donate=False, accum_steps=2)(
        state, batch, key
    )
    np.testing.assert_allclose(
        float(l1["total_loss"]), float(l2["total_loss"]), rtol=1e-5
    )
    for p1, p2 in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        # rtol covers f32 reduction-order noise on the larger gradients the
        # realistic-scale synthetic hand produces (losses are in mm^2)
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-5
        )


@pytest.mark.fast
def test_grad_accum_full_config(net, rng):
    """Full config (atlas points rng per microbatch) runs, returns joints
    in the original row order, and rejects non-divisible batches."""
    batch = make_batch(rng, B=8)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)
    step = make_train_step(
        net, tx, spec, donate=False, accum_steps=4, return_joints=True
    )
    new_state, losses, joints = step(state, batch, jax.random.PRNGKey(0))
    assert joints.shape == (8, 21, 3)
    assert np.isfinite(float(losses["total_loss"]))
    # joints must match the per-row forward of the SAME updated... rather:
    # verify row order by comparing against an eval forward on the original
    # params (joints are computed from the pre-update params per microbatch)
    eval_step = make_eval_step(net, spec)
    _, out = eval_step(state, batch)
    np.testing.assert_allclose(
        np.asarray(joints), np.asarray(out["joints"]), atol=1e-3
    )
    bad = make_train_step(net, tx, spec, donate=False, accum_steps=3)
    with pytest.raises(ValueError, match="not divisible"):
        bad(state, batch, jax.random.PRNGKey(0))


@pytest.mark.fast
def test_grad_accum_with_device_augment(net, rng):
    """--grad_accum with --device_augment: the batch carries a rank-0
    per-batch ``aug_order`` and uint8 images; the microbatch split must
    broadcast the non-batch-dim leaves instead of reshaping them
    (ADVICE r2: a blanket reshape crashed at trace time)."""
    B = 4
    batch = make_batch(rng, B=B)
    batch["images"] = jnp.asarray(
        (np.asarray(rng.random((B, 64, 64, 3))) * 255).astype(np.uint8)
    )
    batch["aug_factors"] = jnp.asarray(
        rng.uniform(0.8, 1.2, (B, 4)).astype(np.float32)
    )
    batch["aug_order"] = jnp.int32(7)
    spec = BatchSpec()
    tx = make_optimizer(TrainConfig())
    state = create_train_state(net, tx, batch, spec)
    step = make_train_step(net, tx, spec, donate=False, accum_steps=2)
    new_state, losses = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total_loss"]))
    assert int(new_state.step) == 1


def test_geometry_dtype_rungs_train_step(rng):
    """Full train step under each --geometry_dtype rung: compiles, losses
    stay finite over several steps and the first-step losses match the
    parity path (f32_select ~exact; bf16 selection within a few percent)."""
    from obman_train_tpu.config import AtlasConfig, ContactConfig

    batch = make_batch(rng, B=4)
    spec = BatchSpec()
    tcfg = TrainConfig(lr=1e-3, lr_decay_gamma=1.0)
    tx = make_optimizer(tcfg)
    key = jax.random.PRNGKey(0)

    outs = {}
    for gd in ("float32", "float32_select", "bfloat16"):
        net_gd = build_handnet(
            ModelConfig(
                atlas=AtlasConfig(predict_trans=True, predict_scale=True),
                contact=ContactConfig(
                    contact_lambda=0.167, collision_lambda=0.167
                ),
                geometry_dtype=gd,
            ),
            mano_params_from_assets(synthetic_mano_assets("right")),
            mano_params_from_assets(synthetic_mano_assets("left")),
        )
        state = create_train_state(net_gd, tx, batch, spec)
        step = make_train_step(net_gd, tx, spec, donate=False)
        _, losses0 = step(state, batch, key)
        for _ in range(10):
            state, losses = step(state, batch, key)
        outs[gd] = (
            {k: float(v) for k, v in losses0.items()
             if v is not None and np.ndim(v) == 0},
            float(losses["total_loss"]),
        )
        assert np.isfinite(outs[gd][1])

    base0 = outs["float32"][0]
    for gd, rtol in (("float32_select", 1e-4), ("bfloat16", 0.05)):
        for k, v in outs[gd][0].items():
            assert v == pytest.approx(base0[k], rel=rtol, abs=rtol), (gd, k)
