import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obman_train_tpu.assets import synthetic_mano_assets
from obman_train_tpu.config import AtlasConfig, ContactConfig, ManoConfig, ModelConfig
from obman_train_tpu.models import (
    BatchSpec,
    build_handnet,
    mano_params_from_assets,
    resnet18,
)


@pytest.fixture(scope="module")
def mano_pair():
    return (
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )


def make_batch(rng, B=2, with_obj=True):
    batch = {
        "images": rng.normal(0, 0.3, (B, 64, 64, 3)).astype(np.float32),
        "sides": np.array([0, 1][:B] * (B // 2 or 1), np.int32)[:B],
        "joints3d": rng.normal(0, 30, (B, 21, 3)).astype(np.float32),
        "verts3d": rng.normal(0, 30, (B, 778, 3)).astype(np.float32),
    }
    if with_obj:
        batch["objpoints3d"] = rng.normal(0, 50, (B, 600, 3)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_resnet18_shapes(rng):
    model = resnet18()
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, inters = model.apply(variables, x, return_inter=True)
    assert feats.shape == (2, 512)
    assert [i.shape[-1] for i in inters] == [64, 128, 256, 512]


def _build(cfg, mano_pair):
    return build_handnet(cfg, *mano_pair)


def test_handnet_forward_and_losses(mano_pair, rng):
    cfg = ModelConfig(
        resnet_version=18,
        mano=ManoConfig(lambda_verts=0.167, lambda_joints3d=0.167,
                        lambda_shape=0.167, lambda_pca=None, use_shape=True),
        atlas=AtlasConfig(predict_trans=True, predict_scale=True,
                          lambda_regul_edges=0.1, lambda_laplacian=0.1),
        contact=ContactConfig(contact_lambda=0.1, collision_lambda=0.1),
    )
    net = _build(cfg, mano_pair)
    batch = make_batch(rng)
    spec = BatchSpec()
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, spec,
    )
    total, results, losses = net.apply(variables, batch, spec)
    # Loss-dict parity with the reference keys (handnet.py / epochpass logs)
    for key in [
        "mano_verts3d", "mano_joints3d", "mano_shape", "mano_total_loss",
        "atlas_trans3d", "atlas_scale3d", "final_chamfer_loss",
        "atlas_objpoints3d", "atlas_edge_regul", "atlas_laplac",
        "penetration_loss", "attraction_loss", "contact_loss", "contact_auc",
        "max_penetr", "mean_penetr", "total_loss",
    ]:
        assert key in losses, key
        assert np.isfinite(float(losses[key])), key
    assert results["verts"].shape == (2, 778, 3)
    assert results["joints"].shape == (2, 21, 3)
    assert results["objpoints3d"].shape == (2, 642, 3)
    assert results["objtrans"].shape == (2, 3)
    assert results["objscale"].shape == (2, 1)
    assert float(total) == pytest.approx(float(losses["total_loss"]))


def test_handnet_no_loss_inference(mano_pair, rng):
    cfg = ModelConfig(resnet_version=18)
    net = _build(cfg, mano_pair)
    batch = make_batch(rng)
    spec = BatchSpec()
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, spec,
    )
    total, results, losses = net.apply(variables, batch, spec, no_loss=True)
    assert total is None
    assert losses["total_loss"] is None
    assert "verts" in results and "objpoints3d" in results


def test_handnet_hands_only(mano_pair, rng):
    cfg = ModelConfig(
        atlas=AtlasConfig(lambda_atlas=None, final_lambda_atlas=None)
    )
    net = _build(cfg, mano_pair)
    batch = make_batch(rng, with_obj=False)
    spec = BatchSpec(has_objpoints3d=False)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, spec,
    )
    total, results, losses = net.apply(variables, batch, spec)
    assert "objpoints3d" not in results
    assert "mano_verts3d" in losses
    assert np.isfinite(float(total))


def test_handnet_grad_step(mano_pair, rng):
    cfg = ModelConfig()
    net = _build(cfg, mano_pair)
    batch = make_batch(rng)
    spec = BatchSpec()
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, spec,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    @jax.jit
    def loss_fn(p):
        total, _, _ = net.apply(
            {"params": p, "batch_stats": stats}, batch, spec,
            rngs={"points": jax.random.PRNGKey(2)},
        )
        return total

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # encoder gets gradient signal
    total_norm = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total_norm > 0


def test_handnet_sides_select(mano_pair, rng):
    """Flipping the side of one sample changes its verts but not others'."""
    cfg = ModelConfig()
    net = _build(cfg, mano_pair)
    batch = make_batch(rng)
    spec = BatchSpec()
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, spec,
    )
    _, r0, _ = net.apply(variables, batch, spec, no_loss=True)
    batch2 = dict(batch)
    batch2["sides"] = batch["sides"].at[0].set(1 - int(batch["sides"][0]))
    _, r1, _ = net.apply(variables, batch2, spec, no_loss=True)
    assert not np.allclose(np.asarray(r0["verts"][0]), np.asarray(r1["verts"][0]))
    np.testing.assert_allclose(
        np.asarray(r0["verts"][1]), np.asarray(r1["verts"][1]), atol=1e-5
    )
