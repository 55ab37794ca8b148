"""Loss-form equivalences that must hold regardless of perf gates.

The reference-golden tests (test_reference_goldens.py) pin
compute_atlas_loss to the executed reference under whatever form the
shipped default selects; this file pins the FORMS to each other, so a
perf-motivated default flip (the round-5 stacked chamfer-pair plane,
models/losses.py::_STACK_ATLAS_PLANES) can never silently change loss
semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import obman_train_tpu.models.losses as ml
from obman_train_tpu.config import AtlasConfig

pytestmark = pytest.mark.fast


@pytest.fixture
def atlas_case():
    rng = np.random.default_rng(7)
    B, N, M = 5, 17, 11
    preds = {
        "objpointscentered3d": jnp.asarray(
            rng.normal(0, 40, (B, N, 3)), jnp.float32
        ),
        "objpoints3d": jnp.asarray(rng.normal(0, 40, (B, N, 3)), jnp.float32),
        "objtrans": jnp.asarray(rng.normal(0, 5, (B, 3)), jnp.float32),
        "objscale": jnp.asarray(rng.normal(1, 0.1, (B, 1)), jnp.float32),
    }
    batch = {"objpoints3d": jnp.asarray(rng.normal(0, 40, (B, M, 3)),
                                        jnp.float32)}
    cfg = AtlasConfig(predict_trans=True, predict_scale=True)
    return preds, batch, cfg


def _run(preds, batch, cfg, stacked, monkeypatch):
    monkeypatch.setattr(ml, "_STACK_ATLAS_PLANES", stacked)
    total, losses = ml.compute_atlas_loss(
        preds, batch, cfg, has_objpoints3d=True, has_center3d=False,
        obj_faces=None, laplacian=None,
    )
    return np.asarray(total), {k: np.asarray(v) for k, v in losses.items()}


def test_stacked_atlas_pair_matches_two_calls(atlas_case, monkeypatch):
    """Eager, the stacked (2B, N, M) plane is BIT-identical to the two
    (B, N, M) chamfer calls: each example's contraction is independent."""
    preds, batch, cfg = atlas_case
    t_stack, l_stack = _run(preds, batch, cfg, True, monkeypatch)
    t_two, l_two = _run(preds, batch, cfg, False, monkeypatch)
    assert t_stack == t_two
    assert set(l_stack) == set(l_two)
    for k in l_two:
        np.testing.assert_array_equal(l_stack[k], l_two[k], err_msg=k)


def test_stacked_atlas_pair_grads_match_two_calls(atlas_case, monkeypatch):
    preds, batch, cfg = atlas_case

    def total_of(points_key, stacked):
        def f(pts):
            monkeypatch.setattr(ml, "_STACK_ATLAS_PLANES", stacked)
            p = dict(preds, **{points_key: pts})
            total, _ = ml.compute_atlas_loss(
                p, batch, cfg, has_objpoints3d=True, has_center3d=False,
                obj_faces=None, laplacian=None,
            )
            return total
        return f

    for key in ("objpointscentered3d", "objpoints3d"):
        g_stack = jax.grad(total_of(key, True))(preds[key])
        g_two = jax.grad(total_of(key, False))(preds[key])
        np.testing.assert_allclose(
            np.asarray(g_stack), np.asarray(g_two), rtol=1e-6, atol=1e-8,
            err_msg=key,
        )
