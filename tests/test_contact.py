import jax.numpy as jnp
import numpy as np
import pytest

from obman_train_tpu.assets import icosphere, synthetic_mano_assets
from obman_train_tpu.ops.contact import compute_contact_loss, masked_mean_loss


@pytest.fixture(scope="module")
def scene(  # a hand mesh far from / overlapping an object sphere
):
    assets = synthetic_mano_assets("right")
    hand = assets.v_template[None] * 1000.0  # (1, 778, 3) mm
    overts, ofaces = icosphere(2)
    return hand.astype(np.float32), overts.astype(np.float32), ofaces


def test_masked_mean_loss():
    vals = jnp.asarray([[1.0, 2.0, 3.0]])
    mask = jnp.asarray([[True, False, True]])
    assert float(masked_mean_loss(vals, mask)) == pytest.approx(2.0)
    assert float(masked_mean_loss(vals, jnp.zeros_like(mask))) == 0.0


def _run(hand, obj, ofaces, **kw):
    return compute_contact_loss(
        jnp.asarray(hand), jnp.asarray(obj), jnp.asarray(ofaces), **kw
    )


def test_far_object_no_penetration(scene):
    hand, overts, ofaces = scene
    # Object sphere 1m away, radius 50mm: no contact, no penetration.
    obj = (overts * 50.0 + np.array([1000.0, 0, 0]))[None].astype(np.float32)
    attr, penetr, info, metrics = _run(
        hand, obj, ofaces, contact_mode="dist_sq", contact_thresh=10.0
    )
    assert float(penetr) == 0.0
    assert not np.asarray(info["repulsion_masks"]).any()
    assert float(metrics["max_penetr"]) == 0.0
    # dist_sq mode: nothing below threshold -> attraction 0 too
    assert float(attr) == 0.0


def test_engulfing_object_everything_penetrates(scene):
    hand, overts, ofaces = scene
    # Giant sphere centered on the hand: every hand vert is interior.
    center = hand[0].mean(0)
    obj = (overts * 2000.0 + center)[None].astype(np.float32)
    attr, penetr, info, metrics = _run(hand, obj, ofaces)
    assert np.asarray(info["repulsion_masks"]).all()
    assert float(penetr) > 0
    assert float(metrics["max_penetr"]) > 0


def test_zones_select_at_most_one_vert_per_zone(scene):
    hand, overts, ofaces = scene
    center = hand[0].mean(0)
    obj = (overts * 150.0 + center + np.array([200.0, 0, 0]))[None].astype(
        np.float32
    )
    _, _, info, _ = _run(
        hand, obj, ofaces, contact_mode="dist_tanh", contact_zones="zones"
    )
    n_attr = np.asarray(info["attraction_masks"]).sum()
    assert n_attr <= 6


def test_tips_mask_limits_attraction(scene):
    hand, overts, ofaces = scene
    center = hand[0].mean(0)
    obj = (overts * 150.0 + center + np.array([200.0, 0, 0]))[None].astype(
        np.float32
    )
    _, _, info, _ = _run(
        hand, obj, ofaces, contact_mode="dist_tanh", contact_zones="tips"
    )
    mask = np.asarray(info["attraction_masks"])[0]
    on = set(np.nonzero(mask)[0].tolist())
    assert on.issubset({745, 317, 444, 556, 673})


def test_gradient_targets(scene):
    import jax

    hand, overts, ofaces = scene
    center = hand[0].mean(0)
    obj = (overts * 150.0 + center)[None].astype(np.float32)

    def attr_loss(h, o, target):
        a, p, _, _ = compute_contact_loss(
            h, o, jnp.asarray(ofaces),
            contact_mode="dist_tanh", contact_target=target,
        )
        return a + p

    for target, hand_gets_grad, obj_gets_grad in [
        ("all", True, True),
        ("obj", False, True),
        ("hand", True, False),
    ]:
        gh, go = jax.grad(attr_loss, argnums=(0, 1))(
            jnp.asarray(hand), jnp.asarray(obj), target
        )
        assert (float(jnp.abs(gh).sum()) > 0) == hand_gets_grad, target
        assert (float(jnp.abs(go).sum()) > 0) == obj_gets_grad, target


def test_onehot_gather_matches_take_along_axis(scene, monkeypatch):
    """The one-hot-matmul nearest-point selection (_select_closest) must be
    BIT-identical to take_along_axis in the forward (each output element is
    a single 1*v product) and match its gradients: the matmul transpose is
    the same per-pair accumulation the gather's scatter-add performs, in
    f32 on the MXU."""
    import jax

    import obman_train_tpu.ops.contact as ct

    hand, overts, ofaces = scene
    center = hand[0].mean(0)
    obj = (overts * 120.0 + center)[None].astype(np.float32)
    rng = np.random.default_rng(3)
    idxs = jnp.asarray(
        rng.integers(0, obj.shape[1], (1, hand.shape[1])), jnp.int32
    )

    outs, grads = {}, {}
    for flag in (True, False):
        monkeypatch.setattr(ct, "_ONEHOT_GATHER", flag)
        outs[flag] = np.asarray(ct._select_closest(jnp.asarray(obj), idxs))

        def loss(o):
            sel = ct._select_closest(o, idxs)
            return jnp.sum(sel * sel)

        grads[flag] = np.asarray(jax.grad(loss)(jnp.asarray(obj)))
    np.testing.assert_array_equal(outs[True], outs[False])
    np.testing.assert_allclose(grads[True], grads[False],
                               rtol=1e-6, atol=1e-6)


def test_contact_loss_matches_across_gather_forms(scene, monkeypatch):
    """compute_contact_loss end to end under both selection forms."""
    import jax

    import obman_train_tpu.ops.contact as ct

    hand, overts, ofaces = scene
    center = hand[0].mean(0)
    obj = (overts * 120.0 + center)[None].astype(np.float32)

    def run(flag):
        monkeypatch.setattr(ct, "_ONEHOT_GATHER", flag)
        # bypass the jit cache: static args identical across flags would
        # reuse the first trace and hide the patched form
        a, p, _, m = compute_contact_loss.__wrapped__(
            jnp.asarray(hand), jnp.asarray(obj), jnp.asarray(ofaces),
            contact_mode="dist_tanh", contact_zones="zones",
        )
        g = jax.grad(
            lambda o: compute_contact_loss.__wrapped__(
                jnp.asarray(hand), o, jnp.asarray(ofaces),
                contact_mode="dist_tanh", contact_zones="zones",
            )[0]
        )(jnp.asarray(obj))
        return float(a), float(p), {k: float(v) for k, v in m.items()}, \
            np.asarray(g)

    a1, p1, m1, g1 = run(True)
    a2, p2, m2, g2 = run(False)
    assert a1 == pytest.approx(a2, rel=1e-6)
    assert p1 == pytest.approx(p2, rel=1e-6)
    for k in m1:
        assert m1[k] == pytest.approx(m2[k], rel=1e-6), k
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-7)
