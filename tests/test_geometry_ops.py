import jax.numpy as jnp
import numpy as np
import pytest

from obman_train_tpu.assets import icosphere, cotangent_laplacian
from obman_train_tpu.ops.chamfer import (
    batch_pairwise_sqdist,
    chamfer_loss,
)
from obman_train_tpu.ops.inside import batch_mesh_contains_points
from obman_train_tpu.ops.mesh import edge_loss, laplacian_loss, meshiou, thresh_iou

pytestmark = pytest.mark.fast


def brute_pairwise(x, y):
    return ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)


def test_pairwise_sqdist(rng):
    x = rng.normal(0, 1, (2, 17, 3)).astype(np.float32)
    y = rng.normal(0, 1, (2, 23, 3)).astype(np.float32)
    got = np.asarray(batch_pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, brute_pairwise(x, y), atol=1e-4)


def test_chamfer_loss_semantics(rng):
    preds = rng.normal(0, 1, (3, 11, 3)).astype(np.float32)
    gts = rng.normal(0, 1, (3, 7, 3)).astype(np.float32)
    l1, l2 = chamfer_loss(jnp.asarray(preds), jnp.asarray(gts))
    d = brute_pairwise(gts, preds)  # (B, M, N)
    np.testing.assert_allclose(np.asarray(l1), d.min(1).mean(1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), d.min(2).mean(1), atol=1e-5)


def test_chamfer_zero_for_identical(rng):
    pts = rng.normal(0, 1, (2, 20, 3)).astype(np.float32)
    l1, l2 = chamfer_loss(jnp.asarray(pts), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(l1), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(l2), 0.0, atol=1e-4)


def test_inside_test_sphere(rng):
    verts, faces = icosphere(2)
    tri = verts[faces]  # (F, 3, 3)
    tris = np.broadcast_to(tri, (2,) + tri.shape).astype(np.float32)
    inside_pts = rng.normal(0, 0.3, (2, 40, 3)).astype(np.float32)
    inside_pts = 0.5 * inside_pts / np.linalg.norm(inside_pts, axis=-1, keepdims=True)
    outside_pts = 2.0 * inside_pts / 0.5
    pts = np.concatenate([inside_pts, outside_pts], axis=1)
    ext = np.asarray(
        batch_mesh_contains_points(jnp.asarray(pts), jnp.asarray(tris))
    )
    assert not ext[:, :40].any(), "points at r=0.5 must be interior"
    assert ext[:, 40:].all(), "points at r=2 must be exterior"


def test_edge_loss_zero_for_equilateral():
    # A regular icosahedron has all edges equal -> zero variance.
    verts, faces = icosphere(0)
    v = jnp.asarray(verts)[None]
    assert float(edge_loss(v, faces)) < 1e-6
    # Stretching breaks it
    stretched = v * jnp.asarray([2.0, 1.0, 1.0])
    assert float(edge_loss(stretched, faces)) > 1e-4


def test_laplacian_loss_flat_vs_bumpy(rng):
    verts, faces = icosphere(2)
    L = jnp.asarray(cotangent_laplacian(verts, faces))
    smooth = float(laplacian_loss(jnp.asarray(verts)[None], L))
    bumpy_np = verts * (1 + 0.2 * rng.normal(0, 1, (len(verts), 1))).astype(
        np.float32
    )
    bumpy = float(laplacian_loss(jnp.asarray(bumpy_np)[None], L))
    assert bumpy > 2 * smooth


def test_meshiou():
    gt = jnp.asarray(np.array([[0.5, 20.0, 3.0, 100.0]], np.float32))
    pred = jnp.asarray(np.array([[0.4, 25.0, 2.0, 0.5]], np.float32))
    iou5 = np.asarray(thresh_iou(gt, pred, 5.0))
    # gt<=5: {0,2}; pred<=5: {0,2,3} -> inter 2, union 3
    np.testing.assert_allclose(iou5, [2 / 3], atol=1e-6)
    batch_ious, auc = meshiou(gt, pred)
    assert batch_ious.shape == (10,)
    assert 0.0 <= float(auc) <= 10.0 * 1.0
