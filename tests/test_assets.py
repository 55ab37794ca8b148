import numpy as np
import pytest

from obman_train_tpu.assets import (
    cotangent_laplacian,
    icosphere,
    load_contact_zones,
    zone_masks,
)

pytestmark = pytest.mark.fast


def test_icosphere_counts():
    for sub, (nv, nf) in enumerate([(12, 20), (42, 80), (162, 320), (642, 1280)]):
        verts, faces = icosphere(sub)
        assert verts.shape == (nv, 3)
        assert faces.shape == (nf, 3)


def test_icosphere_unit_and_closed():
    verts, faces = icosphere(3)
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 1.0, atol=1e-6)
    # Closed manifold: every edge shared by exactly 2 faces; Euler V - E + F = 2
    edges = set()
    counts = {}
    for f in faces:
        for a, b in [(f[0], f[1]), (f[1], f[2]), (f[2], f[0])]:
            key = (min(a, b), max(a, b))
            edges.add(key)
            counts[key] = counts.get(key, 0) + 1
    assert all(c == 2 for c in counts.values())
    assert len(verts) - len(edges) + len(faces) == 2


def test_icosphere_face_orientation_consistent():
    # All face normals point outward (positive dot with centroid direction).
    verts, faces = icosphere(3)
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    centroid = tri.mean(axis=1)
    assert (np.sum(n * centroid, axis=1) > 0).all()


def test_contact_zones():
    verts, zones = load_contact_zones()
    assert verts.shape == (778, 3)
    assert sorted(len(v) for v in zones.values()) == sorted([19, 28, 19, 7, 25, 17])
    masks = zone_masks()
    assert masks.shape == (6, 778)
    assert masks.sum() == sum(len(v) for v in zones.values())


def test_cotangent_laplacian_properties():
    verts, faces = icosphere(2)
    L = cotangent_laplacian(verts, faces)
    # Symmetric, rows sum to zero, constant functions in the nullspace.
    np.testing.assert_allclose(L, L.T, atol=1e-6)
    np.testing.assert_allclose(L.sum(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(L @ np.ones((len(verts), 1)), 0.0, atol=1e-4)
    # On a (near-)sphere, L x approximates the inward/outward normal direction:
    # check it's nonzero and aligned with the radial direction on average.
    lx = L @ verts
    align = np.abs(
        np.sum(lx * verts, axis=1)
        / (np.linalg.norm(lx, axis=1) * np.linalg.norm(verts, axis=1) + 1e-9)
    )
    assert align.mean() > 0.99
