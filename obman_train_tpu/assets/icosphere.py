"""Icosphere generation (no trimesh dependency).

The reference builds its object-decoder template mesh with
``trimesh.creation.icosphere(subdivisions=3)`` (reference:
mano_train/networks/branches/atlasbranch.py:63-76) giving 642 vertices and
1280 faces.  This module reproduces the same geodesic polyhedron —
icosahedron + recursive 4-way face subdivision with midpoint caching,
vertices projected to the unit sphere — with a deterministic vertex order.

Vertex counts by subdivision level: 12, 42, 162, 642, 2562 (matches the
documentation in handnet.py:69-72).
"""

from __future__ import annotations

import functools

import numpy as np


def _icosahedron() -> tuple[np.ndarray, np.ndarray]:
    """Regular icosahedron inscribed in the unit sphere."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int32,
    )
    return verts, faces


def _subdivide(verts: np.ndarray, faces: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split every triangle into 4, caching edge midpoints so shared edges
    produce a single new vertex."""
    verts = list(map(tuple, verts))
    midpoint_cache: dict[tuple[int, int], int] = {}

    def midpoint(i: int, j: int) -> int:
        key = (i, j) if i < j else (j, i)
        if key in midpoint_cache:
            return midpoint_cache[key]
        v = (np.asarray(verts[i]) + np.asarray(verts[j])) / 2.0
        verts.append(tuple(v))
        idx = len(verts) - 1
        midpoint_cache[key] = idx
        return idx

    new_faces = []
    for a, b, c in faces:
        ab = midpoint(a, b)
        bc = midpoint(b, c)
        ca = midpoint(c, a)
        new_faces.extend([[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]])
    return np.asarray(verts, dtype=np.float64), np.asarray(new_faces, dtype=np.int32)


@functools.lru_cache(maxsize=8)
def icosphere(subdivisions: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Unit icosphere ``(verts[float32 (V,3)], faces[int32 (F,3)])``.

    subdivisions=3 -> V=642, F=1280 (the reference object template).
    """
    verts, faces = _icosahedron()
    for _ in range(subdivisions):
        verts, faces = _subdivide(verts, faces)
        verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    verts.setflags(write=False)
    faces.setflags(write=False)
    return verts.astype(np.float32), faces
