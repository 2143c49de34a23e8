"""Marching-tetrahedra mesh extraction (extract_geometry equivalent)."""

import numpy as np

from genefaceplusplus_tpu.utils.geometry import extract_geometry, marching_tetrahedra


def test_sphere_isosurface():
    R = 48
    xs = np.linspace(-1, 1, R, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = 1.0 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)  # iso 0.5 => r = 0.5 sphere
    verts, tris = marching_tetrahedra(field, 0.5, bound=1.0)
    assert len(verts) > 100 and len(tris) > 100
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.03)
    assert radii.std() < 0.03
    # all triangle indices valid
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_empty_and_full_fields():
    g = np.zeros((8, 8, 8), np.float32)
    v, t = marching_tetrahedra(g, 0.5)
    assert len(v) == 0 and len(t) == 0
    v, t = marching_tetrahedra(g + 1.0, 0.5)
    assert len(v) == 0 and len(t) == 0


def test_extract_geometry_from_density_fn():
    def density(pts):
        return 20.0 * (np.linalg.norm(pts, axis=-1) < 0.4)

    verts, tris = extract_geometry(density, resolution=32, threshold=10.0, bound=1.0)
    assert len(verts) > 50
    radii = np.linalg.norm(verts, axis=-1)
    assert 0.3 < radii.mean() < 0.5
