"""BFM render path: SH lighting, vertex normals, z-buffer rasteriser, SECC."""

import numpy as np

from genefaceplusplus_tpu.data import bfm_render as R


def test_compute_color_ambient_and_directional():
    # flat texture, normals facing +z
    N = 8
    tex = np.full((N, 3), 0.5, np.float32)
    normals = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (N, 1))
    # zero gamma: only the init_lit ambient term lights the face
    c0 = R.compute_color(tex, normals, np.zeros(27, np.float32))
    amb = R.SH_A[0] * R.SH_C[0] * 0.8
    band2 = 0.5 * R.SH_A[2] * R.SH_C[2] / np.sqrt(3.0) * 2.0 * 0.0  # gamma=0
    np.testing.assert_allclose(c0, 0.5 * amb, rtol=1e-5)
    # positive z-band gamma brightens +z-facing vertices
    gamma = np.zeros(27, np.float32)
    gamma[2] = 0.5  # red channel, Y_2 = a1 c1 nz
    c1 = R.compute_color(tex, normals, gamma)
    assert (c1[:, 0] > c0[:, 0]).all()
    np.testing.assert_allclose(c1[:, 1:], c0[:, 1:], rtol=1e-5)


def test_vertex_normals_outward_tetrahedron():
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    # wound so face normals point away from the centroid
    f = np.asarray([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    n = R.compute_vertex_normals(v, f)
    centroid = v.mean(0)
    out = v - centroid
    dots = (n * (out / np.linalg.norm(out, axis=-1, keepdims=True))).sum(-1)
    assert (dots > 0.3).all(), dots
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_rasterize_single_triangle():
    size, focal, center = 64, 64.0, 32.0
    # a triangle in camera space at z=2, centred
    v = np.asarray([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.6, 2.0]], np.float32)
    f = np.asarray([[0, 1, 2]])
    attrs = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    mask, depth, img = R.rasterize_mesh(v, f, attrs, size=size, focal=focal,
                                        center=center, patch=64)
    assert mask.any()
    # depth of covered pixels == 2
    np.testing.assert_allclose(depth[mask], 2.0, rtol=1e-4)
    # attribute interpolation: colors sum to ~1 inside (barycentric partition)
    np.testing.assert_allclose(img[mask].sum(-1), 1.0, rtol=1e-3)
    # empty pixels untouched
    assert np.isinf(depth[~mask]).all()
    assert (img[~mask] == 0).all()


def test_rasterize_depth_order():
    size, focal, center = 64, 64.0, 32.0
    near = np.asarray([[-0.4, -0.4, 1.5], [0.4, -0.4, 1.5], [0.0, 0.5, 1.5]], np.float32)
    far = near.copy()
    far[:, 2] = 3.0
    far[:, :2] *= 2.0  # same screen footprint
    v = np.concatenate([far, near])
    f = np.asarray([[0, 1, 2], [3, 4, 5]])
    attrs = np.concatenate([
        np.tile([[1.0, 0, 0]], (3, 1)),  # far: red
        np.tile([[0, 1.0, 0]], (3, 1)),  # near: green
    ]).astype(np.float32)
    mask, depth, img = R.rasterize_mesh(v, f, attrs, size=size, focal=focal,
                                        center=center, patch=64)
    # the overlap region must show the NEAR (green) triangle
    ys, xs = np.nonzero(mask & (np.abs(depth - 1.5) < 1e-3))
    assert len(ys) > 10
    assert (img[ys, xs, 1] > 0.9).all()
    assert (img[ys, xs, 0] < 0.1).all()


def test_secc_renderer_end_to_end():
    # tiny synthetic "face": an octahedron-ish blob with a basis
    rng = np.random.RandomState(0)
    Nv = 12
    mean = rng.randn(Nv, 3).astype(np.float32)
    mean /= np.abs(mean).max() * 2
    id_base = (rng.randn(Nv * 3, 80) * 0.01).astype(np.float32)
    exp_base = (rng.randn(Nv * 3, 64) * 0.01).astype(np.float32)
    # fan triangulation (valid indices is all that matters here)
    faces = np.asarray([[0, i, i + 1] for i in range(1, Nv - 1)])
    r = R.SECCRenderer(mean, id_base, exp_base, faces, size=64,
                       focal=64.0, center=32.0, camera_distance=10.0)
    mask, secc = r.render(np.zeros(80), np.zeros(64), np.zeros(3), np.zeros(3))
    assert mask.shape == (64, 64) and secc.shape == (64, 64, 3)
    assert mask.any()
    assert secc.min() >= -1.0 - 1e-5 and secc.max() <= 1.0 + 1e-5
    # background is -1, face region differs
    assert (secc[~mask] == -1.0).all()
    assert (secc[mask] > -1.0).any()
