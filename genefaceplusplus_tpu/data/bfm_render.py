"""BFM mesh rendering: texture basis, vertex normals, SH lighting, and a
z-buffered software rasteriser — the full SECC render path.

Parity targets in /root/reference:
  * deep_3drecon/deep_3drecon_models/bfm.py:20-24 (SH constants),
    :129-198 (compute_texture / compute_norm / compute_color with the
    9-band SH irradiance formula and init_lit offset)
  * deep_3drecon/secc_renderer.py:10-60 + util/mesh_renderer.py (pytorch3d
    rasteriser; here a vectorised numpy z-buffer rasteriser — SECC is a
    debug/visualisation path in the reference, host-side is the right home;
    the per-face work is fully vectorised, no per-face Python loop)

All lighting/texture math is pure numpy/jnp and exactly mirrors the
reference formulas; the rasteriser is an original painter's/z-buffer design.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# SH irradiance constants (bfm.py:20-24)
SH_A = (np.pi, 2.0 * np.pi / np.sqrt(3.0), 2.0 * np.pi / np.sqrt(8.0))
SH_C = (
    1.0 / np.sqrt(4.0 * np.pi),
    np.sqrt(3.0) / np.sqrt(4.0 * np.pi),
    3.0 * np.sqrt(5.0) / np.sqrt(12.0 * np.pi),
)
# ambient offset added to the first band of every channel (bfm.py:32,87,181)
INIT_LIT = np.array([0.8, 0, 0, 0, 0, 0, 0, 0, 0], np.float32)


def compute_texture(tex_base: np.ndarray, mean_tex: np.ndarray,
                    tex_coeff: np.ndarray, normalize: bool = True) -> np.ndarray:
    """[80] tex coeff -> per-vertex RGB texture [N, 3] (bfm.py:129-141)."""
    tex = tex_base @ np.asarray(tex_coeff, np.float32) + mean_tex
    if normalize:
        tex = tex / 255.0
    return tex.reshape(-1, 3)


def compute_vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals [N, 3] (bfm.py:144-164; the reference
    sums un-normalised... actually normalised face normals over the
    point_buf adjacency — scatter-add over faces gives the same sum)."""
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    e1 = v[f[:, 0]] - v[f[:, 1]]
    e2 = v[f[:, 1]] - v[f[:, 2]]
    fn = np.cross(e1, e2)
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def compute_color(texture: np.ndarray, normals: np.ndarray,
                  gamma: np.ndarray) -> np.ndarray:
    """SH-lit per-vertex color [N, 3] (bfm.py:167-198).

    texture [N,3] in [0,1]; normals [N,3] (rotated); gamma [27] SH coeffs."""
    a, c = SH_A, SH_C
    g = np.asarray(gamma, np.float32).reshape(3, 9) + INIT_LIT[None]
    g = g.T  # [9, 3]
    n = np.asarray(normals, np.float32)
    nx, ny, nz = n[:, :1], n[:, 1:2], n[:, 2:]
    Y = np.concatenate([
        a[0] * c[0] * np.ones_like(nx),
        -a[1] * c[1] * ny,
        a[1] * c[1] * nz,
        -a[1] * c[1] * nx,
        a[2] * c[2] * nx * ny,
        -a[2] * c[2] * ny * nz,
        0.5 * a[2] * c[2] / np.sqrt(3.0) * (3.0 * nz ** 2 - 1.0),
        -a[2] * c[2] * nx * nz,
        0.5 * a[2] * c[2] * (nx ** 2 - ny ** 2),
    ], axis=-1)  # [N, 9]
    shading = Y @ g  # [N, 3]
    return shading * np.asarray(texture, np.float32)


def rasterize_projected(
    pts: np.ndarray,  # [N, 2] pixel coords (x=col, y=row)
    z: np.ndarray,  # [N] positive camera depth per vertex
    faces: np.ndarray,  # [F, 3] int
    attrs: np.ndarray,  # [N, C] per-vertex attributes (e.g. color)
    H: int,
    W: int,
    patch: int = 16,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Z-buffer rasterise already-projected vertices with perspective-correct
    barycentric attribute interpolation. Vectorised over faces: each face
    rasterises a fixed patch×patch pixel window around its bbox (triangles
    are a few px at 224-512 render sizes), far-to-near painter's assignment
    resolves depth. Projection-agnostic core shared by rasterize_mesh (BFM
    convention) and data/synthetic_face.py (the NeRF pixel_rays pinhole).

    Returns (mask [H,W] bool, depth [H,W] f32 (+inf empty), image [H,W,C]).
    """
    pts = np.asarray(pts, np.float32)
    z = np.asarray(z, np.float32)
    f = np.asarray(faces, np.int64)
    tri = pts[f]  # [F, 3, 2]
    tz = np.maximum(z[f], 1e-4)  # [F, 3]
    ta = np.asarray(attrs, np.float32)[f]  # [F, 3, C]

    # cull: degenerate / fully offscreen / behind-camera faces
    x0 = np.floor(tri[..., 0].min(1)).astype(np.int64)
    y0 = np.floor(tri[..., 1].min(1)).astype(np.int64)
    x1 = np.ceil(tri[..., 0].max(1)).astype(np.int64)
    y1 = np.ceil(tri[..., 1].max(1)).astype(np.int64)
    keep = (x1 >= 0) & (y1 >= 0) & (x0 < W) & (y0 < H)
    keep &= (x1 - x0 <= patch) & (y1 - y0 <= patch)  # window cap
    keep &= (z[f] > 1e-4).all(1)
    tri, tz, ta, x0, y0 = tri[keep], tz[keep], ta[keep], x0[keep], y0[keep]
    F = len(tri)
    C = ta.shape[-1]
    mask = np.zeros((H, W), bool)
    depth = np.full((H, W), np.inf, np.float32)
    img = np.zeros((H, W, C), np.float32)
    if F == 0:
        return mask, depth, img

    # pixel grid per face: [F, P, P] absolute coords
    dy, dx = np.mgrid[0:patch, 0:patch]
    px = (x0[:, None, None] + dx[None]).reshape(F, -1)  # [F, P*P]
    py = (y0[:, None, None] + dy[None]).reshape(F, -1)
    pxf = px + 0.5
    pyf = py + 0.5

    # barycentric coords (vectorised): T @ [l1, l2] = p - c
    ax, ay = tri[:, 0, 0], tri[:, 0, 1]
    bx, by = tri[:, 1, 0], tri[:, 1, 1]
    cx, cy = tri[:, 2, 0], tri[:, 2, 1]
    det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
    det = np.where(np.abs(det) < 1e-9, 1e-9, det)
    l1 = ((by - cy)[:, None] * (pxf - cx[:, None]) + (cx - bx)[:, None] * (pyf - cy[:, None])) / det[:, None]
    l2 = ((cy - ay)[:, None] * (pxf - cx[:, None]) + (ax - cx)[:, None] * (pyf - cy[:, None])) / det[:, None]
    l3 = 1.0 - l1 - l2
    inside = (l1 >= -1e-5) & (l2 >= -1e-5) & (l3 >= -1e-5)
    inside &= (px >= 0) & (px < W) & (py >= 0) & (py < H)

    # perspective-correct interpolation of z and attributes
    w1, w2, w3 = l1 / tz[:, :1], l2 / tz[:, 1:2], l3 / tz[:, 2:]
    wsum = w1 + w2 + w3
    pz = 1.0 / np.maximum(wsum, 1e-12)
    pa = (w1[..., None] * ta[:, None, 0] + w2[..., None] * ta[:, None, 1]
          + w3[..., None] * ta[:, None, 2]) * pz[..., None]

    # painter's algorithm: sort candidate pixels far -> near, assign in order
    fi, pi = np.nonzero(inside)
    order = np.argsort(-pz[fi, pi], kind="stable")
    fi, pi = fi[order], pi[order]
    yy, xx = py[fi, pi], px[fi, pi]
    img[yy, xx] = pa[fi, pi]
    depth[yy, xx] = pz[fi, pi]
    mask[yy, xx] = True
    return mask, depth, img


def rasterize_mesh(
    vertices_cam: np.ndarray,  # [N, 3], camera space, +z away from camera
    faces: np.ndarray,  # [F, 3] int
    attrs: np.ndarray,  # [N, C] per-vertex attributes (e.g. color)
    size: int = 224,
    focal: float = 1015.0,
    center: float = 112.0,
    patch: int = 16,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Perspective-project (BFM camera convention, y up) + z-buffer
    rasterise. Returns (mask [S,S] bool, depth [S,S], image [S,S,C])."""
    v = np.asarray(vertices_cam, np.float32)
    z = np.maximum(v[:, 2], 1e-4)
    sx = (v[:, 0] * focal / z + center) * (size / (2.0 * center))
    sy = (size - 1.0) - (v[:, 1] * focal / z + center) * (size / (2.0 * center))
    pts = np.stack([sx, sy], -1)  # [N, 2] pixel coords
    return rasterize_projected(pts, z, faces, attrs, size, size, patch=patch)


class SECCRenderer:
    """SECC map renderer (secc_renderer.py:10-60): BFM mesh rasterised with
    per-vertex NCC colors, eye faces removed; -> (mask, secc in [-1, 1]).

    Needs the full BFM basis (mean_shape/id_base/exp_base over the mesh +
    face_buf); pass them explicitly or via a Face3DHelper carrying full
    buffers. ncc_code defaults to min-max normalised canonical positions.
    """

    def __init__(self, mean_shape, id_base, exp_base, faces,
                 ncc_code: Optional[np.ndarray] = None,
                 camera_distance: float = 10.0,
                 focal: float = 1015.0, center: float = 112.0,
                 size: Optional[int] = None):
        self.mean_shape = np.asarray(mean_shape, np.float32).reshape(-1, 3)
        self.id_base = np.asarray(id_base, np.float32)
        self.exp_base = np.asarray(exp_base, np.float32)
        self.faces = np.asarray(faces, np.int64)
        self.camera_distance = camera_distance
        self.focal, self.center = focal, center
        self.size = size or int(2 * center)
        if ncc_code is None:
            v = self.mean_shape
            lo, hi = v.min(0), v.max(0)
            ncc_code = (v - lo) / np.maximum(hi - lo, 1e-8)
        self.ncc_code = np.asarray(ncc_code, np.float32)

    def vertices(self, id_coeff, exp_coeff, euler, trans) -> np.ndarray:
        """Posed camera-space vertices (bfm.py:236-239,255-265 semantics)."""
        import jax.numpy as jnp

        from genefaceplusplus_tpu.utils.rotation import compute_bfm_rotation

        n = self.mean_shape.size
        shape = (self.mean_shape.reshape(-1)
                 + self.id_base[:n] @ np.asarray(id_coeff, np.float32)
                 + self.exp_base[:n] @ np.asarray(exp_coeff, np.float32)).reshape(-1, 3)
        rot = np.asarray(compute_bfm_rotation(jnp.asarray(euler)[None]))[0]
        posed = shape @ rot + np.asarray(trans, np.float32)[None]
        posed[:, 2] = self.camera_distance - posed[:, 2]  # to_camera
        return posed

    def render(self, id_coeff, exp_coeff, euler, trans):
        """-> (mask [S,S] bool, secc [S,S,3] in [-1,1], black(-1) bg)."""
        v = self.vertices(id_coeff, exp_coeff, euler, trans)
        mask, _, img = rasterize_mesh(
            v, self.faces, self.ncc_code, size=self.size,
            focal=self.focal, center=self.center,
        )
        secc = img * 2.0 - 1.0
        secc[~mask] = -1.0
        return mask, secc
