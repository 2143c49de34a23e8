"""SECC (Semantic-Encoded Color Coding) debug rendering.

Parity: SECC_Renderer, /root/reference/deep_3drecon/secc_renderer.py —
renders the BFM face mesh with per-vertex NCC colors (normalized coordinate
code: the canonical vertex position min-max normalised to [0,1]^3,
`ncc_code.npy`). Used ONLY for --debug visualisation at inference
(genefacepp_infer.py:313-331).

This environment has no mesh rasteriser (pytorch3d absent), so this is a
depth-sorted point-splat renderer — adequate for the debug-panel purpose;
a real rasteriser can be slotted into `render_secc` later.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def ncc_colors(canonical_vertices: np.ndarray) -> np.ndarray:
    """Per-vertex NCC color = min-max normalised canonical position [N,3]."""
    v = np.asarray(canonical_vertices, np.float32)
    lo, hi = v.min(0, keepdims=True), v.max(0, keepdims=True)
    return (v - lo) / np.maximum(hi - lo, 1e-8)


def render_secc(
    vertices_cam: np.ndarray,  # [N, 3] camera-space vertices (z > 0 toward cam)
    colors: Optional[np.ndarray] = None,  # [N, 3] in [0,1]; default NCC
    size: int = 224,
    focal: float = 1015.0,
    center: float = 112.0,
    splat: int = 2,
) -> np.ndarray:
    """Depth-sorted splat render -> uint8 RGB [size, size, 3] (black bg)."""
    v = np.asarray(vertices_cam, np.float32)
    if colors is None:
        colors = ncc_colors(v)
    z = np.maximum(v[:, 2], 1e-3)
    x = (v[:, 0] * focal / z + center) * (size / 224.0)
    y = (size - 1) - (v[:, 1] * focal / z + center) * (size / 224.0)

    order = np.argsort(-z)  # far first; near overwrites
    img = np.zeros((size, size, 3), np.float32)
    xi = np.clip(x[order].astype(np.int32), 0, size - 1)
    yi = np.clip(y[order].astype(np.int32), 0, size - 1)
    c = np.asarray(colors, np.float32)[order]
    for dy in range(-(splat // 2), splat // 2 + 1):
        for dx in range(-(splat // 2), splat // 2 + 1):
            img[np.clip(yi + dy, 0, size - 1), np.clip(xi + dx, 0, size - 1)] = c
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def render_secc_from_coeffs(helper, id_coeff, exp_coeff, euler, trans, size: int = 224):
    """Debug panel from fitted coefficients using the keypoint subset of the
    basis (the full 35709-vertex basis needs the licensed BFM .mat)."""
    import jax.numpy as jnp

    lm3d = helper.reconstruct_key_lm3d(
        jnp.asarray(id_coeff), jnp.asarray(exp_coeff),
        jnp.asarray(euler), jnp.asarray(trans), to_camera=True,
    )
    v = np.asarray(lm3d[0])
    colors = ncc_colors(np.asarray(helper.key_mean_shape))
    return render_secc(v, colors, size=size, splat=4)
