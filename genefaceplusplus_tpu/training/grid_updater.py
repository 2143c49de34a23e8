"""Density-grid maintenance: the occupancy data-structure lifecycle.

Parity: NeRFRenderer.update_extra_state + mark_untrained_grid
(/root/reference/modules/radnerfs/renderer.py:131-284) and the torso 2D
variant (radnerf_torso_sr.py:246-288):
  * every update_extra_interval steps: query sigma on jittered grid-cell
    centres with a random condition, 6-neighbourhood dilate, EMA
    grid = max(grid*0.95, tmp) on trained cells, threshold
    min(mean_density, density_thresh) -> occupancy bitfield
  * mark_untrained_grid: cells never seen by any training camera get -1
    (permanently unoccupied)

TPU-native: grids live spatially as [H, H, H] (morton order is a GPU cache
artefact — see ops/morton.py for reference-format import/export); the sigma
sweep is a single batched field eval (2M points of pure MXU work for the
Fourier field), chunked to bound memory.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.ops.morton import dilate6


def grid_cell_centers(grid_size: int) -> jnp.ndarray:
    """[H^3, 3] cell-centre coords in [-1, 1] (spatial x-major order)."""
    lin = (2.0 * jnp.arange(grid_size, dtype=jnp.float32) / (grid_size - 1)) - 1.0
    x, y, z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    return jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)


def update_density_grid(
    density_fn,
    density_grid: jnp.ndarray,  # [H, H, H] float (-1 = untrained)
    rng: jax.Array,
    bound: float = 1.0,
    decay: float = 0.95,
    density_thresh: float = 10.0,
    chunk: int = 262144,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One EMA refresh. density_fn: [N,3] -> sigma [N].

    Returns (new_grid, occupancy bool [H,H,H], mean_density scalar).
    """
    H = density_grid.shape[0]
    pts = grid_cell_centers(H)
    half = bound / H
    jitter = jax.random.uniform(rng, pts.shape, minval=-half, maxval=half)
    pts = pts * (bound - half) + jitter

    n = pts.shape[0]
    if n > chunk:
        # lax.map over fixed-size chunks: peak activation memory is bounded
        # by one chunk, and the whole sweep is a single scan dispatch
        # (jittable; eager it is still one compiled loop, not n/chunk
        # round-trips through the device tunnel)
        n_chunks = -(-n // chunk)
        pts_p = jnp.pad(pts, ((0, n_chunks * chunk - n), (0, 0)))
        sigmas = jax.lax.map(density_fn, pts_p.reshape(n_chunks, chunk, 3))
        tmp = sigmas.reshape(-1)[:n].reshape(H, H, H)
    else:
        tmp = density_fn(pts).reshape(H, H, H)

    tmp = dilate6(tmp[None])[0]
    valid = (density_grid >= 0) & (tmp >= 0)
    new_grid = jnp.where(valid, jnp.maximum(density_grid * decay, tmp), density_grid)
    mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))
    thresh = jnp.minimum(mean_density, density_thresh)
    occupancy = new_grid > thresh
    return new_grid, occupancy, mean_density


def mark_untrained_grid(
    density_grid: jnp.ndarray,  # [H, H, H]
    poses: np.ndarray,  # [B, 4, 4] ngp c2w
    intrinsics,  # (fx, fy, cx, cy)
    bound: float = 1.0,
    chunk: int = 32768,
) -> jnp.ndarray:
    """Cells outside every training camera frustum -> -1 (renderer.py:131-199).

    Chunked over cells with lax.map: the naive [B poses, H^3 cells, 3]
    broadcast is ~10 GB at B=400/H=128; per-chunk it is B*chunk*3 floats
    (~160 MB) and the sweep is one scan dispatch."""
    H = density_grid.shape[0]
    fx, fy, cx, cy = intrinsics
    pts = grid_cell_centers(H) * (bound - bound / H)  # [N, 3]
    poses = jnp.asarray(poses, jnp.float32)
    half = bound / H

    def seen_chunk(p):  # [chunk, 3] -> [chunk] bool
        # world -> cam: (p - t) @ R (c2w rotation transposed twice,
        # renderer.py:181-183)
        cam = (p[None, :, :] - poses[:, None, :3, 3]) @ poses[:, :3, :3]
        mask_z = cam[..., 2] > 0
        mask_x = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
        mask_y = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
        return (mask_z & mask_x & mask_y).any(axis=0)

    n = pts.shape[0]
    if n > chunk:
        n_chunks = -(-n // chunk)
        pts_p = jnp.pad(pts, ((0, n_chunks * chunk - n), (0, 0)))
        seen = jax.lax.map(seen_chunk, pts_p.reshape(n_chunks, chunk, 3))
        seen = seen.reshape(-1)[:n]
    else:
        seen = seen_chunk(pts)
    return jnp.where(seen.reshape(H, H, H), density_grid, -1.0)


def update_torso_grid(
    alpha_fn,
    grid2d: jnp.ndarray,  # [H, H]
    rng: jax.Array,
    decay: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Torso 2D alpha-grid refresh (radnerf_torso_sr.py:246-288):
    alpha at jittered 2D cell centres, 5x5 max-pool dilation, EMA max."""
    H = grid2d.shape[0]
    lin = (2.0 * jnp.arange(H, dtype=jnp.float32) / (H - 1)) - 1.0
    x, y = jnp.meshgrid(lin, lin, indexing="ij")
    pts = jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
    half = 1.0 / H
    pts = pts * (1 - half) + jax.random.uniform(rng, pts.shape, minval=-half, maxval=half)
    alphas = alpha_fn(pts).reshape(H, H)
    # 5x5 max pool, stride 1, same padding
    dil = jax.lax.reduce_window(
        alphas, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME"
    )
    new_grid = jnp.maximum(grid2d * decay, dil)
    return new_grid, jnp.mean(new_grid)
