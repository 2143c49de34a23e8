"""Morton (Z-order) codes, occupancy bitfield pack/unpack, grid dilation.

Parity targets in /root/reference/modules/radnerfs/raymarching/src/raymarching.cu:
  __morton3D / __morton3D_invert (:56-83), kernel_packbits (:268-289),
  kernel_morton3D_dilation 6-neighbourhood max (:304-336).

TPU-native note: morton order is a GPU cache-locality artefact. The runtime
occupancy structure here is a plain spatial [CAS, H, H, H] array (gathers are
layout-agnostic on TPU); these utilities exist for (a) density-grid
maintenance parity and (b) import/export of reference-format checkpoints
(density_grid / density_bitfield buffers, renderer.py:93-96).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] int coords (< 2^10) -> [...] uint32 morton codes."""
    xx = _expand_bits(coords[..., 0])
    yy = _expand_bits(coords[..., 1])
    zz = _expand_bits(coords[..., 2])
    return xx | (yy << 1) | (zz << 2)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """[...] uint32 morton codes -> [..., 3] int32 coords."""
    codes = codes.astype(jnp.uint32)
    x = _compact_bits(codes)
    y = _compact_bits(codes >> 1)
    z = _compact_bits(codes >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def morton_permutation(H: int) -> np.ndarray:
    """perm such that grid_morton[perm[i]] == grid_spatial_flat[i] for a
    [H,H,H] x-major flattened grid; i.e. perm maps spatial idx -> morton idx."""
    coords = np.stack(np.meshgrid(np.arange(H), np.arange(H), np.arange(H), indexing="ij"), -1)
    coords = coords.reshape(-1, 3)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    return codes.astype(np.int64)


def spatial_to_morton(grid_spatial: jnp.ndarray) -> jnp.ndarray:
    """[CAS, H, H, H] -> [CAS, H^3] in morton order (reference layout)."""
    CAS, H = grid_spatial.shape[0], grid_spatial.shape[1]
    perm = morton_permutation(H)
    flat = grid_spatial.reshape(CAS, -1)
    out = jnp.zeros_like(flat)
    return out.at[:, perm].set(flat)


def morton_to_spatial(grid_morton: jnp.ndarray, H: int) -> jnp.ndarray:
    """[CAS, H^3] morton order -> [CAS, H, H, H] spatial."""
    CAS = grid_morton.shape[0]
    perm = morton_permutation(H)
    return grid_morton[:, perm].reshape(CAS, H, H, H)


def packbits(grid_morton_flat: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """[M] float (morton-or-any order) -> [M//8] uint8 bitfield, bit i = LSB-first."""
    bits = (grid_morton_flat > thresh).reshape(-1, 8).astype(jnp.uint8)
    shifts = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    return (bits * shifts[None, :]).sum(axis=-1).astype(jnp.uint8)


def unpackbits(bitfield: jnp.ndarray) -> jnp.ndarray:
    """[M//8] uint8 -> [M] bool, LSB-first (matches CUDA bit order)."""
    b = bitfield[:, None].astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return ((b >> shifts[None, :]) & 1).astype(jnp.bool_).reshape(-1)


def bitfield_to_occupancy(bitfield: jnp.ndarray, cascade: int, H: int) -> jnp.ndarray:
    """Reference density_bitfield [CAS*H^3/8] uint8 -> spatial [CAS,H,H,H] bool."""
    flat = unpackbits(bitfield).reshape(cascade, H * H * H)
    return morton_to_spatial(flat, H).astype(jnp.bool_)


def occupancy_to_bitfield(occ: jnp.ndarray) -> jnp.ndarray:
    """Spatial [CAS,H,H,H] bool -> reference-format uint8 bitfield."""
    m = spatial_to_morton(occ.astype(jnp.float32))
    return packbits(m.reshape(-1), 0.5)


def dilate6(grid: jnp.ndarray) -> jnp.ndarray:
    """6-neighbourhood max dilation of [CAS, H, H, H] (kernel_morton3D_dilation)."""
    g = grid
    out = g
    for axis in (1, 2, 3):
        fwd = jnp.concatenate([g.take(jnp.arange(1, g.shape[axis]), axis=axis),
                               g.take(jnp.asarray([g.shape[axis] - 1]), axis=axis)], axis=axis)
        bwd = jnp.concatenate([g.take(jnp.asarray([0]), axis=axis),
                               g.take(jnp.arange(0, g.shape[axis] - 1), axis=axis)], axis=axis)
        # boundary handling: the CUDA kernel skips out-of-range neighbours,
        # equivalent to edge-replicated max with the centre value
        out = jnp.maximum(out, jnp.maximum(fwd, bwd))
    return out
