"""Ray generation from camera poses — static-shape, jit/vmap friendly.

Parity target: get_rays / get_bg_coords, /root/reference/modules/radnerfs/utils.py:274-364.

TPU-first differences from the reference:
  * random-ray sampling takes a `jax.random` key instead of global torch RNG
  * rect cropping returns a fixed-size index set (static shapes under jit);
    callers pad the rect to a static size
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_bg_coords(H: int, W: int) -> jnp.ndarray:
    """Normalised per-pixel coords [1, H*W, 2] in [-1, 1] (row-major, x=row)."""
    xs = jnp.arange(H, dtype=jnp.float32) / (H - 1) * 2 - 1
    ys = jnp.arange(W, dtype=jnp.float32) / (W - 1) * 2 - 1
    xx, yy = jnp.meshgrid(xs, ys, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)[None]


def pixel_rays(
    poses: jnp.ndarray,
    intrinsics: Tuple[float, float, float, float],
    H: int,
    W: int,
    inds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rays for pixel indices.

    Args:
      poses: [B, 4, 4] c2w.
      intrinsics: (fx, fy, cx, cy).
      inds: optional [B, N] flattened pixel indices (row-major i*W+j);
        None -> all H*W pixels.
    Returns:
      rays_o, rays_d: [B, N, 3]; inds: [B, N].
    """
    B = poses.shape[0]
    fx, fy, cx, cy = intrinsics
    if inds is None:
        inds = jnp.broadcast_to(jnp.arange(H * W, dtype=jnp.int32)[None], (B, H * W))
    # reference: i = column (x/W axis), j = row; with meshgrid transposed such
    # that flat index walks rows of [H, W]: i = inds % W, j = inds // W
    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5

    zs = jnp.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    directions = jnp.stack([xs, ys, zs], axis=-1)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    rays_d = jnp.einsum("bnc,brc->bnr", directions, poses[:, :3, :3])
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    return rays_o, rays_d, inds


from functools import lru_cache


@lru_cache(maxsize=64)
def _pixel_rays_compiled(intrinsics, H, W, with_inds):
    if with_inds:
        return jax.jit(lambda poses, inds: pixel_rays(poses, intrinsics, H, W, inds))
    return jax.jit(lambda poses: pixel_rays(poses, intrinsics, H, W))


def pixel_rays_jit(poses, intrinsics, H: int, W: int, inds=None):
    """Compiled pixel_rays, cached per (intrinsics, H, W, inds-or-not).

    The eager version is ~10 separate dispatches; in a per-step host loop
    through the network device tunnel (~26 ms each) that dominates the
    step. One compiled call amortises to ~1 dispatch."""
    import numpy as np

    intr = tuple(float(x) for x in np.asarray(intrinsics).reshape(-1))
    if inds is None:
        return _pixel_rays_compiled(intr, int(H), int(W), False)(poses)
    return _pixel_rays_compiled(intr, int(H), int(W), True)(poses, jnp.asarray(inds))


def sample_ray_indices(
    key: jax.Array,
    H: int,
    W: int,
    N: int,
    B: int = 1,
) -> jnp.ndarray:
    """Uniform random pixel indices [B, N] (with replacement, as reference)."""
    return jax.random.randint(key, (B, N), 0, H * W, dtype=jnp.int32)


def rect_indices(rect: Tuple[int, int, int, int], W: int) -> jnp.ndarray:
    """Flattened indices of rect (xmin, xmax, ymin, ymax) — static shape.

    Reference semantics (utils.py:334-341): mask[xmin:xmax, ymin:ymax] with x
    as the ROW axis of the [H, W] image.
    """
    xmin, xmax, ymin, ymax = rect
    rows = jnp.arange(xmin, xmax, dtype=jnp.int32)
    cols = jnp.arange(ymin, ymax, dtype=jnp.int32)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    return (rr * W + cc).reshape(1, -1)


def get_rays(
    poses: jnp.ndarray,
    intrinsics: Tuple[float, float, float, float],
    H: int,
    W: int,
    N: int = -1,
    key: Optional[jax.Array] = None,
    rect: Optional[Tuple[int, int, int, int]] = None,
):
    """Convenience wrapper mirroring the reference get_rays() return dict."""
    B = poses.shape[0]
    if rect is not None:
        inds = jnp.broadcast_to(rect_indices(rect, W), (B, (rect[1] - rect[0]) * (rect[3] - rect[2])))
    elif N > 0:
        assert key is not None, "random sampling requires a PRNG key"
        inds = sample_ray_indices(key, H, W, min(N, H * W), B)
    else:
        inds = None
    rays_o, rays_d, inds = pixel_rays(poses, intrinsics, H, W, inds)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}
