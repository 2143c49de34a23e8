"""Masked volumetric compositing with transmittance early-termination.

Parity: kernel_composite_rays_train_forward,
/root/reference/modules/radnerfs/raymarching/src/raymarching.cu:604-689:
  alpha_i = 1 - exp(-sigma_i * dt_i); w_i = alpha_i * T_i;
  T_{i+1} = T_i * (1 - alpha_i); accumulation stops once T < T_thresh.
  depth accumulates w_i * t_i (t AFTER the step); ambient accumulates the
  raw (unweighted) ambient scalar of every composited sample.

TPU-native: sequential per-ray loops become an exclusive cumulative product
along the static sample axis; "break on T<thresh" becomes a keep-mask
(T_before >= thresh). Fully differentiable via XLA autodiff (the reference
hand-writes this backward, raymarching.cu:712+; autodiff of cumprod-form
compositing is the standard JAX-NeRF formulation and matches it).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompositeResult(NamedTuple):
    weights_sum: jnp.ndarray  # [R]
    ambient_sum: jnp.ndarray  # [R]
    depth: jnp.ndarray  # [R]
    image: jnp.ndarray  # [R, 3]
    weights: jnp.ndarray  # [R, S] (for entropy loss)


def composite_rays(
    sigmas: jnp.ndarray,  # [R, S]
    rgbs: jnp.ndarray,  # [R, S, 3]
    ambient: jnp.ndarray,  # [R, S] (|ambient coord|.sum(-1))
    deltas: jnp.ndarray,  # [R, S]
    ts: jnp.ndarray,  # [R, S] t after step
    mask: jnp.ndarray,  # [R, S] bool: real sample
    T_thresh: float = 1e-4,
) -> CompositeResult:
    sigmas = jnp.where(mask, sigmas, 0.0)
    alphas = 1.0 - jnp.exp(-sigmas * deltas)  # masked sigma=0 -> alpha=0
    one_minus = 1.0 - alphas
    # exclusive cumprod: T_i = prod_{j<i} (1 - alpha_j)
    T = jnp.cumprod(jnp.concatenate([jnp.ones_like(one_minus[:, :1]), one_minus[:, :-1]], axis=1), axis=1)
    # the CUDA loop breaks AFTER compositing sample i when T_{i+1} < thresh,
    # so sample i is composited iff its incoming transmittance T_i >= thresh
    keep = (T >= T_thresh) & mask
    w = alphas * T * keep

    weights_sum = w.sum(axis=-1)
    depth = (w * ts).sum(axis=-1)
    image = (w[..., None] * rgbs).sum(axis=-2)
    ambient_sum = (ambient * keep).sum(axis=-1)  # unweighted, matches CUDA
    return CompositeResult(weights_sum, ambient_sum, depth, image, w)


def composite_weights(
    sigmas: jnp.ndarray,  # [R, S]
    deltas: jnp.ndarray,  # [R, S]
    mask: jnp.ndarray,  # [R, S] bool
    T_thresh: float = 1e-4,
):
    """Composite weights only (no colors): w_i = alpha_i * T_i * keep_i.

    Same math as composite_rays; used by the top-K color-compaction path
    (renderer.py) which needs the weights BEFORE deciding which samples
    get a color evaluation. Returns (weights [R,S], keep [R,S])."""
    sigmas = jnp.where(mask, sigmas, 0.0)
    alphas = 1.0 - jnp.exp(-sigmas * deltas)
    one_minus = 1.0 - alphas
    T = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[:, :1]), one_minus[:, :-1]], axis=1), axis=1
    )
    keep = (T >= T_thresh) & mask
    return alphas * T * keep, keep


def blend_background(image: jnp.ndarray, weights_sum: jnp.ndarray, bg_color) -> jnp.ndarray:
    """image += (1 - weights_sum) * bg; clamp to [0,1] (renderer.py:386-391)."""
    out = image + (1.0 - weights_sum)[..., None] * bg_color
    return jnp.clip(out, 0.0, 1.0)


def normalize_depth(depth: jnp.ndarray, nears: jnp.ndarray, fars: jnp.ndarray) -> jnp.ndarray:
    """(depth - near)/(far - near), clamped at 0 (renderer.py:393)."""
    return jnp.clip(depth - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-8)
