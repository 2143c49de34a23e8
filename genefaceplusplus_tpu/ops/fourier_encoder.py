"""Learnable multi-scale Fourier position features — the TPU-native
replacement for instant-NGP hash/tiled grid encoders.

Rationale (measured on TPU v5e, see docs/DESIGN.md):
  * XLA gather ~= 7 ns/element; the reference grid encoder needs 134M
    gathers/frame at 256^2 x 16 samples -> seconds/frame. Mosaic's only
    vector gather (tpu.dynamic_gather) shuffles within one 8-sublane vreg.
    Table-lookup encodings are therefore structurally gather-bound on TPU.
  * The MXU is the opposite: a [N,3]x[3,F] projection + sin/cos + wider
    MLPs is essentially free at these sizes. instant-NGP's grid exists to
    SHRINK the MLP on gather-friendly GPUs; on TPU the hardware-matched
    design inverts that trade.

gamma(x) = [sin(2*pi x @ B^T), cos(2*pi x @ B^T)], B [F, D] learnable,
initialised N(0, sigma_f^2) with sigma_f log-spaced over [min_scale,
max_scale] across F rows — mimicking the multi-resolution level structure
of the grid encoder (base 16 -> desired 2048, grid.py:104-134).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.ops.fastmath import fast_cos, fast_sin


def multiscale_scales(num_features: int, min_scale: float, max_scale: float) -> np.ndarray:
    """Log-spaced per-row frequency scales (analogue of grid levels)."""
    return np.logspace(np.log10(min_scale), np.log10(max_scale), num_features).astype(np.float32)


class FourierEncoder(nn.Module):
    """[..., D] in [-bound, bound] -> [..., 2*num_features]."""

    input_dim: int = 3
    num_features: int = 128
    min_scale: float = 1.0
    max_scale: float = 256.0

    @property
    def output_dim(self) -> int:
        return 2 * self.num_features

    @nn.compact
    def __call__(self, x: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
        scales = multiscale_scales(self.num_features, self.min_scale, self.max_scale)

        def init_B(key):
            return jax.random.normal(key, (self.num_features, self.input_dim)) * scales[:, None]

        B = self.param("B", init_B)
        x01 = x / bound  # [-1, 1]
        proj = (2.0 * math.pi) * (x01 @ B.T.astype(x01.dtype))
        # fast polynomial sin/cos: XLA's exact sin is ~107 cycles/element on
        # TPU (ops/fastmath.py) and would dominate the whole field eval
        return jnp.concatenate([fast_sin(proj), fast_cos(proj)], axis=-1)
