"""Fast VPU-friendly transcendentals for the field hot path.

Measured on TPU v5e (docs/DESIGN.md): XLA's exact f32 sin/tanh lower to
~107 cycles/element (Payne-Hanek-grade range reduction) — one sin over a
[1M,128] activation costs ~16 ms, making transcendentals the field's
bottleneck. Fourier-feature inputs are bounded and feed bf16 matmuls, so a
cheap periodic range reduction + odd minimax polynomial (~10 flops, max err
~3e-6) is exact for all practical purposes here.

These definitions ARE the framework's field nonlinearities (used in both
training and inference paths, so the train/infer function is identical).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * np.pi
_INV_TWO_PI = 1.0 / _TWO_PI

# least-squares-fitted odd polynomial for sin(2*pi*t), t in [-0.5, 0.5]
# (degree 9; max abs err 1.7e-5 — below bf16 feature resolution)
_S1 = 6.2830885
_S3 = -41.3332475
_S5 = 81.4000898
_S7 = -74.6758839
_S9 = 33.1680946


def _sin_poly(t: jnp.ndarray) -> jnp.ndarray:
    t2 = t * t
    return t * (_S1 + t2 * (_S3 + t2 * (_S5 + t2 * (_S7 + t2 * _S9))))


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x) via periodic reduction + degree-9 odd polynomial."""
    u = x * _INV_TWO_PI
    t = u - jnp.round(u)  # [-0.5, 0.5]
    return _sin_poly(t)


def fast_cos(x: jnp.ndarray) -> jnp.ndarray:
    return fast_sin(x + 0.5 * jnp.pi)


def fast_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """Rational tanh approximation (Lambert-style, clamped), max err ~3e-4."""
    x = jnp.clip(x, -7.9, 7.9)
    x2 = x * x
    # Pade-like (from the classic 5/4 rational approx of tanh)
    num = x * (135135.0 + x2 * (17325.0 + x2 * (378.0 + x2)))
    den = 135135.0 + x2 * (62370.0 + x2 * (3150.0 + x2 * 28.0))
    return jnp.clip(num / den, -1.0, 1.0)
