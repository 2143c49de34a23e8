"""Pitch (F0) quantisation utilities.

Behavioural parity with /root/reference/utils/commons/pitch_utils.py:17-26:
256-bin mel-scale quantiser over [50, 1100] Hz; bin 1 = unvoiced/low, bin 255
= top. Pure jnp, jit-safe (no asserts on traced values).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127.0 * np.log(1.0 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * np.log(1.0 + F0_MAX / 700.0)


def f0_to_coarse(f0: jnp.ndarray) -> jnp.ndarray:
    """Quantise F0 in Hz to integer bins in [1, 255]. 0 Hz (unvoiced) -> 1."""
    f0 = jnp.asarray(f0)
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1.0
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, F0_BIN - 1)
    # reference uses (x + 0.5).long() == floor(x + 0.5)
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def coarse_to_f0(coarse: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`f0_to_coarse` (bin centres); bin 1 -> 0 Hz."""
    coarse = jnp.asarray(coarse)
    uv = coarse == 1
    f0_mel = (coarse - 1) * (F0_MEL_MAX - F0_MEL_MIN) / (F0_BIN - 2) + F0_MEL_MIN
    f0 = (jnp.exp(f0_mel / 1127.0) - 1.0) * 700.0
    return jnp.where(uv, 0.0, f0)
