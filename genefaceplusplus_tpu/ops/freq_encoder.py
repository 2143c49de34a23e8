"""NeRF positional (frequency) encoding.

Parity: /root/reference/modules/radnerfs/encoders/freqencoder/src/freqencoder.cu:28-57.
Layout: [x_0..x_{D-1}, sin(2^0 x_*), cos(2^0 x_*), sin(2^1 x_*), cos(2^1 x_*), ...]
(each frequency block repeats all D dims). Output dim = D + D * 2 * degree.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree


def freq_encode(x: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """x: [..., D] -> [..., D + D*2*degree]."""
    outs = [x]
    for f in range(degree):
        scaled = x * (2.0 ** f)
        outs.append(jnp.sin(scaled))
        outs.append(jnp.cos(scaled))
    return jnp.concatenate(outs, axis=-1)
