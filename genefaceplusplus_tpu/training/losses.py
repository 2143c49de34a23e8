"""Training losses for the RAD-NeRF tasks.

Parity: /root/reference/tasks/radnerfs/radnerf.py:123-160 (mse, weights
entropy, masked ambient, psnr) and radnerf_sr.py:224-298 (staged SR losses,
adaptive lambda_ambient controller).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def weights_entropy_loss(weights_sum: jnp.ndarray) -> jnp.ndarray:
    """mean binary entropy (log2) of per-ray opacity (radnerf.py:132-133)."""
    a = jnp.clip(weights_sum, 1e-5, 1.0 - 1e-5)
    return jnp.mean(-a * jnp.log2(a) - (1.0 - a) * jnp.log2(1.0 - a))


def ambient_loss(ambient_sum: jnp.ndarray, face_mask: jnp.ndarray, mode: str = "mae") -> jnp.ndarray:
    """|ambient| outside the face polygon, normalised by count+1
    (radnerf.py:139-141; mae|mse per ambient_loss_mode)."""
    outside = ~face_mask.reshape(-1)
    amb = ambient_sum.reshape(-1)
    if mode == "mse":
        v = amb ** 2
    else:
        v = jnp.abs(amb)
    return (v * outside).sum() / (outside.sum() + 1)


def ambient_ramp(global_step: jnp.ndarray, total: int = 250_000) -> jnp.ndarray:
    """Gradually ramp lambda_ambient over training (radnerf.py:200)."""
    return jnp.minimum(global_step / total, 1.0)


def adaptive_lambda_ambient(
    lambda_ambient: jnp.ndarray,
    ambient_loss_value: jnp.ndarray,
    target: float,
    lr: float = 0.01,
) -> jnp.ndarray:
    """Log10-difference feedback controller toward target_ambient_loss
    (tasks/radnerfs/radnerf_sr.py:290-298):
    lambda += lr * (log10(loss+1e-15) - log10(target+1e-15)), clamp [0, 1000]."""
    grad = jnp.log10(ambient_loss_value + 1e-15) - jnp.log10(target + 1e-15)
    return jnp.clip(lambda_ambient + lr * grad, 0.0, 1000.0)
