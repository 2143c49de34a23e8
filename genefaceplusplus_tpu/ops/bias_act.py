"""Fused bias + activation + gain + clamp.

Parity: /root/reference/modules/eg3ds/torch_utils/ops/bias_act.py
(reference python fallback :37-54; activation gain table). On TPU this is a
plain elementwise chain XLA fuses into adjacent matmuls — no kernel needed.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

# def_gain per activation (bias_act.activation_funcs)
ACT_GAINS = {
    "linear": 1.0,
    "relu": math.sqrt(2.0),
    "lrelu": math.sqrt(2.0),
    "tanh": 1.0,
    "sigmoid": 1.0,
}


def bias_act(
    x: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    act: str = "linear",
    alpha: float = 0.2,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jnp.ndarray:
    """x + b (broadcast over last dim) -> act -> * gain -> clamp to +-clamp."""
    if b is not None:
        x = x + b
    if act == "relu":
        x = jnp.maximum(x, 0)
    elif act == "lrelu":
        x = jnp.where(x >= 0, x, x * alpha)
    elif act == "tanh":
        x = jnp.tanh(x)
    elif act == "sigmoid":
        x = 1.0 / (1.0 + jnp.exp(-x))
    elif act != "linear":
        raise NotImplementedError(act)
    g = ACT_GAINS[act] if gain is None else gain
    if g != 1.0:
        x = x * g
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
