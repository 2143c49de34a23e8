"""Non-causal WaveNet stack with gated activations and global conditioning.

Parity: WN, /root/reference/modules/audio2motion/flow_base.py:21-117 —
dilated Conv1d -> gated tanh/sigmoid (+ cond 1x1 projection per layer) ->
residual/skip 1x1. Feature-last layout [B, T, C].

Note: the reference wraps convs in torch weight_norm; that reparametrisation
only affects optimisation geometry, not the function class — we train plain
convs (a checkpoint converter folds weight_g*v/||v|| into a single kernel).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, H]
        x_mask: Optional[jnp.ndarray] = None,  # [B, T, 1] or None
        g: Optional[jnp.ndarray] = None,  # [B, T, gin]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        H = self.hidden_channels
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        output = jnp.zeros_like(x)

        if g is not None and self.gin_channels > 0:
            g_all = nn.Conv(2 * H * self.n_layers, kernel_size=(1,), name="cond_layer")(g)
        else:
            g_all = None

        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            pad = (self.kernel_size * dilation - dilation) // 2
            x_in = nn.Conv(
                2 * H,
                kernel_size=(self.kernel_size,),
                kernel_dilation=(dilation,),
                padding=[(pad, pad)],
                name=f"in_layer_{i}",
            )(x)
            if self.p_dropout > 0:
                x_in = nn.Dropout(self.p_dropout)(x_in, deterministic=deterministic)
            if g_all is not None:
                g_l = g_all[..., i * 2 * H : (i + 1) * 2 * H]
            else:
                g_l = jnp.zeros_like(x_in)

            acts = jnp.tanh(x_in[..., :H] + g_l[..., :H]) * nn.sigmoid(x_in[..., H:] + g_l[..., H:])

            res_skip_ch = 2 * H if i < self.n_layers - 1 else H
            rs = nn.Conv(res_skip_ch, kernel_size=(1,), name=f"res_skip_layer_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + rs[..., :H]) * x_mask
                output = output + rs[..., H:]
            else:
                output = output + rs
        return output * x_mask
