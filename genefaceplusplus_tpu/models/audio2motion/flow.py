"""Invertible normalizing-flow prior: residual coupling blocks.

Parity: ResidualCouplingLayer / ResidualCouplingBlock / Flip,
/root/reference/modules/audio2motion/flow_base.py:614-703 — mean-only
affine coupling (logs=0, pure shift), zero-initialised `post` projection,
channel-flip between flows, WN inner network with global conditioning.

Feature-last [B, T, C]; `reverse=True` inverts exactly (tested).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from genefaceplusplus_tpu.models.audio2motion.wavenet import WN


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False):
        half = self.channels // 2
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, kernel_size=(1,), name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g)
        out_ch = half * (1 if self.mean_only else 2)
        stats = nn.Conv(
            out_ch,
            kernel_size=(1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="post",
        )(h) * x_mask
        if self.mean_only:
            m = stats
            logs = jnp.zeros_like(m)
        else:
            m, logs = stats[..., :half], stats[..., half:]

        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        self.flows = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                gin_channels=self.gin_channels,
                mean_only=True,
                name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]

    def __call__(self, x, x_mask=None, g=None, reverse: bool = False):
        # [coupling, flip] x n_flows; flip reverses the channel axis
        if not reverse:
            for flow in self.flows:
                x = flow(x, x_mask, g=g, reverse=False)
                x = jnp.flip(x, axis=-1)
        else:
            for flow in reversed(self.flows):
                x = jnp.flip(x, axis=-1)
                x = flow(x, x_mask, g=g, reverse=True)
        return x
