"""Condition (landmark/audio) encoders for the dynamic NeRF.

Parity: /root/reference/modules/radnerfs/cond_encoder.py —
  AudioNet (:98-143): strided Conv1d pyramid win->1 + 2-layer FC -> cond_dim
  AudioAttNet (:146-180): conv attention over the smo window -> softmax
    weights -> weighted sum (temporal smoothing)
  MLP (:183-202): bias-free Linear+ReLU stack

flax.linen, feature-last layout ([B, T, C] convs over T).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def leaky_relu(x, negative_slope=0.02):
    return nn.leaky_relu(x, negative_slope=negative_slope)


def _audio_net_strides(win_size: int) -> Sequence[int]:
    # reference cond_encoder.py:103-114 (note: the reference's `win_size in
    # [5, 8]` branch is a bug — `==` against a list — making 5/8 unreachable;
    # we implement the intended mapping)
    if win_size == 1:
        return (1, 1, 1, 1)
    if win_size == 2:
        return (2, 1, 1, 1)
    if win_size in (3, 4):
        return (2, 2, 1, 1)
    if win_size in (5, 8):
        return (2, 2, 2, 1)
    if win_size == 16:
        return (2, 2, 2, 2)
    raise ValueError(f"unsupported win_size {win_size}")


class AudioNet(nn.Module):
    """[B, T_win, C_in] -> [B, dim_aud] condition feature."""

    dim_in: int = 29
    dim_aud: int = 64
    win_size: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        strides = _audio_net_strides(self.win_size)
        chans = (32, 32, 64, 64)
        h = x
        for c, s in zip(chans, strides):
            h = nn.Conv(c, kernel_size=(3,), strides=(s,), padding=[(1, 1)])(h)
            h = leaky_relu(h)
        # reference squeezes the (now length-1 when win=16 / length-win when
        # strides are 1) time axis via .squeeze(-1) on [B, C, T]; for win=1
        # T stays 1 — take t=0 after the pyramid
        h = h[:, 0, :]
        h = nn.Dense(64)(h)
        h = leaky_relu(h)
        h = nn.Dense(self.dim_aud)(h)
        return h


class AudioAttNet(nn.Module):
    """[T_smo, C] -> [C]: attention-weighted temporal smoothing."""

    in_out_dim: int = 64
    seq_len: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [seq_len, C]; conv over the window axis
        y = x[None, :, : self.in_out_dim]  # [1, T, C]
        for c in (16, 8, 4, 2, 1):
            y = nn.Conv(c, kernel_size=(3,), strides=(1,), padding=[(1, 1)])(y)
            y = leaky_relu(y)
        y = y.reshape(1, self.seq_len)  # [1, T]
        y = nn.Dense(self.seq_len)(y)
        y = nn.softmax(y, axis=1).reshape(self.seq_len, 1)
        return (y * x).sum(axis=0)


class MLP(nn.Module):
    """Bias-free Linear+ReLU stack (cond_encoder.py:183-202).

    `dtype` is the flax computation dtype: bfloat16 halves the HBM traffic
    of the inter-layer activations (params stay f32 in the pytree) — the
    TPU analogue of the reference's fp16 AMP inference
    (genefacepp_infer.py:458,474). None (default) = f32 compute."""

    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in range(self.num_layers):
            out = self.dim_out if layer == self.num_layers - 1 else self.dim_hidden
            x = nn.Dense(out, use_bias=False, dtype=self.dtype)(x)
            if layer != self.num_layers - 1:
                x = nn.relu(x)
        return x
