"""StyleGAN2-style 2x super-resolution head (eg3d hybrid).

Parity targets in /root/reference:
  * modules/radnerfs/radnerf_sr.py:14-43 (Superresolution: SynthesisBlockNoUp
    3->128 @256 + SynthesisBlock 128->64 @512, constant ws of ones, w_dim 16,
    conv_clamp 256, channel_base 32768 / channel_max 512)
  * modules/eg3ds/models/networks_stylegan2.py — FullyConnectedLayer (:99),
    modulated_conv2d (:36-96, unfused path which is mathematically identical
    to the fused grouped-conv path), SynthesisLayer (:286), ToRGBLayer
    (:352), SynthesisBlock (:377, 'skip' architecture)
  * modules/eg3ds/models/superresolution.py — SynthesisBlockNoUp

Layout: NHWC images, HWIO conv weights (TPU-native). All resampling goes
through ops/upfirdn2d.py (one depthwise conv per resample).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.ops.bias_act import bias_act
from genefaceplusplus_tpu.ops.upfirdn2d import conv2d_resample, setup_filter, upsample2d

RESAMPLE_FILTER = setup_filter([1, 3, 3, 1])


class FullyConnectedLayer(nn.Module):
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            lambda k: jax.random.normal(k, (self.out_features, in_features)) / self.lr_multiplier,
        )
        w = w * (self.lr_multiplier / math.sqrt(in_features))
        b = None
        if self.use_bias:
            b = self.param("bias", lambda k: jnp.full((self.out_features,), self.bias_init))
            b = b * self.lr_multiplier
        x = x @ w.T.astype(x.dtype)
        return bias_act(x, None if b is None else b.astype(x.dtype), act=self.activation)


def modulated_conv2d(
    x: jnp.ndarray,  # [B, H, W, I]
    weight: jnp.ndarray,  # [kh, kw, I, O]
    styles: jnp.ndarray,  # [B, I]
    noise: Optional[jnp.ndarray] = None,
    up: int = 1,
    padding: int = 0,
    resample_filter: Optional[np.ndarray] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jnp.ndarray:
    """Style-modulated conv (unfused formulation: scale activations before
    and after the conv — identical math to the fused grouped conv)."""
    kh, kw, I, O = weight.shape
    if x.dtype == jnp.bfloat16 and demodulate:
        # low-precision pre-normalisation (networks_stylegan2.py:57-60)
        wnorm = jnp.max(jnp.abs(weight), axis=(0, 1, 2), keepdims=True)
        weight = weight * (1.0 / math.sqrt(I * kh * kw) / wnorm)
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    dcoefs = None
    if demodulate:
        wmod = weight[None] * styles[:, None, None, :, None]  # [B, kh, kw, I, O]
        dcoefs = jax.lax.rsqrt((wmod.astype(jnp.float32) ** 2).sum(axis=(1, 2, 3)) + 1e-8)  # [B, O]

    x = x * styles[:, None, None, :].astype(x.dtype)
    x = conv2d_resample(x, weight, f=resample_filter, up=up, padding=padding, flip_weight=flip_weight)
    if demodulate:
        x = x * dcoefs[:, None, None, :].astype(x.dtype)
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x


class SynthesisLayer(nn.Module):
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    conv_clamp: Optional[float] = 256.0

    @nn.compact
    def __call__(self, x, w, noise_mode: str = "const", gain: float = 1.0,
                 rng: Optional[jax.Array] = None, noise_offset=(0, 0)):
        in_channels = x.shape[-1]
        styles = FullyConnectedLayer(in_channels, bias_init=1.0, name="affine")(w)
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.kernel_size, self.kernel_size, in_channels, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        # spatial output extent: equals the input extent (x self.up) — may be
        # a sub-rect of self.resolution when SR runs on a crop (sr_crop);
        # noise_offset is the crop's top-left at THIS layer's resolution so
        # the sliced const noise stays position-identical to the full frame
        out_h = x.shape[1] * self.up
        out_w = x.shape[2] * self.up
        noise = None
        if self.use_noise and noise_mode != "none":
            strength = self.param("noise_strength", nn.initializers.zeros, ())
            const = self.variable(
                "buffers", "noise_const",
                lambda: jax.random.normal(self.make_rng("params"), (self.resolution, self.resolution)),
            ).value
            if noise_mode == "random":
                assert rng is not None, "noise_mode='random' needs an rng"
                noise = jax.random.normal(rng, (x.shape[0], out_h, out_w, 1)) * strength
            else:  # const
                r0, c0 = noise_offset
                const = const[r0:r0 + out_h, c0:c0 + out_w]
                noise = (const * strength)[None, :, :, None]

        flip_weight = self.up == 1
        x = modulated_conv2d(
            x, weight, styles, noise=noise, up=self.up,
            padding=self.kernel_size // 2, resample_filter=RESAMPLE_FILTER,
            flip_weight=flip_weight,
        )
        act_gain = math.sqrt(2.0) * gain if self.activation == "lrelu" else gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, bias.astype(x.dtype), act=self.activation, gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = 256.0

    @nn.compact
    def __call__(self, x, w):
        in_channels = x.shape[-1]
        styles = FullyConnectedLayer(in_channels, bias_init=1.0, name="affine")(w)
        styles = styles * (1.0 / math.sqrt(in_channels * self.kernel_size ** 2))
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.kernel_size, self.kernel_size, in_channels, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        x = modulated_conv2d(x, weight, styles, demodulate=False)
        return bias_act(x, bias.astype(x.dtype), clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """'skip'-architecture block: conv0(up 2) -> conv1 -> toRGB + upsampled skip."""

    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int = 3
    is_last: bool = False
    up: int = 2
    conv_clamp: Optional[float] = 256.0
    dtype: Any = jnp.float32  # reference runs blocks at fp16 (use_fp16=True,
    # radnerf_sr.py:19-27); bf16 is the TPU equivalent. Params stay f32;
    # the img/skip accumulation stays f32 exactly as the reference's.

    @nn.compact
    def __call__(self, x, img, ws, noise_mode: str = "const", rng: Optional[jax.Array] = None,
                 noise_offset=(0, 0)):
        x = x.astype(self.dtype)
        w_iter = iter([ws[:, i] for i in range(ws.shape[1])])
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        # noise_offset arrives at the block's INPUT resolution; both layers
        # emit at self.resolution (= input * up), so scale once
        off = (noise_offset[0] * self.up, noise_offset[1] * self.up)
        # conv0 exists in both the up-2 block (networks_stylegan2.py:411) and
        # the NoUp block (superresolution.py:193-196); only `up` differs
        x = SynthesisLayer(
            self.out_channels, self.w_dim, self.resolution, up=self.up,
            conv_clamp=self.conv_clamp, name="conv0",
        )(x, next(w_iter), noise_mode=noise_mode, rng=rngs[0], noise_offset=off)
        x = SynthesisLayer(
            self.out_channels, self.w_dim, self.resolution,
            conv_clamp=self.conv_clamp, name="conv1",
        )(x, next(w_iter), noise_mode=noise_mode, rng=rngs[1], noise_offset=off)

        if img is not None and self.up > 1:
            img = upsample2d(img, RESAMPLE_FILTER)
        y = ToRGBLayer(self.img_channels, self.w_dim, conv_clamp=self.conv_clamp, name="torgb")(x, next(w_iter))
        y = y.astype(jnp.float32)
        img = y if img is None else img + y
        return x, img


class Superresolution(nn.Module):
    """2x SR head: 256^2 raw render -> 512^2 (radnerf_sr.py:14-43)."""

    channels: int = 3
    input_resolution: int = 256
    w_dim: int = 16
    dtype: Any = jnp.float32  # production configs set bfloat16 (sr_dtype);
    # matches the reference's fp16 blocks (radnerf_sr.py:19). f32 default
    # keeps unit/parity tests exact.

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, noise_mode: str = "const",
                 rng: Optional[jax.Array] = None,
                 noise_offset=(0, 0)) -> jnp.ndarray:
        # rgb: [B, 256, 256, 3] -> [B, 512, 512, 3].  When rgb is a sub-rect
        # of the frame (sr_crop), noise_offset is its top-left at the input
        # resolution so sliced const noise matches the full-frame values.
        B = rgb.shape[0]
        ws = jnp.ones((B, 3, self.w_dim), dtype=jnp.float32)
        x = rgb
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        x, rgb = SynthesisBlock(
            128, self.w_dim, resolution=self.input_resolution, is_last=False, up=1,
            dtype=self.dtype, name="block0",
        )(x, rgb, ws, noise_mode=noise_mode, rng=rngs[0], noise_offset=noise_offset)
        x, rgb = SynthesisBlock(
            64, self.w_dim, resolution=self.input_resolution * 2, is_last=True, up=2,
            dtype=self.dtype, name="block1",
        )(x, rgb, ws, noise_mode=noise_mode, rng=rngs[1], noise_offset=noise_offset)
        return rgb
