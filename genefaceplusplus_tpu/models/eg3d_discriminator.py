"""Faithful EG3D dual discriminator (camera-conditioned StyleGAN2 resnet-D).

Parity: DualDiscriminator, /root/reference/modules/eg3ds/models/dual_discriminator.py:127-190
built on networks_stylegan2.py:575-813 with the radnerf_sr FM configuration
(tasks/radnerfs/radnerf_sr.py:112-123): channel_base 32768, channel_max 512,
final_resolution 512, mbstd group 2, conv_clamp 256, resnet architecture,
25-d EG3D camera label through a 2-layer MappingNetwork (z_dim=0).

Semantics reproduced exactly (so eg3d_baseline_run2's `disc` sub-model can
be converted and the lambda_dual_fm feature-matching loss reproduces the
reference mechanism):
  * equalized-lr runtime weight scaling: w * gain/sqrt(fan_in), bias *
    lr_multiplier, lrelu with sqrt(2) activation gain, conv_clamp
  * resnet blocks: fromrgb at the top, conv0 (3x3), conv1 (3x3, filtered
    stride-2 down), 1x1 no-bias skip, both halves scaled sqrt(0.5)
  * the dual input: image_raw FIR-upsampled to 512 and channel-concatenated
    (6 input channels), clamped to [-1, 1]
  * MinibatchStdLayer(group=2) -> 3x3 conv -> fc -> cmap projection
    (x*cmap).sum / sqrt(cmap_dim)
  * feature_maps: the per-resolution block outputs, the tensors the
    reference's FeatureMatchingLoss consumes (radnerf_sr.py:235-244)

TPU notes: NHWC layout; the reference's per-resolution fp16 blocks are a
CUDA-throughput artifact — here everything is f32 (bf16 via `dtype` if ever
needed) and the filtered stride-2 down is one lax conv; no custom kernels
required since the FM loss only runs the forward pass.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.ops.bias_act import bias_act
from genefaceplusplus_tpu.ops.upfirdn2d import setup_filter, upfirdn2d

_FILTER = setup_filter([1, 3, 3, 1])


class EqualDense(nn.Module):
    """FullyConnectedLayer (networks_stylegan2.py:92-126): runtime-scaled
    weight [out,in] (init N(0,1)/lr_mult), bias*lr_mult, bias_act."""

    features: int
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_multiplier),
                       (self.features, in_f))
        b = self.param("bias", nn.initializers.constant(self.bias_init / self.lr_multiplier),
                       (self.features,))
        y = x @ (w.T * (self.lr_multiplier / np.sqrt(in_f)))
        return bias_act(y, b * self.lr_multiplier, act=self.activation)


class EqualConv2d(nn.Module):
    """Conv2dLayer (networks_stylegan2.py:129-197): runtime-scaled weight
    [k,k,in,out], optional filtered stride-2 down, bias_act with clamp."""

    features: int
    kernel: int = 3
    down: int = 1
    use_bias: bool = True
    activation: str = "linear"
    conv_clamp: Optional[float] = 256.0
    gain: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax.lax as lax

        k, in_ch = self.kernel, x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, in_ch, self.features))
        w = w * (1.0 / np.sqrt(in_ch * k * k))
        if self.down > 1:
            # conv2d_resample fast path (down>1, up==1): lowpass FIR with
            # padding k//2 + (fw-down+1)//2 / k//2 + (fw-down)//2, then a
            # VALID strided conv
            fw = _FILTER.shape[-1]
            p0 = k // 2 + (fw - self.down + 1) // 2
            p1 = k // 2 + (fw - self.down) // 2
            x = upfirdn2d(x, _FILTER, padding=(p0, p1, p0, p1))
            y = lax.conv_general_dilated(
                x, w, window_strides=(self.down, self.down), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        clamp = None if self.conv_clamp is None else self.conv_clamp * self.gain
        act_gain = {"linear": 1.0, "lrelu": np.sqrt(2.0)}[self.activation] * self.gain
        return bias_act(y, b, act=self.activation, gain=act_gain, clamp=clamp)


class DiscriminatorBlock(nn.Module):
    """resnet DiscriminatorBlock (networks_stylegan2.py:575-661)."""

    tmp_channels: int
    out_channels: int
    first: bool = False  # in_channels == 0 -> fromrgb

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], img: Optional[jnp.ndarray]
                 ) -> jnp.ndarray:
        if self.first:
            x = EqualConv2d(self.tmp_channels, kernel=1, activation="lrelu",
                            name="fromrgb")(img)
        y = EqualConv2d(self.out_channels, kernel=1, down=2, use_bias=False,
                        conv_clamp=None, gain=np.sqrt(0.5), name="skip")(x)
        x = EqualConv2d(self.tmp_channels, kernel=3, activation="lrelu",
                        name="conv0")(x)
        x = EqualConv2d(self.out_channels, kernel=3, down=2, activation="lrelu",
                        gain=np.sqrt(0.5), name="conv1")(x)
        return y + x


def minibatch_std(x: jnp.ndarray, group_size: int = 2, num_channels: int = 1
                  ) -> jnp.ndarray:
    """MinibatchStdLayer (networks_stylegan2.py:664-692), NHWC."""
    N, H, W, C = x.shape
    G = min(group_size, N)
    F = num_channels
    c = C // F
    y = x.transpose(0, 3, 1, 2).reshape(G, -1, F, c, H, W)
    y = y - y.mean(axis=0)
    y = jnp.sqrt(jnp.mean(y ** 2, axis=0) + 1e-8)
    y = y.mean(axis=(2, 3, 4))  # [n, F]
    # batch element b = g*n + i carries the stat of slot i = b % n:
    # torch's [n,F,1,1].repeat(G,1,H,W) TILES along batch ([y0..yn,y0..yn])
    y = jnp.tile(y.reshape(-1, F), (G, 1))[:N][:, None, None, :]
    y = jnp.broadcast_to(y, (N, H, W, F))
    return jnp.concatenate([x, y], axis=-1)


class MappingNetwork(nn.Module):
    """Camera-label mapping (networks_stylegan2.py:199-259, z_dim=0):
    embed -> 2nd-moment normalise -> num_layers lrelu fc (lr_mult 0.01)."""

    w_dim: int
    num_layers: int = 8  # MappingNetwork default (networks_stylegan2.py:205)

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        x = EqualDense(self.w_dim, name="embed")(c)
        x = x * jnp.reciprocal(jnp.sqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + 1e-8))
        for i in range(self.num_layers):
            x = EqualDense(self.w_dim, activation="lrelu", lr_multiplier=0.01,
                           name=f"fc{i}")(x)
        return x


class EG3DDualDiscriminator(nn.Module):
    """DualDiscriminator (dual_discriminator.py:127-190) with the radnerf_sr
    FM hyperparameters. Inputs NHWC in [-1, 1] (reference data range)."""

    img_resolution: int = 512
    channel_base: int = 32768
    channel_max: int = 512
    camera_dim: int = 25
    mbstd_group_size: int = 2
    mapping_layers: int = 8

    @nn.compact
    def __call__(self, image: jnp.ndarray, image_raw: jnp.ndarray,
                 camera: jnp.ndarray, c_noise: float = 0.0,
                 noise_rng=None) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """image [B,R,R,3], image_raw [B,R/2,R/2,3], camera [B,25] ->
        (logits [B,1], per-resolution feature maps)."""
        res_log2 = int(np.log2(self.img_resolution))
        block_res = [2 ** i for i in range(res_log2, 2, -1)]
        channels = {r: min(self.channel_base // r, self.channel_max)
                    for r in block_res + [4]}
        cmap_dim = channels[4]

        # dual input: filtered 2x upsample of the raw render, concat, clamp
        # (dual_discriminator.py:166-171)
        fw = _FILTER.shape[-1]
        up = 2
        p0, p1 = (fw + up - 1) // 2, (fw - up) // 2
        raw_up = upfirdn2d(image_raw, _FILTER, up=2, padding=(p0, p1, p0, p1),
                           gain=4.0)
        img = jnp.clip(jnp.concatenate([image, raw_up], axis=-1), -1.0, 1.0)

        feats: List[jnp.ndarray] = []
        x = None
        for i, r in enumerate(block_res):
            x = DiscriminatorBlock(
                tmp_channels=channels[r], out_channels=channels[r // 2],
                first=(i == 0), name=f"b{r}")(x, img if i == 0 else None)
            feats.append(x)

        # camera conditioning with optional label noise (disc_c_noise,
        # dual_discriminator.py:176-181; FM calls keep it off for determinism)
        c = camera
        if c_noise > 0 and noise_rng is not None and camera.shape[0] > 1:
            import jax

            c = c + jax.random.normal(noise_rng, c.shape) * c.std(0) * c_noise
        cmap = MappingNetwork(w_dim=cmap_dim, num_layers=self.mapping_layers,
                              name="mapping")(c)

        # epilogue (networks_stylegan2.py:697-750)
        x = minibatch_std(x, self.mbstd_group_size)
        x = EqualConv2d(channels[4], kernel=3, activation="lrelu",
                        name="b4_conv")(x)
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)  # NCHW flatten
        x = EqualDense(channels[4], activation="lrelu", name="b4_fc")(x)
        x = EqualDense(cmap_dim, name="b4_out")(x)
        logits = jnp.sum(x * cmap, axis=1, keepdims=True) / np.sqrt(cmap_dim)
        return logits, feats


def feature_matching_loss(fake_feats: List[jnp.ndarray],
                          real_feats: List[jnp.ndarray]) -> jnp.ndarray:
    """FeatureMatchingLoss over block outputs (losses.py / radnerf_sr.py:244):
    mean L1 between fake and (stop-gradient) real feature maps."""
    import jax

    total = 0.0
    for f, r in zip(fake_feats, real_feats):
        total = total + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
    return total / max(1, len(fake_feats))
