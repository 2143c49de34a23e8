"""Dual discriminator (camera-conditioned) for optional feature matching.

Parity: DualDiscriminator, /root/reference/modules/eg3ds/models/dual_discriminator.py:127 —
consumes {image [512^2], image_raw [256^2] upsampled and channel-concatenated
-> 6ch}, conditions on the 25-d EG3D camera label, and is used ONLY through
the lambda_dual_fm feature-matching loss (tasks/radnerfs/radnerf_sr.py:235-244),
which every shipped config disables (egs/datasets/May/lm3d_radnerf_sr.yaml:12).
Architecture here is a compact StyleGAN2-style conv-down stack returning the
per-resolution feature maps the FM loss needs.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from genefaceplusplus_tpu.ops.upfirdn2d import downsample2d, setup_filter, upfirdn2d

_F = setup_filter([1, 3, 3, 1])


class DualDiscriminator(nn.Module):
    base_channels: int = 32
    max_channels: int = 256
    n_down: int = 5
    camera_dim: int = 25

    @nn.compact
    def __call__(self, image: jnp.ndarray, image_raw: jnp.ndarray, camera: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """image [B,H,W,3] (SR output), image_raw [B,H/2,W/2,3], camera [B,25].

        Returns (logits [B,1], feature_maps per scale).
        """
        B, H = image.shape[0], image.shape[1]
        raw_up = upfirdn2d(image_raw, _F, up=2, padding=(2, 1, 2, 1), gain=4.0)
        x = jnp.concatenate([image, raw_up], axis=-1)  # [B, H, W, 6]

        feats = []
        c = self.base_channels
        for i in range(self.n_down):
            x = nn.Conv(min(c, self.max_channels), (3, 3), padding="SAME")(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
            x = downsample2d(x, _F)
            c *= 2

        h = x.reshape(B, -1)
        cam = nn.Dense(128)(camera)
        h = jnp.concatenate([h, cam], axis=-1)
        h = nn.leaky_relu(nn.Dense(256)(h), 0.2)
        logits = nn.Dense(1)(h)
        return logits, feats


def feature_matching_loss(fake_feats: List[jnp.ndarray], real_feats: List[jnp.ndarray]) -> jnp.ndarray:
    total = 0.0
    for f, r in zip(fake_feats, real_feats):
        total = total + jnp.mean(jnp.abs(f - jnp.asarray(r)))
    return total / max(1, len(fake_feats))
