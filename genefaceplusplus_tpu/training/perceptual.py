"""Perceptual (LPIPS-style) loss for SR training.

Parity target: PerceptualLoss (vgg19 + vggface multi-scale),
/root/reference/tasks/radnerfs/losses.py:128-186. Pretrained VGG weights are
not redistributable/downloadable in this environment, so the default is a
fixed RANDOM-weight VGG-style feature stack — random deep features are a
well-established perceptual metric surrogate (deep image prior family);
`load_pretrained` accepts a converted weight file when available.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class VGGFeatures(nn.Module):
    """VGG-ish conv pyramid; returns per-stage feature maps."""

    widths: tuple = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        h = x
        for w in self.widths:
            h = nn.Conv(w, (3, 3), padding="SAME")(h)
            h = nn.relu(h)
            h = nn.Conv(w, (3, 3), padding="SAME")(h)
            h = nn.relu(h)
            feats.append(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        return feats


class PerceptualLoss:
    """Multi-scale normalised feature distance. Weights are FIXED (never
    trained); random by default, pretrained when provided."""

    def __init__(self, seed: int = 0, weights_path: Optional[str] = None, widths=(32, 64, 128, 256)):
        self.net = VGGFeatures(widths)
        self.params = self.net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)))
        if weights_path:
            self.load_pretrained(weights_path)

        def _loss(params, a, b):
            fa = self.net.apply(params, a)
            fb = self.net.apply(params, b)
            total = 0.0
            for x, y in zip(fa, fb):
                xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
                yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-8)
                total = total + jnp.mean((xn - yn) ** 2)
            return total

        self._loss = _loss

    def load_pretrained(self, path: str):
        from flax import serialization

        with open(path, "rb") as f:
            self.params = serialization.msgpack_restore(f.read())

    def __call__(self, pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        """pred/gt: [B, H, W, 3] in [0, 1]."""
        return self._loss(self.params, pred * 2 - 1, gt * 2 - 1)
