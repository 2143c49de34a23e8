"""Perceptual (LPIPS-style) loss for SR training.

Parity target: PerceptualLoss (vgg19 + vggface multi-scale),
/root/reference/tasks/radnerfs/losses.py:128-186. Two backends:

  * `arch="vgg19"` — the real VGG19 relu_x_1 pyramid with the reference's
    layer weights {1/32, 1/16, 1/8, 1/4, 1}, ImageNet normalisation, L1
    distance, and n_scale extra half-resolution passes. Weights drop in via
    `scripts/convert_vgg.py` (torchvision vgg19 .pth -> msgpack; conversion
    verified op-level in tests/test_convert_full_ckpt.py). Random-init when
    no weight file is given (deep-image-prior-style surrogate).
  * `arch="small"` (default) — a compact fixed random-weight VGG-style stack
    for weights-less environments and fast tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# torchvision vgg19.features conv plan: (out_channels, pool_before)
VGG19_PLAN = (
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False), (256, False),
    (512, True), (512, False), (512, False), (512, False),
    (512, True), (512, False), (512, False), (512, False),
)
# indices (into the conv sequence) whose post-relu activation is relu_x_1
VGG19_RELU_X1 = (0, 2, 4, 8, 12)
# reference layer weights (losses.py:131)
VGG19_LAYER_WEIGHTS = (0.03125, 0.0625, 0.125, 0.25, 1.0)


class VGG19Features(nn.Module):
    """VGG19 feature extractor returning the relu_x_1 pyramid.

    Conv names Conv_0..Conv_15 follow the torchvision `features` conv order,
    which is what convert_vgg19 (utils/convert_torch_ckpt.py) targets."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        h = x
        for i, (width, pool_before) in enumerate(VGG19_PLAN):
            if pool_before:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.relu(nn.Conv(width, (3, 3), padding="SAME")(h))
            if i in VGG19_RELU_X1:
                feats.append(h)
        return feats


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


# VGGFace is a VGG16 trained on faces (vgg_face_dag; losses.py:83-111)
VGG16_PLAN = (
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
)
VGG16_RELU_X1 = (0, 2, 4, 7, 10)
# vgg_face_dag input normalisation (BGR-trained mean in 0-255, applied on
# RGB in the reference's apply_vggface_normalization)
VGGFACE_MEAN = (129.186279296875 / 255.0, 104.76238250732422 / 255.0,
                93.59396362304688 / 255.0)


class VGG16Features(nn.Module):
    """VGG16 (vggface layout) feature extractor -> relu_x_1 pyramid."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        h = x
        for i, (width, pool_before) in enumerate(VGG16_PLAN):
            if pool_before:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.relu(nn.Conv(width, (3, 3), padding="SAME")(h))
            if i in VGG16_RELU_X1:
                feats.append(h)
        return feats


class PerceptualLoss:
    """Multi-scale fixed-feature distance. Weights are FIXED (never trained);
    arch='vgg19' mirrors the reference loss (layer-weighted L1 over the
    relu_x_1 pyramid + n_scale half-resolution passes, ImageNet norm);
    arch='small' (default) is the compact random surrogate."""

    def __init__(self, seed: int = 0, weights_path: Optional[str] = None,
                 widths=(32, 64, 128, 256), arch: str = "small", n_scale: int = 3,
                 vggface_weights_path: Optional[str] = None,
                 vggface_loss_weight: float = 1.0):
        self.arch = arch
        self.n_scale = n_scale
        self.vggface = None
        self.vggface_params = None
        self.vggface_loss_weight = vggface_loss_weight
        if arch == "vgg19":
            self.net = VGG19Features()
            self.params = self.net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
            if vggface_weights_path:
                # the reference's second tower (vgg19 + vggface, losses.py:136-139)
                from flax import serialization

                self.vggface = VGG16Features()
                with open(vggface_weights_path, "rb") as f:
                    self.vggface_params = serialization.msgpack_restore(f.read())
        else:
            self.net = VGGFeatures(widths)
            self.params = self.net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)))
        if weights_path:
            self.load_pretrained(weights_path)

        if arch == "vgg19":
            mean = jnp.asarray(IMAGENET_MEAN)
            std = jnp.asarray(IMAGENET_STD)
            lw = VGG19_LAYER_WEIGHTS

            vggface, vggface_params = self.vggface, self.vggface_params
            face_mean = jnp.asarray(VGGFACE_MEAN)
            face_w = self.vggface_loss_weight

            def _vgg_loss(params, a, b):
                if vggface is not None:
                    # vggface term: 255-scale inputs, per-layer L1 / 255
                    # (losses.py:160-168)
                    fa = vggface.apply(vggface_params, (a - face_mean) * 255.0)
                    fb = vggface.apply(vggface_params, (b - face_mean) * 255.0)
                    face_total = 0.0
                    for w, x, y in zip(lw, fa, fb):
                        face_total = face_total + w * jnp.mean(jnp.abs(x - y)) / 255.0
                a = (a - mean) / std
                b = (b - mean) / std
                total = face_w * face_total if vggface is not None else 0.0
                for scale in range(1 + self.n_scale):
                    fa = self.net.apply(params, a)
                    fb = self.net.apply(params, b)
                    if scale == 0:
                        for w, x, y in zip(lw, fa, fb):
                            total = total + w * jnp.mean(jnp.abs(x - y))
                    else:
                        # extra scales use the deepest layer (losses.py:178-186)
                        total = total + lw[-1] * jnp.mean(jnp.abs(fa[-1] - fb[-1]))
                    if scale < self.n_scale:
                        B, H, W, C = a.shape
                        if min(H, W) < 64:
                            break
                        a = jax.image.resize(a, (B, H // 2, W // 2, C), "bilinear")
                        b = jax.image.resize(b, (B, H // 2, W // 2, C), "bilinear")
                return total

            self._loss = _vgg_loss
            return

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
        if self.arch == "vgg19":
            return self._loss(self.params, pred, gt)
        return self._loss(self.params, pred * 2 - 1, gt * 2 - 1)


def perceptual_from_task_config(tcfg) -> PerceptualLoss:
    """Perceptual loss from a task config's knobs (perceptual_arch /
    vgg_weights_path / vggface_weights_path — config-driven analogue of the
    reference's vgg19+vggface PerceptualLoss, losses.py:128-186).

    A configured weights path implies arch='vgg19' and MUST resolve: a
    missing file raises instead of silently training on the random-weight
    surrogate (a quality regression that is otherwise invisible)."""
    import os

    arch = getattr(tcfg, "perceptual_arch", "small") or "small"
    wp = getattr(tcfg, "vgg_weights_path", "") or None
    fwp = getattr(tcfg, "vggface_weights_path", "") or None
    if (wp or fwp) and arch != "vgg19":
        arch = "vgg19"
    for name, p in (("vgg_weights_path", wp), ("vggface_weights_path", fwp)):
        if p and not os.path.exists(p):
            raise FileNotFoundError(
                f"{name}={p!r} configured but not found — refusing to fall "
                f"back to the random-weight perceptual surrogate; convert "
                f"weights with scripts/convert_vgg.py or unset the path")
    return PerceptualLoss(seed=0, arch=arch, weights_path=wp,
                          vggface_weights_path=fwp)
