"""Landmark-distance (LMD) quality instrument.

The reference grades talking-head quality by landmark distance measured
with an externally pretrained detector (paper metric table linked from
/root/reference/README.md:3-5; no detector ships in-repo). This module is
the in-repo analogue: light conv landmark detectors trained per identity
on its GT frames (scripts/quality_production.py `lmd` stage), then applied
to NeRF renders — landmark distance in 512-scale pixels.

Two detector generations:
  v1 — plain conv regressor, 136 coords from an 8x8 bottleneck. Fast, but
       its ~5.5 px floor at 512 is the head's quantisation.
  v2 — U-Net heatmaps + spatial soft-argmax (sub-cell precision, ~1 px
       floor) with per-landmark heatmap-peak confidence: a soft-argmax
       over a DIFFUSE map collapses to the image centroid and reads as
       O(100 px) error on out-of-distribution input, so the peak
       probability is the instrument-validity signal.

Training lives in scripts/quality_production.py (stage_lmd) — it needs the
synthetic dataset + augmentation pool; this module owns the model
definitions and the measurement API so evals and tests import a package
path, not a 1.4k-line script.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "lm_detector",
    "load_detector_params",
    "to_detector_input",
    "detect_lmd",
    "detect_lms",
]


def _detector_v1():
    import flax.linen as nn

    class LMDetector(nn.Module):
        @nn.compact
        def __call__(self, x):  # [B, 128, 128, 3] in [0,1]
            for w in (32, 64, 128, 256):
                x = nn.relu(nn.Conv(w, (3, 3), strides=(2, 2))(x))
                x = nn.relu(nn.Conv(w, (3, 3))(x))
            x = x.reshape(x.shape[0], -1)  # 8*8*256
            x = nn.relu(nn.Dense(256)(x))
            return nn.Dense(136)(x)  # normalised (x, y) * 68

    return LMDetector()


def _detector_v2(return_conf: bool = False):
    """Heatmap + spatial soft-argmax landmark head (the v2 instrument).

    A light U-Net decodes back to a 32x32 map, a 1x1 conv emits one heatmap
    per landmark, and spatial soft-argmax reads out sub-cell coordinates
    (differentiable, trained end-to-end with coordinate L1). A per-model
    2x2 linear calibration (init identity) absorbs any axis convention
    mismatch between heatmap (col,row) order and the dataset's landmark
    layout instead of hard-coding it."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class LMDetectorV2(nn.Module):
        return_conf: bool = False

        @nn.compact
        def __call__(self, x):  # [B, 128, 128, 3] in [0,1]
            skips = {}
            for res, ch in ((64, 32), (32, 64), (16, 128), (8, 256)):
                x = nn.relu(nn.Conv(ch, (3, 3), strides=(2, 2))(x))
                x = nn.relu(nn.Conv(ch, (3, 3))(x))
                skips[res] = x
            x = nn.relu(nn.ConvTranspose(128, (3, 3), strides=(2, 2))(x) + skips[16])
            x = nn.relu(nn.Conv(128, (3, 3))(x))
            x = nn.relu(nn.ConvTranspose(64, (3, 3), strides=(2, 2))(x) + skips[32])
            x = nn.relu(nn.Conv(64, (3, 3))(x))
            h = nn.Conv(68, (1, 1))(x)  # [B, 32, 32, 68] logits
            temp = self.param("softargmax_temp", lambda k: jnp.asarray(10.0))
            B, Hh, Wh, L = h.shape
            probs = jax.nn.softmax((h * temp).reshape(B, Hh * Wh, L), axis=1)
            cell = (jnp.arange(Hh, dtype=jnp.float32) + 0.5)
            rows = jnp.repeat(cell / Hh, Wh)      # [Hh*Wh] normalised row
            cols = jnp.tile(cell / Wh, Hh)        # [Hh*Wh] normalised col
            r = jnp.einsum("bpl,p->bl", probs, rows)
            c = jnp.einsum("bpl,p->bl", probs, cols)
            raw = jnp.stack([c, r], axis=-1)      # [B, 68, 2] (col=x, row=y)
            W = self.param("calib_w", lambda k: jnp.eye(2))
            b = self.param("calib_b", lambda k: jnp.zeros((2,)))
            out = (raw @ W + b).reshape(B, 136)
            if self.return_conf:
                # heatmap peakedness per landmark; peak prob ~ 1/(Hh*Wh)
                # means "no detection", confident peaks are >> that
                return out, probs.max(axis=1)  # [B, 136], [B, 68]
            return out

    return LMDetectorV2(return_conf=return_conf)


def lm_detector(arch: str = "v2", return_conf: bool = False):
    """Build the (uninitialised) detector module for `arch` in {v1, v2}."""
    if arch == "v1":
        return _detector_v1()
    if arch == "v2":
        return _detector_v2(return_conf)
    raise ValueError(f"unknown LMD detector arch: {arch!r}")


def load_detector_params(path: str):
    """Restore trained detector params from a flax msgpack file."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def to_detector_input(img_u8):
    """512² (or any) uint8/float frame -> [128, 128, 3] float in [0, 1]."""
    import cv2
    import numpy as np

    img = np.asarray(img_u8)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if img.shape[0] != 128:
        img = cv2.resize(img, (128, 128))
    return img[..., :3]


def detect_lmd(frames_u8, gt_lms, detector_path: str, arch: str = "v1",
               per_landmark: bool = False, with_conf: bool = False,
               params=None):
    """Mean landmark distance (px at 512) of detector(render) vs GT lms.

    With per_landmark=True returns the [N, 68] error matrix instead of the
    scalar mean — for region breakdowns (jawline vs inner face vs mouth).
    With with_conf=True (v2 only) also returns the [N, 68] heatmap peak
    probability — the instrument-validity signal (see LMDetectorV2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    det = lm_detector(arch, return_conf=with_conf and arch == "v2")
    if params is None:
        params = load_detector_params(detector_path)
    X = jnp.asarray(np.stack([to_detector_input(f_) for f_ in frames_u8]))
    out = jax.jit(det.apply)(params, X)
    conf = None
    if with_conf and arch == "v2":
        out, conf = out
        conf = np.asarray(conf)
    pred = np.asarray(out).reshape(-1, 68, 2)
    gt = np.asarray(gt_lms).reshape(-1, 68, 2)
    err = np.linalg.norm((pred - gt) * 512.0, axis=-1)  # [N, 68]
    res = err if per_landmark else float(np.mean(err))
    return (res, conf) if with_conf and arch == "v2" else res


def detect_lms(frames_u8, detector_path: str, arch: str = "v2",
               params=None):
    """Detector-predicted landmarks [N, 68, 2] in [0,1] for rendered frames
    — feeds the sync-confidence instrument (metrics/sync_scorer.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    det = lm_detector(arch)
    if params is None:
        params = load_detector_params(detector_path)
    X = jnp.asarray(np.stack([to_detector_input(f_) for f_ in frames_u8]))
    return np.asarray(jax.jit(det.apply)(params, X)).reshape(-1, 68, 2)
