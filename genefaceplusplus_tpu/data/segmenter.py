"""Segmentation-guided data preparation: segmaps -> head/torso/person crops,
KNN background reconstruction, torso/neck vertical inpainting.

Parity targets in /root/reference:
  * data_gen/utils/mp_feature_extractors/mp_segmenter.py:32-54 (segmap
    one-hot + png color coding), :230-256 (per-mode crop masks)
  * data_gen/utils/process_video/extract_segment_imgs.py:63-147 (KNN
    background), :148-240 (torso+neck inpainting with 0.98 darken falloff),
    :258-277 (per-frame segment image dump)

The 6 segmentation classes follow the mediapipe multiclass-selfie contract:
  0 background | 1 hair | 2 body-skin | 3 face-skin | 4 clothes | 5 others

All functions here are pure numpy/cv2 — they accept segmaps from any source
(the mediapipe segmenter in data/mp_extract.py, or precomputed pngs), so the
whole torso-data path is testable without mediapipe.

TPU-native notes: this is host-side preprocessing (same as the reference);
the KNN background uses cv2.distanceTransform (exact nearest-zero-pixel
distance + label) instead of a per-frame sklearn KD-tree — same result,
O(HW) per frame instead of O(HW log M).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

NUM_CLASSES = 6
# png color coding (interop with reference-preprocessed segmaps/)
SEGMAP_COLORS = np.asarray(
    [
        (255, 255, 255),  # 0 background
        (255, 255, 0),    # 1 hair
        (255, 0, 255),    # 2 body-skin
        (0, 255, 255),    # 3 face-skin
        (255, 0, 0),      # 4 clothes
        (0, 255, 0),      # 5 others
    ],
    dtype=np.uint8,
)

# per-mode class subsets (mp_segmenter.py:236-251)
MODE_CLASSES = {
    "head": (1, 3, 5),
    "torso": (2, 4),
    "torso_with_bg": (0, 2, 4),
    "person": (1, 2, 3, 4, 5),
    "bg": (0,),
}


def onehot_from_categories(cat: np.ndarray, num_classes: int = NUM_CLASSES) -> np.ndarray:
    """[H, W] int category map -> [C, H, W] uint8 one-hot."""
    return (cat[None] == np.arange(num_classes, dtype=cat.dtype)[:, None, None]).astype(np.uint8)


def encode_segmap_image(segmap: np.ndarray) -> np.ndarray:
    """[C, H, W] one-hot -> [H, W, 3] color-coded uint8 (lossless png store)."""
    cat = np.argmax(segmap, axis=0)
    return SEGMAP_COLORS[cat]


def decode_segmap_image(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] color-coded -> [C, H, W] uint8 one-hot."""
    out = np.zeros((NUM_CLASSES,) + img.shape[:2], np.uint8)
    for i, color in enumerate(SEGMAP_COLORS):
        out[i] = np.all(img == color[None, None], axis=-1)
    return out


def segment_out(img: np.ndarray, segmap: np.ndarray, mode: str) -> Tuple[np.ndarray, np.ndarray]:
    """Zero out pixels outside the mode's class subset.

    Returns (img_out [H,W,3], mask [H,W] bool)."""
    mask = segmap[list(MODE_CLASSES[mode])].sum(axis=0) > 0.5
    out = img.copy()
    out[~mask] = 0
    return out, mask


# ---------------------------------------------------------------------------
# KNN background reconstruction (extract_segment_imgs.py:63-147)
# ---------------------------------------------------------------------------

def _dist_to_foreground(bg_mask: np.ndarray) -> np.ndarray:
    """Per-pixel L2 distance to the nearest foreground pixel."""
    import cv2

    # distanceTransform: distance to nearest ZERO pixel -> zero = foreground
    src = bg_mask.astype(np.uint8)  # fg pixels are 0
    if not (~bg_mask).any():
        return np.full(bg_mask.shape, 1e9, np.float32)
    return cv2.distanceTransform(src, cv2.DIST_L2, 5).astype(np.float32)


def extract_background(
    frames: Sequence[np.ndarray],
    segmaps: Sequence[np.ndarray],
    dist_thresh: float = 10.0,
    select_interval: Optional[int] = None,
) -> np.ndarray:
    """Reconstruct the static background from sampled frames.

    For every pixel, find the frame where it is farthest from any
    foreground pixel; pixels that are ever comfortably in the background
    (distance > dist_thresh) take their color from that frame; the
    remaining always-covered pixels copy the color of the nearest
    reconstructed background pixel.

    frames: list of [H, W, 3] uint8 RGB; segmaps: list of [C, H, W] one-hot.
    """
    import cv2

    assert len(frames) == len(segmaps) and len(frames) > 0
    n = len(frames)
    if select_interval is None:
        # frame-sampling schedule (extract_segment_imgs.py:92-98)
        select_interval = 5 if n <= 100 else (20 if n < 10000 else n // 500)
    sel = list(range(0, n, select_interval)) if n > select_interval else [0]
    H, W = frames[sel[0]].shape[:2]

    dists = np.stack([
        _dist_to_foreground(segmaps[i][0].astype(bool)) for i in sel
    ])  # [B, H, W]
    best = dists.argmax(axis=0)  # [H, W] frame index with max bg distance
    max_dist = dists.max(axis=0)

    imgs = np.stack([np.asarray(frames[i]) for i in sel])  # [B, H, W, 3]
    bg = np.take_along_axis(imgs, best[None, ..., None], axis=0)[0]  # [H, W, 3]

    solid = max_dist > dist_thresh  # pixels with a confident bg observation
    if solid.any() and (~solid).any():
        # fill holes with the color of the nearest solid pixel: labelled
        # distance transform gives, for every hole, its nearest solid pixel
        _, labels = cv2.distanceTransformWithLabels(
            (~solid).astype(np.uint8), cv2.DIST_L2, 5, labelType=cv2.DIST_LABEL_PIXEL
        )
        solid_ids = labels[solid]
        solid_colors = bg[solid]
        lut = np.zeros((labels.max() + 1, 3), np.uint8)
        lut[solid_ids] = solid_colors
        hole = ~solid
        bg[hole] = lut[labels[hole]]
    return bg


# ---------------------------------------------------------------------------
# Torso / neck vertical inpainting (extract_segment_imgs.py:148-240)
# ---------------------------------------------------------------------------

def _top_pixels_under_head(part: np.ndarray, head: np.ndarray):
    """For each image column, the topmost `part` pixel whose upstairs
    neighbour is head. Returns [m, 2] (row, col) coords and per-column
    pixel counts [m]."""
    rows, cols = np.nonzero(part)
    if len(rows) == 0:
        return np.zeros((0, 2), np.int64), np.zeros((0,), np.int64)
    order = np.lexsort((rows, cols))  # by column, then by row
    rows, cols = rows[order], cols[order]
    ucols, first, counts = np.unique(cols, return_index=True, return_counts=True)
    top = np.stack([rows[first], ucols], axis=-1)  # [m, 2]
    up = np.clip(top[:, 0] - 1, 0, part.shape[0] - 1)
    keep = head[up, top[:, 1]]
    return top[keep], counts[keep]


def _paint_up(img: np.ndarray, coords: np.ndarray, colors: np.ndarray, L: int,
              darken: float = 0.98) -> np.ndarray:
    """Stamp `colors` upward from each coord for L rows with geometric
    darkening; returns the painted-pixel mask."""
    H = img.shape[0]
    mask = np.zeros(img.shape[:2], bool)
    if len(coords) == 0:
        return mask
    steps = np.arange(L)
    rr = coords[:, 0][None] - steps[:, None]  # [L, m]
    cc = np.broadcast_to(coords[:, 1][None], rr.shape)
    scale = (darken ** steps)[:, None, None]  # [L, 1, 1]
    shades = np.clip(colors[None].astype(np.float32) * scale, 0, 255).astype(img.dtype)
    ok = (rr >= 0) & (rr < H)
    img[rr[ok], cc[ok]] = shades[ok]
    mask[rr[ok], cc[ok]] = True
    return mask


def inpaint_torso(gt_img: np.ndarray, segmap: np.ndarray):
    """Head removal + vertical torso/neck inpainting.

    Returns (torso_img [H,W,3], torso_mask [H,W] bool) — the inpainted
    torso crop the torso NeRF trains against (alpha = torso_mask).
    """
    import cv2
    from scipy.ndimage import binary_dilation

    head = (segmap[1] + segmap[3] + segmap[5]).astype(bool)
    neck = segmap[2].astype(bool)
    torso = segmap[4].astype(bool)

    img = gt_img.copy()
    img[head] = 0

    # torso: continue clothes upward under the removed head (L=9)
    top_t, _ = _top_pixels_under_head(torso, head)
    torso_colors = gt_img[top_t[:, 0], top_t[:, 1]] if len(top_t) else np.zeros((0, 3))
    inpaint_t_mask = _paint_up(img, top_t, torso_colors, L=9)

    # neck: dilate vertically, push the source row down a little for a
    # softer transition, then paint a taller column (L=53)
    push_down = 4
    vert = np.zeros((3, 3), bool)
    vert[:, 1] = True
    neck_d = binary_dilation(neck, structure=vert, iterations=3)
    top_n, counts_n = _top_pixels_under_head(neck_d, head)
    if len(top_n):
        down = np.minimum(counts_n - 1, push_down)
        top_n = top_n + np.stack([down, np.zeros_like(down)], axis=-1)
    neck_colors = gt_img[top_n[:, 0], top_n[:, 1]] if len(top_n) else np.zeros((0, 3))
    inpaint_n_mask = _paint_up(img, top_n, neck_colors, L=48 + push_down + 1)

    # blur the neck-inpaint area to hide vertical streaks
    if inpaint_n_mask.any():
        blurred = cv2.GaussianBlur(img, (5, 5), cv2.BORDER_DEFAULT)
        img[inpaint_n_mask] = blurred[inpaint_n_mask]

    torso_mask = neck_d | torso | inpaint_n_mask | inpaint_t_mask
    out = img.copy()
    out[~torso_mask] = 0
    return out, torso_mask


# ---------------------------------------------------------------------------
# Per-frame segment-image dump (extract_segment_imgs.py:258-277)
# ---------------------------------------------------------------------------

def generate_segment_images(
    out_dir: str,
    frame_name: str,
    img: np.ndarray,
    segmap: np.ndarray,
    modes: Tuple[str, ...] = ("head", "torso", "person"),
) -> None:
    """Write segmaps/<f>.png (color-coded) + per-mode RGBA crops +
    inpaint_torso_imgs/<f>.png for one frame."""
    import cv2

    stem = os.path.splitext(frame_name)[0]

    def write_rgba(subdir: str, rgb: np.ndarray, mask: np.ndarray):
        d = os.path.join(out_dir, subdir)
        os.makedirs(d, exist_ok=True)
        alpha = (mask.astype(np.uint8) * 255)[..., None]
        bgra = np.concatenate([cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR), alpha], axis=-1)
        cv2.imwrite(os.path.join(d, stem + ".png"), bgra)

    d = os.path.join(out_dir, "segmaps")
    os.makedirs(d, exist_ok=True)
    cv2.imwrite(
        os.path.join(d, stem + ".png"),
        cv2.cvtColor(encode_segmap_image(segmap), cv2.COLOR_RGB2BGR),
    )
    for mode in modes:
        rgb, mask = segment_out(img, segmap, mode)
        write_rgba(f"{mode}_imgs", rgb, mask)
    torso_rgb, torso_mask = inpaint_torso(img, segmap)
    write_rgba("inpaint_torso_imgs", torso_rgb, torso_mask)


def load_segmap(path: str) -> np.ndarray:
    """Read a color-coded segmap png -> [C, H, W] one-hot."""
    import cv2

    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    return decode_segmap_image(img)
