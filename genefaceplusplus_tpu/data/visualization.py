"""Debug visualisation: landmark overlays, 3DMM-fit check videos, SECC panels.

Parity: the reference's --debug renders (fit_3dmm_landmark.py:373-451 —
fitted-vs-detected landmark overlay video with per-frame error; utils/
visualization lm3d plotting; genefacepp_infer.py:489-495 debug side panels).
Host-side cv2/numpy; consumed by data/process.py --debug and ad hoc.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def draw_landmarks(img: np.ndarray, lm2d: np.ndarray, color=(0, 255, 0),
                   radius: int = 1) -> np.ndarray:
    """Draw 2D landmarks (pixel or [0,1]-normalised) onto an RGB uint8 image."""
    import cv2

    out = np.ascontiguousarray(img.copy())
    H, W = out.shape[:2]
    pts = np.asarray(lm2d, np.float32)
    if pts.max() <= 1.5:
        pts = pts * np.asarray([W, H], np.float32)
    for x, y in pts:
        cv2.circle(out, (int(round(x)), int(round(y))), radius, color, -1)
    return out


def landmark_error_px(pred: np.ndarray, gt: np.ndarray, H: int, W: int) -> float:
    """Mean L2 landmark distance in pixels (LMD numerator)."""
    p = np.asarray(pred, np.float32)
    g = np.asarray(gt, np.float32)
    if p.max() <= 1.5:
        p = p * np.asarray([W, H], np.float32)
    if g.max() <= 1.5:
        g = g * np.asarray([W, H], np.float32)
    return float(np.linalg.norm(p - g, axis=-1).mean())


def debug_fit_video(
    processed_dir: str,
    out_path: Optional[str] = None,
    bfm_dir: str = "deep_3drecon/BFM",
    max_frames: int = 250,
) -> str:
    """Overlay fitted (green) vs detected (red) landmarks on the gt frames
    and write an mp4 + print per-frame pixel error (the reference's
    fit_3dmm_landmark.py --debug video, :373-451)."""
    import cv2
    import jax.numpy as jnp

    from genefaceplusplus_tpu.data.face3d import Face3DHelper
    from genefaceplusplus_tpu.data.landmarks import INDEX_LM68_FROM_LM478
    from genefaceplusplus_tpu.data.video import StreamingVideoWriter

    out_path = out_path or os.path.join(processed_dir, "debug_fit.mp4")
    coeff = np.load(os.path.join(processed_dir, "coeff_fit_mp.npy"),
                    allow_pickle=True).tolist()
    lms = np.load(os.path.join(processed_dir, "lms_2d.npy"))
    frame_dir = os.path.join(processed_dir, "gt_imgs")
    names = sorted(os.listdir(frame_dir))[:max_frames]

    keypoint_mode = "mediapipe" if lms.shape[1] in (468, 478) else "lm68"
    helper = Face3DHelper.load(bfm_dir, keypoint_mode=keypoint_mode)
    T = min(len(names), len(coeff["exp"]), len(lms))
    pred2d = np.asarray(helper.reconstruct_lm2d(
        jnp.asarray(coeff["id"][:T]), jnp.asarray(coeff["exp"][:T]),
        jnp.asarray(coeff["euler"][:T]), jnp.asarray(coeff["trans"][:T]),
    ))

    writer = StreamingVideoWriter(out_path, fps=25)
    errs = []
    for i in range(T):
        img = cv2.cvtColor(cv2.imread(os.path.join(frame_dir, names[i])),
                           cv2.COLOR_BGR2RGB)
        H, W = img.shape[:2]
        det = lms[i][:, :2]
        img = draw_landmarks(img, det, color=(255, 64, 64))
        img = draw_landmarks(img, pred2d[i], color=(64, 255, 64))
        errs.append(landmark_error_px(pred2d[i], det / np.asarray([W, H])
                                      if det.max() > 1.5 else det, H, W))
        writer.append(img)
    writer.close()
    print(f"| debug fit video: {out_path}; mean lm error {np.mean(errs):.2f} px")
    return out_path


def side_by_side(*imgs: np.ndarray) -> np.ndarray:
    """Horizontal debug panel from same-height RGB images."""
    hs = {im.shape[0] for im in imgs}
    assert len(hs) == 1, f"heights differ: {[im.shape for im in imgs]}"
    return np.concatenate([np.asarray(im) for im in imgs], axis=1)
