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

    # camera trajectory panel from the fitted pose sequence (the reference's
    # camera-frusta debug panel, fit_3dmm_landmark.py:397-451)
    from genefaceplusplus_tpu.data.binarizer import deep3d_to_nerf_c2w

    try:
        c2ws = np.asarray(deep3d_to_nerf_c2w(
            np.asarray(coeff["euler"][:T]), np.asarray(coeff["trans"][:T])))
    except Exception:
        c2ws = None

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
        if c2ws is not None:
            img = side_by_side(
                img, draw_camera_trajectory(c2ws, size=H, highlight=i))
        writer.append(img)
    writer.close()
    print(f"| debug fit video: {out_path}; mean lm error {np.mean(errs):.2f} px")
    return out_path


def side_by_side(*imgs: np.ndarray) -> np.ndarray:
    """Horizontal debug panel from same-height RGB images."""
    hs = {im.shape[0] for im in imgs}
    assert len(hs) == 1, f"heights differ: {[im.shape for im in imgs]}"
    return np.concatenate([np.asarray(im) for im in imgs], axis=1)


def draw_camera_trajectory(
    poses: np.ndarray,  # [T, 4, 4] c2w
    size: int = 512,
    bound: float = 1.0,
    axis_len: float = 0.25,
    highlight: Optional[int] = None,
) -> np.ndarray:
    """Top-down (x/z plane) plot of the camera trajectory around the head
    volume: world AABB square, per-frame camera positions, forward (+z)
    axes, and an optional highlighted frame.

    The camera-frusta panel of the reference's fit debug video
    (fit_3dmm_landmark.py:397-451 / utils/visualization camera plotting),
    reduced to the informative projection for a talking head (the camera
    orbits in x/z; y varies little). Returns an RGB uint8 [size, size, 3].
    """
    import cv2

    poses = np.asarray(poses, np.float32).reshape(-1, 4, 4)
    img = np.full((size, size, 3), 24, np.uint8)
    # world window: AABB plus the camera extent, with margin
    cam_xyz = poses[:, :3, 3]
    lo = min(-bound, float(cam_xyz[:, [0, 2]].min())) - 0.3
    hi = max(bound, float(cam_xyz[:, [0, 2]].max())) + 0.3

    def to_px(x, z):
        u = (x - lo) / (hi - lo) * (size - 1)
        v = (z - lo) / (hi - lo) * (size - 1)
        return int(round(u)), int(round(size - 1 - v))

    # head AABB square (x/z footprint)
    p00, p11 = to_px(-bound, -bound), to_px(bound, bound)
    cv2.rectangle(img, p00, p11, (90, 90, 200), 1)
    cv2.putText(img, "head AABB", (min(p00[0], p11[0]) + 4, max(p00[1], p11[1]) - 6),
                cv2.FONT_HERSHEY_SIMPLEX, 0.35, (90, 90, 200), 1)

    for i, pose in enumerate(poses):
        o = pose[:3, 3]
        fwd = pose[:3, :3] @ np.asarray([0.0, 0.0, 1.0], np.float32)
        a = to_px(o[0], o[2])
        b = to_px(o[0] + axis_len * fwd[0], o[2] + axis_len * fwd[2])
        is_hl = highlight is not None and i == highlight
        col = (64, 255, 64) if is_hl else (200, 200, 80)
        cv2.line(img, a, b, col, 2 if is_hl else 1)
        cv2.circle(img, a, 3 if is_hl else 1, col, -1)
    cv2.putText(img, f"{len(poses)} poses (top-down x/z)", (8, 16),
                cv2.FONT_HERSHEY_SIMPLEX, 0.4, (220, 220, 220), 1)
    return img
