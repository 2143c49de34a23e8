"""Shared on-device frame-store helpers for the training tasks.

The head/SR/torso tasks all keep a device-resident per-frame store and
assemble batches ON DEVICE inside their jitted steps (one host core + a
network device tunnel makes per-step host gathers the bottleneck —
docs/DESIGN.md round-3 log). Three contracts must stay identical across
tasks AND match the validation/inference side, so they live here once:

  * ``quantize_u8`` — the uint8 storage quantisation, bit-identical to the
    dataset's LRU image cache (data/dataset.py), so device-gathered gt
    equals host-loaded gt exactly.
  * ``device_cond_window`` — the smoothing-window gather over the FULL
    timeline (``RADNeRFDataset.frame_cond_window`` semantics: clip offsets
    to the timeline, zero the out-of-range slots; reference
    get_audio_features att_mode=2, radnerfs/utils.py:71-104).
  * ``base_device_frames`` — the store entries every task needs
    (gt/poses/conds_all/frame_ids/eye).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def quantize_u8(img) -> np.ndarray:
    """Image -> uint8, matching the dataset LRU cache quantisation
    bit-for-bit (so on-device ``x/255`` reproduces host-loaded floats)."""
    img = np.asarray(img)[..., :3]
    if img.dtype == np.uint8:
        return img
    return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)


def base_device_frames(ds) -> Dict[str, jnp.ndarray]:
    """Device arrays shared by all tasks: per-frame gt (uint8), poses,
    the full condition timeline, frame ids, eye-area percents."""
    gt_l, pose_l = [], []
    for i in range(len(ds)):
        gt = ds.load_image(i, "gt")
        gt_l.append(quantize_u8(ds.bg_img if gt is None else gt))
        pose_l.append(ds.frame_pose(i))
    return {
        "gt": jnp.asarray(np.stack(gt_l)),
        "poses": jnp.asarray(np.stack(pose_l).astype(np.float32)),
        "conds_all": jnp.asarray(np.asarray(ds.conds_all, np.float32)),
        "frame_ids": jnp.asarray(np.asarray(ds.frame_ids, np.int32)),
        "eye": jnp.asarray(np.asarray(ds.eye_area_percents, np.float32)),
    }


def device_cond_window(frames: Dict, idx, smo: int, T_all: int):
    """Condition smoothing window for frame ``idx`` (traced), gathered from
    the device-resident full timeline. MUST stay equivalent to
    ``RADNeRFDataset.frame_cond_window`` — tests/test_tasks.py asserts the
    train-time gather matches the host path."""
    g = frames["frame_ids"][idx]
    rel = jnp.arange(smo) - smo // 2
    offs = jnp.clip(g + rel, 0, T_all - 1)
    valid = ((g + rel) >= 0) & ((g + rel) < T_all)
    return frames["conds_all"][offs] * valid[:, None, None]


def device_frame_rays(frames: Dict, idx, intr, H: int, W: int,
                      inds: Optional[jnp.ndarray] = None):
    """Rays for frame ``idx`` from the device-resident pose store; ``inds``
    selects a pixel subset (ray-sampled tasks), None renders the full frame."""
    from genefaceplusplus_tpu.utils.rays import pixel_rays

    sel = None if inds is None else inds[None]
    rays_o, rays_d, _ = pixel_rays(frames["poses"][idx][None], intr, H, W, sel)
    return rays_o[0], rays_d[0]
