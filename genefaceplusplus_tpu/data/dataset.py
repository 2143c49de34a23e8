"""RAD-NeRF dataset: binarized talking-head video -> training/eval samples.

Parity: RADNeRFDataset, /root/reference/tasks/radnerfs/dataset_utils.py:160-447
and the binarizer record format (data_gen/runs/binarizer_nerf.py:197-305):
  ds_dict keys: bg_img [H,W,3]u8, H, W, focal, cx, cy, id [T,80], exp [T,64],
  euler [T,3], trans [T,3], eye_area_percent [T,1], idexp_lm3d [T,204]
  (+_mean/_std [204]), hubert [2T,1024], mel [2T,80], f0 [2T],
  train_samples/val_samples: per-frame {idx, *_img_fname, face_rect,
  lip_rect, c2w [4,4]}.

Behaviour mirrored:
  * ngp pose conversion with camera_scale/offset (dataset_utils.py:231,
    utils.py:53-60)
  * landmark conds normalised by dataset mean/std (:244-287)
  * smoothed eval camera path (:137-157)
  * polygon face mask from the lm68 convex hull (:77-91)
  * 10/11 train / 1/11 val split (binarizer_nerf.py:279-282)

Also provides `synthetic()` — a deterministic miniature dataset enabling the
full pipeline (training + inference) without the mediapipe/BFM preprocessing
stack, used by tests and demos.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from genefaceplusplus_tpu.utils.rotation import nerf_matrix_to_ngp
from genefaceplusplus_tpu.utils.smoothing import smooth_camera_sequence


def get_boundary_mask(lm2d: np.ndarray, H: int, W: int) -> np.ndarray:
    """Filled convex hull of the 2D landmarks -> bool [H, W] face mask
    (dataset_utils.py:77-91)."""
    import cv2

    pts = np.clip((lm2d * np.asarray([W, H])).astype(np.int32), 0, [W - 1, H - 1])
    hull = cv2.convexHull(pts)
    mask = np.zeros((H, W), np.uint8)
    cv2.fillConvexPoly(mask, hull, 1)
    return mask.astype(bool)


def get_face_rect(lm68: np.ndarray, H: int, W: int, margin: float = 0.1):
    xs = lm68[:, 0] * W if lm68.max() <= 1.5 else lm68[:, 0]
    ys = lm68[:, 1] * H if lm68.max() <= 1.5 else lm68[:, 1]
    mx = (xs.max() - xs.min()) * margin
    my = (ys.max() - ys.min()) * margin
    return [
        int(max(0, ys.min() - my)), int(min(H, ys.max() + my)),
        int(max(0, xs.min() - mx)), int(min(W, xs.max() + mx)),
    ]


class RADNeRFDataset:
    def __init__(
        self,
        ds: Dict | str,
        split: str = "train",
        camera_scale: float = 4.0,
        camera_offset=(0.0, 0.0, 0.0),
        smooth_eval_camera: bool = True,
        camera_smooth_kernel: int = 7,
        cond_win_size: int = 1,
        smo_win_size: int = 3,
        with_sr: bool = True,
    ):
        if isinstance(ds, str):
            ds = np.load(ds, allow_pickle=True).tolist()
        self.ds = ds
        self.split = split
        self.H = int(ds["H"])
        self.W = int(ds["W"])
        if with_sr:  # SR models render at half resolution (dataset_utils.py:187-190)
            self.H //= 2
            self.W //= 2
        self.focal = float(ds["focal"])
        scale = self.H / int(ds["H"])
        self.intrinsics = (
            self.focal * scale, self.focal * scale,
            float(ds["cx"]) * scale, float(ds["cy"]) * scale,
        )
        self.samples: List[Dict] = ds[f"{split}_samples"]
        self.cond_win_size = cond_win_size
        self.smo_win_size = smo_win_size
        # decoded-image LRU (uint8, at target resolution): every train step
        # samples a random frame, so without this each step pays a disk read
        # + JPEG decode + resize (the reference leans on the torch DataLoader
        # worker pool for the same job)
        self._img_cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._img_cache_bytes = 0
        self.img_cache_mb = 1024

        # ngp-convention c2w poses
        c2ws = np.stack([s["c2w"] for s in self.samples])
        poses = np.stack([
            nerf_matrix_to_ngp(c, scale=camera_scale, offset=camera_offset) for c in c2ws
        ])
        if split != "train" and smooth_eval_camera:
            poses = smooth_camera_sequence(poses, camera_smooth_kernel)
        self.poses = poses.astype(np.float32)

        # landmark conditions, normalised by dataset statistics
        lm = np.asarray(ds["idexp_lm3d"], np.float32)  # [T, 204]
        self.idexp_lm3d_mean = np.asarray(
            ds.get("idexp_lm3d_mean", lm.mean(0)), np.float32
        )
        self.idexp_lm3d_std = np.asarray(
            ds.get("idexp_lm3d_std", lm.std(0) + 1e-8), np.float32
        )
        normalized = (lm - self.idexp_lm3d_mean) / self.idexp_lm3d_std
        # full-timeline conds (for temporal smoothing windows that may cross
        # the split boundary) + split-local views indexed like samples. The
        # samples' stored global frame id maps local -> timeline; without it
        # a val-split dataset would condition frame i on TRAIN frame i's
        # landmarks (binarizer split, binarizer_nerf.py:279-282).
        self.frame_ids = np.asarray(
            [s.get("idx", k) for k, s in enumerate(self.samples)], np.int64
        )
        self.conds_all = normalized.reshape(len(lm), cond_win_size, -1).astype(np.float32)
        self.conds = self.conds_all[np.clip(self.frame_ids, 0, len(lm) - 1)]

        eye_all = np.asarray(
            ds.get("eye_area_percent", np.full((len(lm), 1), 0.25)), np.float32
        ).reshape(len(lm), 1)
        self.eye_area_percents = eye_all[np.clip(self.frame_ids, 0, len(lm) - 1)]

        self.bg_img = np.asarray(ds["bg_img"], np.float32)
        if self.bg_img.max() > 1.5:
            self.bg_img = self.bg_img / 255.0
        if self.bg_img.shape[0] != self.H:
            import cv2

            self.bg_img = cv2.resize(self.bg_img, (self.W, self.H))

    def __len__(self):
        return len(self.samples)

    def frame_pose(self, i: int) -> np.ndarray:
        return self.poses[i]

    def frame_cond_window(self, i: int) -> np.ndarray:
        """Centered smo window of conds [smo_win, cond_win, C] (att_mode=2).
        The window slides over the FULL timeline (a val frame's neighbours
        are its real temporal neighbours, which may be train frames)."""
        T = len(self.conds_all)
        left = int(self.frame_ids[i]) - self.smo_win_size // 2
        offs = np.arange(self.smo_win_size) + left
        valid = (offs >= 0) & (offs < T)
        win = self.conds_all[np.clip(offs, 0, T - 1)].copy()
        win[~valid] = 0.0
        return win

    def _cache_put(self, key, u8: np.ndarray):
        self._img_cache[key] = u8
        self._img_cache_bytes += u8.nbytes
        cap = self.img_cache_mb * 2 ** 20
        while self._img_cache_bytes > cap and self._img_cache:
            _, old = self._img_cache.popitem(last=False)
            self._img_cache_bytes -= old.nbytes

    def load_image(self, i: int, kind: str = "gt", with_alpha: bool = False,
                   full_res: bool = False) -> Optional[np.ndarray]:
        """Load gt/head/torso image for frame i as float [H, W, 3] in [0,1]
        (or [H, W, 4] with `with_alpha` when the stored image has alpha).
        Decoded+resized frames are LRU-cached as uint8 (img_cache_mb cap).

        full_res=True returns the image at its STORED resolution (ds['H'])
        instead of the render resolution — the SR task's 2x ground truth
        (the reference keeps gt_img at 512 and only downsamples the raw-NeRF
        target, dataset_utils.py:187-190)."""
        import cv2

        target_h = int(self.ds["H"]) if full_res else self.H
        target_w = int(self.ds["W"]) if full_res else self.W
        key = (i, kind, full_res)
        cached = self._img_cache.get(key)
        if cached is not None:
            self._img_cache.move_to_end(key)
            img = cached.astype(np.float32) / 255.0
            return img if (with_alpha and img.shape[-1] == 4) else img[..., :3]

        fname = self.samples[i].get(f"{kind}_img_fname")
        if fname is None or not os.path.exists(fname):
            arr = self.samples[i].get(f"{kind}_img")
            if arr is None:
                return None
            img = np.asarray(arr, np.float32)
        else:
            raw = cv2.imread(fname, cv2.IMREAD_UNCHANGED)
            if raw.shape[-1] == 4:
                img = np.concatenate(
                    [cv2.cvtColor(raw[..., :3], cv2.COLOR_BGR2RGB), raw[..., 3:]], -1
                ).astype(np.float32)
            else:
                img = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB).astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.shape[0] != target_h:
            img = cv2.resize(img, (target_w, target_h))
        u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        self._cache_put(key, u8)
        img = u8.astype(np.float32) / 255.0  # first access == cached access
        return img if (with_alpha and img.shape[-1] == 4) else img[..., :3]

    def frame_bg_torso(self, i: int) -> Optional[np.ndarray]:
        """Inpainted-torso image composited over the static background —
        the head task's per-frame render background ("torso as part of
        background", dataset_utils.py:400-412). None when no torso images
        were prepared (segmentation step not run)."""
        t = self.load_image(i, "torso", with_alpha=True)
        if t is None or t.shape[-1] != 4:
            return None
        alpha = t[..., 3:]
        return t[..., :3] * alpha + self.bg_img * (1.0 - alpha)


def synthetic(
    num_frames: int = 24, H: int = 64, W: int = 64, seed: int = 0,
    structured: bool = False,
) -> Dict:
    """Deterministic miniature ds_dict with the exact binarizer schema.

    structured=True replaces the random gt frames with a learnable scene —
    a soft blob whose position tracks the camera and whose color tracks the
    landmark condition — so rendered-PSNR comparisons between field
    variants measure fit quality, not noise."""
    rng = np.random.RandomState(seed)
    T = num_frames
    lm = rng.randn(T, 204).astype(np.float32) * 0.1
    # normalised 2D landmarks on an ellipse around the image centre (for
    # the convex-hull face mask), jittered per frame
    theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    base_lms = np.stack([0.5 + 0.2 * np.cos(theta), 0.5 + 0.25 * np.sin(theta)], -1)
    lms = (base_lms[None] + rng.randn(T, 68, 2) * 0.005).astype(np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32)[None], (T, 1, 1))
    c2w[:, 2, 3] = 0.6  # camera in front of the face
    c2w[:, 0, 3] = 0.05 * np.sin(np.linspace(0, 2 * np.pi, T))
    def _gt(i: int) -> np.ndarray:
        if not structured:
            return rng.rand(H, W, 3).astype(np.float32)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        # blob centre tracks the camera x-offset; color tracks the condition
        cx = W / 2 + c2w[i, 0, 3] * W * 4
        cy = H / 2
        r2 = ((xx - cx) ** 2 + (yy - cy) ** 2) / (0.08 * H * W)
        blob = np.exp(-r2)
        color = 0.5 + 0.4 * np.tanh(lm[i, :3])
        img = 0.15 + blob[..., None] * color[None, None]
        return np.clip(img, 0, 1).astype(np.float32)

    samples = [
        {
            "idx": i,
            "c2w": c2w[i],
            "face_rect": [H // 4, 3 * H // 4, W // 4, 3 * W // 4],
            "lip_rect": [H // 2, 3 * H // 4, W // 3, 2 * W // 3],
            "lms": lms[i],
            "gt_img": _gt(i),
        }
        for i in range(T)
    ]
    n_train = T // 11 * 10 if T >= 11 else max(1, T - 2)
    return {
        "bg_img": (rng.rand(H, W, 3) * 255).astype(np.uint8),
        "H": H,
        "W": W,
        "focal": 1015.0 * H / 224.0,
        "cx": W / 2.0,
        "cy": H / 2.0,
        "id": rng.randn(T, 80).astype(np.float32) * 0.1,
        "exp": rng.randn(T, 64).astype(np.float32) * 0.1,
        "euler": rng.randn(T, 3).astype(np.float32) * 0.05,
        "trans": rng.randn(T, 3).astype(np.float32) * 0.05,
        "eye_area_percent": np.full((T, 1), 0.25, np.float32),
        "idexp_lm3d": lm,
        "idexp_lm3d_mean": lm.mean(0),
        "idexp_lm3d_std": lm.std(0) + 1e-3,
        "hubert": rng.randn(2 * T, 1024).astype(np.float32),
        "mel": rng.randn(2 * T, 80).astype(np.float32),
        "f0": np.abs(rng.randn(2 * T)).astype(np.float32) * 100 + 100,
        "train_samples": samples[:n_train],
        "val_samples": samples[n_train:],
    }
