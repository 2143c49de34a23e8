"""End-to-end inference: wav -> audio2motion -> landmarks -> NeRF video.

Parity: GeneFace2Infer, /root/reference/inference/genefacepp_infer.py:117-549 —
  * ctor(a2m_dir, postnet_dir, head_dir, torso_dir): each checkpoint dir is
    self-describing (config.yaml), models rebuilt from it (:137-191)
  * prepare_batch: wav -> 16k -> HuBERT + mel/F0, pose/ray schedule
    (static | index | mirror loop) (:199-275)
  * forward_audio2secc (:298-431): sample exp from the flow-VAE, landmark
    reconstruction, dataset-statistics normalisation + 3%/97% quantile
    clamping, LLE projection blend, optional periodic blink injection,
    per-region landmark recomposition, windowed conds
  * forward_secc2video (:433-518): per-frame NeRF render + SR + video mux

TPU-native notes: the per-frame hot loop is ONE jitted function (head +
torso + SR fused); rays can shard over a device mesh (parallel/).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.config import Config, set_hparams
from genefaceplusplus_tpu.data import audio as audio_lib
from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
from genefaceplusplus_tpu.data.face3d import Face3DHelper
from genefaceplusplus_tpu.data.landmarks import (
    INDEX_LM68_FROM_LM478,
    inject_blink_to_lm68,
    recompose_lm68_regions,
)
from genefaceplusplus_tpu.data.video import StreamingVideoWriter, mux_audio
from genefaceplusplus_tpu.models.audio2motion.vae_model import PitchContourVAEModel, VAEModel
from genefaceplusplus_tpu.models.full_renderer import render_full_frame
from genefaceplusplus_tpu.models.postnet.lle import compute_lle_projection
from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.radnerf_torso import TorsoConfig, TorsoField
from genefaceplusplus_tpu.models.renderer import RenderOptions
from genefaceplusplus_tpu.models.superresolution import Superresolution
from genefaceplusplus_tpu.utils.audio_features import get_audio_features_batch
from genefaceplusplus_tpu.utils.ckpt import get_last_checkpoint, restore_into
from genefaceplusplus_tpu.utils.rays import get_bg_coords, pixel_rays
from genefaceplusplus_tpu.utils.smoothing import mirror_index, smooth_features_xd


def default_inp(**kw) -> Dict[str, Any]:
    """CLI-flag defaults (genefacepp_infer.py:552-592)."""
    inp = {
        "drv_aud": "",
        "drv_pose": "nearest",  # static | <int idx> | <start-end> | nearest/mirror
        "blink_mode": "period",  # none | period
        "temperature": 0.2,
        "lle_percent": 0.2,
        "mouth_amp": 0.4,
        "out_name": "out.mp4",
        "fp16": True,
        "low_memory_usage": True,
        "T_thresh": 1e-2,
        "debug": False,
    }
    inp.update(kw)
    return inp


def resolve_crop(inp: Dict[str, Any], key: str, auto_value):
    """Resolve a crop knob from `inp`: "auto" (default) -> the load-time
    value, "off"/"none"/None -> disabled, an explicit rect (list/tuple of
    ints, possibly nested — converted to tuples for hashable jit-cache
    keys), or ValueError — unknown strings must fail loudly, not become
    character tuples used as crop dims."""
    val = inp.get(key, "auto")
    if isinstance(val, str):
        s = val.strip().lower()
        if s == "auto":
            return auto_value
        if s in ("off", "none", ""):
            return None
        raise ValueError(
            f"{key}={val!r}: expected 'auto', 'off', or an explicit rect "
            f"(list/tuple of ints)")
    if val is None:
        return None
    if not isinstance(val, (list, tuple)):
        raise ValueError(
            f"{key}={val!r}: expected 'auto', 'off', or a list/tuple rect")
    return tuple(tuple(v) if isinstance(v, (list, tuple)) else v for v in val)


class GeneFaceInfer:
    """Loads audio2motion + head [+ torso] checkpoint dirs and runs wav->mp4."""

    def __init__(
        self,
        audio2secc_dir: Optional[str] = None,
        postnet_dir: Optional[str] = None,
        head_model_dir: Optional[str] = None,
        torso_model_dir: Optional[str] = None,
        dataset: Optional[RADNeRFDataset] = None,
        bfm_dir: str = "deep_3drecon/BFM",
        mesh=None,  # jax.sharding.Mesh with a 'rays' axis: shard frame rays over chips
    ):
        self.rng = jax.random.PRNGKey(42)
        self.mesh = mesh
        # ---- audio2motion ----
        self.a2m_cfg = set_hparams(work_dir=audio2secc_dir) if audio2secc_dir else Config({})
        audio_in_dim = self.a2m_cfg.get("audio_in_dim", 1024)
        # motion_type: "exp" (64-d 3DMM coeffs, the reference default),
        # "id_exp" (80+64), or "idexp_lm3d" (204-d landmark space — direct
        # drive for identities without a BFM-consistent exp basis; pairs
        # with A2MTaskConfig.target="idexp_lm3d")
        in_out_dim = {"id_exp": 144, "idexp_lm3d": 204}.get(
            self.a2m_cfg.get("motion_type", "exp"), 64)
        size_kw = dict(
            hidden_channels=self.a2m_cfg.get("a2m_hidden_channels", 256),
            enc_n_layers=self.a2m_cfg.get("a2m_enc_layers", 8),
            dec_n_layers=self.a2m_cfg.get("a2m_dec_layers", 4),
            flow_hidden=self.a2m_cfg.get("a2m_flow_hidden", 64),
            flow_n_blocks=self.a2m_cfg.get("a2m_flow_blocks", 4),
        )
        if self.a2m_cfg.get("use_pitch", True):
            self.a2m_model = PitchContourVAEModel(
                in_out_dim=in_out_dim, audio_in_dim=audio_in_dim,
                use_mouth_amp_embed=self.a2m_cfg.get("use_mouth_amp_embed", True),
                **size_kw,
            )
        else:
            self.a2m_model = VAEModel(in_out_dim=in_out_dim, audio_in_dim=audio_in_dim, **size_kw)
        self.a2m_params = self._load_params(audio2secc_dir, self._init_a2m)

        # ---- postnet (optional landmark refiner; genefacepp_infer.py:152-162,
        # 349-369 — the branch the reference only reaches with --postnet_ckpt) ----
        self.postnet_model = None
        self.postnet_params = None
        if postnet_dir:
            from genefaceplusplus_tpu.models.postnet.models import PitchContourCNNPostNet

            pn_cfg = set_hparams(work_dir=postnet_dir)
            self.postnet_model = PitchContourCNNPostNet(
                out_dim=pn_cfg.get("postnet_out_dim", 204),
                hidden=pn_cfg.get("postnet_hidden", 256),
                n_layers=pn_cfg.get("postnet_layers", 4),
            )
            self.postnet_params = self._load_params(postnet_dir, self._init_postnet)

        # ---- head (+ torso) renderer ----
        # torso checkpoints don't bundle head weights: when only the torso
        # dir is given, resolve the head dir the torso task recorded in its
        # config (head_model_dir), mirroring the reference's bundled-load
        # (genefacepp_infer.py:164-175 loads both from one ckpt).
        if not head_model_dir and torso_model_dir:
            t_cfg_probe = set_hparams(work_dir=torso_model_dir)
            head_model_dir = t_cfg_probe.get("head_model_dir", "") or None
        self.head_cfg_raw = set_hparams(work_dir=head_model_dir or torso_model_dir) if (head_model_dir or torso_model_dir) else Config({})
        self.head_cfg = RADNeRFConfig.from_hparams(self.head_cfg_raw)
        self.head_model = RADNeRF(self.head_cfg)
        self.head_params = self._load_params(
            head_model_dir or torso_model_dir, self._init_head, sub="head",
            required=bool(head_model_dir or torso_model_dir),
        )

        self.torso_model = None
        self.torso_params = None
        if torso_model_dir:
            t_cfg_raw = set_hparams(work_dir=torso_model_dir)
            self.torso_cfg = TorsoConfig.from_hparams(t_cfg_raw)
            self.torso_model = TorsoField(self.torso_cfg)
            self.torso_params = self._load_params(torso_model_dir, self._init_torso, sub="torso")

        self.sr_model = None
        self.sr_params = None
        if self.head_cfg_raw.get("with_sr", False):
            # reference SR blocks run fp16 (radnerf_sr.py:19); bf16 is the
            # TPU equivalent and the production default (sr_dtype knob)
            sr_dtype = (jnp.bfloat16 if self.head_cfg_raw.get("sr_dtype", "bfloat16")
                        == "bfloat16" else jnp.float32)
            self.sr_model = Superresolution(channels=3, input_resolution=256,
                                            dtype=sr_dtype)
            self.sr_params = self._load_params(head_model_dir or torso_model_dir, self._init_sr, sub="sr")

        # ---- dataset statistics / driving poses ----
        if dataset is None and self.head_cfg_raw.get("binary_data_dir"):
            ds_path = os.path.join(
                self.head_cfg_raw["binary_data_dir"], self.head_cfg_raw.get("video_id", ""), "trainval_dataset.npy"
            )
            if os.path.exists(ds_path):
                dataset = RADNeRFDataset(
                    ds_path, split="train",
                    smo_win_size=self.head_cfg.smo_win_size,
                    with_sr=self.head_cfg_raw.get("with_sr", True),
                )
        self.dataset = dataset
        self.face3d_helper = Face3DHelper.load(bfm_dir, keypoint_mode="mediapipe")
        self.bfm_dir = bfm_dir
        self._secc_renderer: Any = "unset"  # lazy (--debug only)
        if dataset is not None:
            eaps = dataset.eye_area_percents
            self.opened_eye_area_percent = float(np.quantile(eaps, 0.97))
            self.closed_eye_area_percent = float(np.quantile(eaps, 0.03))
        else:
            self.opened_eye_area_percent, self.closed_eye_area_percent = 0.6, 0.15

        # occupancy grids: restored from ckpt extra_state if present
        self.occupancy, self.torso_occupancy_2d = self._restored_occupancy(
            head_model_dir or torso_model_dir, torso_model_dir
        )

        # head-crop auto-sizing: union of the occupied-AABB screen projection
        # over the dataset poses, padded + rounded; the head field then runs
        # on a fixed crop with per-frame dynamic offset (full_renderer.py:
        # head_crop_offset) — the static-shape analogue of the reference's
        # alive-ray early-out for rays that never touch the head
        self.head_crop = self._auto_head_crop()
        # torso footprint is static in screen space: one rect at load time
        # (models/full_renderer.py:auto_torso_crop)
        self.torso_crop = None
        if self.torso_occupancy_2d is not None and self.dataset is not None:
            from genefaceplusplus_tpu.models.full_renderer import auto_torso_crop

            # crop threshold MUST match the render-time mask threshold
            # (min(density_thresh_torso, mean_density) — mean is 0 at
            # inference) or the crop silently cuts real torso alpha
            self.torso_crop = auto_torso_crop(
                self.torso_occupancy_2d, self.dataset.H, self.dataset.W,
                thr=self.torso_cfg.density_thresh_torso)
        # outside union(head bbox, torso rect) the raw composite == static
        # bg, so its SR is frame-constant: precompute SR(bg) once and SR
        # only the changing rect per frame (full_renderer.py:auto_sr_crop)
        self.sr_crop, self.sr_bg = self._auto_sr_crop()

        # jitted frame/chunk functions, cached per (opts, H, W[, chunk]) —
        # rebuilding the closure per call would recompile the full frame
        # program for every streamed chunk
        self._fn_cache: Dict[tuple, Any] = {}
        # jitted hot paths outside the frame loop: eager dispatch compiles
        # per primitive through the axon TPU tunnel (measured: the eager
        # a2m forward alone stalls streaming for minutes), so every
        # device-sized computation here must be jitted. jax.jit retraces
        # per shape (audio length), which is exactly the cache we want.
        self._a2m_jit: Dict[float, Any] = {}
        if self.face3d_helper is not None:
            self._jit_idexp_lm3d = jax.jit(self.face3d_helper.reconstruct_idexp_lm3d)
            self._jit_lm2d_nerf = jax.jit(self.face3d_helper.reconstruct_lm2d_nerf)
            self._jit_project_lm2d = jax.jit(self.face3d_helper.project_lm3d_nerf)
        self._jit_lle = jax.jit(compute_lle_projection, static_argnames=("K",))
        self._jit_rays = jax.jit(pixel_rays, static_argnums=(1, 2, 3))
        self._jit_cond_windows = jax.jit(get_audio_features_batch, static_argnums=(2,))

    # ------------------------------------------------------------------
    def _auto_head_crop(self):
        """Crop (ch, cw) covering the occupied AABB's projection across every
        dataset pose, or None when cropping would not pay / statistics are
        unavailable (models/full_renderer.py:auto_head_crop)."""
        ds = self.dataset
        if ds is None or self.occupancy is None:
            return None
        from genefaceplusplus_tpu.models.full_renderer import (
            auto_head_bbox, auto_head_crop)

        poses = np.stack([ds.frame_pose(i) for i in range(len(ds))])
        self._head_bbox = auto_head_bbox(self.occupancy, poses, ds.intrinsics,
                                         ds.H, ds.W, bound=self.head_cfg.bound)
        # head_crop_pad_px knob (ROADMAP #5): the projected-corner bbox
        # already covers the hit set exactly, so any pad >= 0 is lossless
        # (tests/test_full_renderer.py:test_auto_head_crop_lossless_at_any_pad,
        # production-shape measurement scripts/check_crop_pad.py); pad only
        # absorbs rounding headroom for drive poses near the dataset hull.
        return auto_head_crop(self.occupancy, poses, ds.intrinsics,
                              ds.H, ds.W, bound=self.head_cfg.bound,
                              pad_px=int(self.head_cfg_raw.get("head_crop_pad_px", 12)),
                              bbox=self._head_bbox)

    def _auto_sr_crop(self):
        """(sr_crop, sr_bg): static SR rect + precomputed SR(bg) canvas, or
        (None, None) when SR is absent or the changing region ~fills the
        frame (full_renderer.py:auto_sr_crop). Reuses the head bbox
        projected by _auto_head_crop when fresh, else projects it here —
        callers that mutate `occupancy` after construction must re-run
        _auto_head_crop() first (or clear self._head_bbox) so both crops
        see the same geometry."""
        ds = self.dataset
        if (self.sr_model is None or ds is None or self.occupancy is None
                or ds.bg_img is None):
            return None, None
        from genefaceplusplus_tpu.models.full_renderer import (
            auto_head_bbox, auto_sr_crop)

        bbox = getattr(self, "_head_bbox", None)
        if bbox is None:
            poses = np.stack([ds.frame_pose(i) for i in range(len(ds))])
            bbox = auto_head_bbox(self.occupancy, poses, ds.intrinsics,
                                  ds.H, ds.W, bound=self.head_cfg.bound)
        if self.torso_model is None:
            torso_rect = None
        elif self.torso_crop is not None:
            torso_rect = self.torso_crop
        else:
            torso_rect = (0, 0, ds.H, ds.W)  # uncropped torso: alpha unbounded
        sr_crop = auto_sr_crop(bbox, torso_rect, ds.H, ds.W)
        if sr_crop is None:
            return None, None
        bg = jnp.asarray(ds.bg_img, jnp.float32).reshape(1, ds.H, ds.W, 3)
        # jit the one-time SR(bg): eager dispatch compiles per-primitive
        # (pathological through the axon TPU tunnel)
        sr_bg = jax.jit(
            lambda p, b: jnp.clip(self.sr_model.apply(p, b), 0.0, 1.0)
        )(self.sr_params, bg)[0]
        return sr_crop, jax.device_put(sr_bg)

    # ------------------------------------------------------------------
    def _init_a2m(self):
        T = 8
        batch = {
            "audio": jnp.zeros((1, 2 * T, self.a2m_cfg.get("audio_in_dim", 1024))),
            "f0": jnp.zeros((1, 2 * T)),
            "y_mask": jnp.ones((1, T)),
            "y": jnp.zeros((1, T, self.a2m_model.in_out_dim)),
        }
        return self.a2m_model.init(jax.random.PRNGKey(0), batch, train=True, rng=jax.random.PRNGKey(1))

    def _init_head(self):
        c = self.head_cfg
        cond = jnp.zeros((c.smo_win_size, c.cond_win_size, c.cond_in_dim))
        return self.head_model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)

    def _init_torso(self):
        x = jnp.zeros((8, 2))
        lm68 = jnp.zeros((1, 68, 2))
        ind = jnp.zeros(self.torso_cfg.torso_individual_embedding_dim)
        return self.torso_model.init(jax.random.PRNGKey(0), x, lm68, ind, jnp.zeros((8, 3)), jnp.zeros((8, 1)))

    def _init_sr(self):
        return self.sr_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))

    def _init_postnet(self):
        return self.postnet_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, self.postnet_model.out_dim)),
            jnp.zeros((1, 16, 1)),
        )

    def _load_params(self, work_dir, init_fn, sub: Optional[str] = None,
                     required: bool = False):
        template = init_fn()
        if not work_dir:
            return template
        ckpt, path = get_last_checkpoint(work_dir)
        if ckpt is None:
            # config-only dir: legitimate (fresh experiment) — keep init
            if required:
                print(f"| WARNING: no checkpoint in {work_dir} (sub={sub}); "
                      "using initialised weights")
            return template
        state = ckpt.get("state_dict", ckpt)
        # unwrap TrainState containers saved by the trainer (head:
        # {'params': variables, 'opt_state': ...}; torso: {'torso_params':
        # ...}; a2m: {'variables': ...})
        if isinstance(state, dict) and "opt_state" in state:
            for k in ("params", "torso_params", "variables"):
                if k in state:
                    state = state[k]
                    break
        # sub-model extraction (SR task bundles {'head': ..., 'sr': ...};
        # reference torch ckpts use {'model': ...})
        if isinstance(state, dict):
            if sub is not None and sub in state:
                state = state[sub]
            elif "model" in state:
                state = state["model"]
        restored = restore_into(template, state)
        # loud sanity: report matched/unmatched counts; a restore that
        # changed nothing means the checkpoint didn't match the model
        t_leaves = jax.tree.leaves(template)
        r_leaves = jax.tree.leaves(restored)
        changed = sum(
            0 if np.shape(a) != np.shape(b) or np.allclose(np.asarray(a), np.asarray(b)) else 1
            for a, b in zip(t_leaves, r_leaves)
        )
        n = len(t_leaves)
        if changed == 0:
            msg = (f"checkpoint at {path} matched no parameters (sub={sub}); "
                   f"0/{n} leaves restored")
            if required:
                raise ValueError(msg)
            print(f"| WARNING: {msg}; using initialised weights")
        elif changed < n:
            print(f"| ckpt {path} (sub={sub}): {changed}/{n} param leaves "
                  f"restored ({n - changed} kept at init — constant or unmatched)")
        return restored

    def _restored_occupancy(self, head_dir, torso_dir):
        """Occupancy (head 3D) + torso 2D alpha grid from checkpoint
        extra_state (trainer.save payload); fully-occupied fallbacks."""
        H = self.head_cfg.grid_size
        occ = jnp.ones((H, H, H), dtype=bool)
        torso2d = None
        if head_dir:
            ckpt, _ = get_last_checkpoint(head_dir)
            extra = (ckpt or {}).get("extra_state", {})
            if "occupancy" in extra and np.asarray(extra["occupancy"]).ndim == 3:
                occ = jnp.asarray(extra["occupancy"]).astype(bool)
        if torso_dir:
            ckpt, _ = get_last_checkpoint(torso_dir)
            extra = (ckpt or {}).get("extra_state", {})
            if "torso_grid" in extra:
                torso2d = jnp.asarray(extra["torso_grid"])
        return occ, torso2d

    # ------------------------------------------------------------------
    def prepare_batch_from_inp(self, inp: Dict[str, Any]) -> Dict[str, Any]:
        """wav -> features; driving pose schedule; ray buffers."""
        batch: Dict[str, Any] = {}
        if inp.get("drv_aud_features"):
            feats = np.load(inp["drv_aud_features"], allow_pickle=True).tolist()
            hubert, f0 = np.asarray(feats["hubert"], np.float32), np.asarray(feats["f0"], np.float32)
            wav16k = feats.get("wav16k")
        else:
            wav16k = audio_lib.load_wav_16k(inp["drv_aud"])
            wav16k, mel = audio_lib.extract_mel(wav16k)
            f0 = audio_lib.extract_f0(wav16k, mel_len=len(mel))
            if audio_lib.hubert_available():
                hubert = audio_lib.get_hubert_from_16k_speech(wav16k)
            else:
                raise RuntimeError(
                    "HuBERT weights unavailable in this environment; pass "
                    "inp['drv_aud_features'] = npy with {'hubert','f0'} instead."
                )
        # trim to multiples of 8 @50Hz like the reference (:277-289)
        t_x = hubert.shape[0] // 8 * 8
        hubert = hubert[:t_x]
        f0 = f0[:t_x] if len(f0) >= t_x else np.pad(f0, (0, t_x - len(f0)), mode="edge")
        if wav16k is None:
            wav16k = np.zeros(t_x * audio_lib.HOP_SIZE, np.float32)
        batch["hubert"] = hubert
        batch["f0"] = f0
        batch["wav16k"] = wav16k
        T_motion = t_x // 2
        batch["T"] = T_motion

        # driving poses
        ds = self.dataset
        assert ds is not None, "a driving dataset (poses/stats) is required"
        drv_pose = str(inp.get("drv_pose", "nearest"))
        n_ds = len(ds)
        if drv_pose == "static":
            pose_idx = [0] * T_motion
        elif drv_pose.isdigit():
            pose_idx = [min(int(drv_pose), n_ds - 1)] * T_motion
        elif "-" in drv_pose and all(p.isdigit() for p in drv_pose.split("-")):
            lo, hi = (int(p) for p in drv_pose.split("-"))
            span = list(range(lo, min(hi, n_ds)))
            pose_idx = [span[mirror_index(i, len(span))] for i in range(T_motion)]
        else:  # nearest/mirror: ping-pong over the whole dataset
            pose_idx = [mirror_index(i, n_ds) for i in range(T_motion)]
        batch["pose_idx"] = np.asarray(pose_idx)
        batch["poses"] = np.stack([ds.frame_pose(i) for i in pose_idx])
        batch["eulers"] = np.asarray(ds.ds["euler"])[pose_idx]
        batch["transs"] = np.asarray(ds.ds["trans"])[pose_idx]
        return batch

    # ------------------------------------------------------------------
    def forward_audio2secc(self, batch: Dict[str, Any], inp: Dict[str, Any]) -> Dict[str, Any]:
        T = batch["T"]
        a2m_batch = {
            "audio": jnp.asarray(batch["hubert"])[None],
            "f0": jnp.asarray(batch["f0"])[None],
            "y_mask": jnp.ones((1, T)),
            "mouth_amp": jnp.full((1, 1), float(inp.get("mouth_amp", 0.4))),
        }
        self.rng, sub = jax.random.split(self.rng)
        temp = float(inp.get("temperature", 0.2))
        if temp not in self._a2m_jit:
            model = self.a2m_model
            self._a2m_jit[temp] = jax.jit(
                lambda params, b, rng: model.apply(
                    params, b, train=False, temperature=temp, rng=rng))
        pred, _ = self._a2m_jit[temp](self.a2m_params, a2m_batch, sub)
        pred = np.asarray(pred[0])  # [T, 64] exp, 144 id+exp, or 204 idexp_lm3d
        if pred.shape[-1] == 204:
            # direct landmark-space motion (motion_type=idexp_lm3d): pred IS
            # idexp_lm3d in the binarizer's x10 convention — same space as
            # ds["idexp_lm3d"], so the stats/clamps below apply unchanged and
            # the 3DMM reconstruction is skipped. No id/exp coefficients
            # exist on this path: the SECC debug panel degenerates to the
            # identity's mean face, and the torso's lm68 condition projects
            # the driven landmarks directly (project_lm3d_nerf).
            idexp = pred.reshape(T, 68, 3)
            id_coeff = np.zeros((T, 80), np.float32)
            exp = np.zeros((T, 64), np.float32)
        else:
            if pred.shape[-1] == 144:
                id_coeff, exp = pred[:, :80], pred[:, 80:]
            else:
                ds_id = np.asarray(self.dataset.ds["id"], np.float32)
                id_coeff = np.tile(ds_id.mean(0, keepdims=True), (T, 1))
                exp = pred

            # landmark reconstruction on the mediapipe basis, subset to lm68
            idexp = np.asarray(self._jit_idexp_lm3d(
                jnp.asarray(id_coeff), jnp.asarray(exp)))
            if idexp.shape[1] >= 468:
                idexp = idexp[:, INDEX_LM68_FROM_LM478]

        # dataset statistics + quantile clamps (genefacepp_infer.py:334-344).
        # Use the dataset's OWN (stored) mean/std — the exact normalisation
        # the renderer was trained with (data/dataset.py) — not a recompute:
        # on zero-variance dims a different epsilon floor amplifies numeric
        # noise ~1000x into the condition.
        ds_lm = np.asarray(self.dataset.ds["idexp_lm3d"], np.float32).reshape(-1, 68, 3)
        mean = np.asarray(self.dataset.idexp_lm3d_mean, np.float32).reshape(1, 68, 3)
        std = np.asarray(self.dataset.idexp_lm3d_std, np.float32).reshape(1, 68, 3)
        norm_ds = (ds_lm - mean) / std
        lower = np.quantile(norm_ds, 0.03, axis=0)
        upper = np.quantile(norm_ds, 0.97, axis=0)

        flat = idexp.reshape(T, 68 * 3)

        # postnet refinement branch (genefacepp_infer.py:349-369): refine the
        # raw predicted landmarks with the pitch-conditioned CNN before the
        # LLE blend; active only when a postnet checkpoint was supplied
        if self.postnet_model is not None:
            f0 = np.asarray(batch["f0"], np.float32)
            f0n = (f0 / 400.0).reshape(1, -1, 1)
            if "postnet" not in self._fn_cache:
                self._fn_cache["postnet"] = jax.jit(self.postnet_model.apply)
            refined = self._fn_cache["postnet"](
                self.postnet_params, jnp.asarray(flat[None]), jnp.asarray(f0n)
            )
            flat = np.asarray(refined[0])

        # LLE blend onto the training manifold (:371-397)
        lle_percent = float(inp.get("lle_percent", 0.2))
        if lle_percent > 0:
            # K capped by the identity's frame count (tiny datasets)
            fuse, _, _ = self._jit_lle(
                jnp.asarray(flat), jnp.asarray(ds_lm.reshape(-1, 68 * 3)),
                K=min(10, ds_lm.shape[0]))
            flat = lle_percent * np.asarray(fuse) + (1 - lle_percent) * flat
        idexp = flat.reshape(T, 68, 3)
        normalized = np.clip((idexp - mean) / std, lower, upper)

        # canonical lm3d; optional periodic blink by direct editing (:402-404)
        key_mean = np.asarray(self.face3d_helper.key_mean_shape)
        if key_mean.shape[0] >= 468:
            key_mean = key_mean[INDEX_LM68_FROM_LM478]
        cano_lm3d = (mean + std * normalized) / 10.0 + key_mean[None]
        eye_area_percent = np.full((T, 1), self.opened_eye_area_percent, np.float32)
        if inp.get("blink_mode") == "period":
            cano_lm3d, eye_area_percent = inject_blink_to_lm68(
                cano_lm3d, self.opened_eye_area_percent, self.closed_eye_area_percent
            )
        normalized = ((cano_lm3d - key_mean[None]) * 10.0 - mean) / std
        normalized = np.clip(normalized, lower, upper)

        # freeze non-driven regions to the first frame (:411-418)
        normalized = recompose_lm68_regions(normalized)

        if not np.isfinite(normalized).all():
            # fail loudly: a non-finite condition renders structured garbage
            # that per-frame metrics under-report (found the hard way — a
            # singular unregularized LLE solve poisoned a whole eval run)
            bad = np.where(~np.isfinite(normalized).reshape(T, -1).all(axis=1))[0]
            raise FloatingPointError(
                f"non-finite driven condition at frames {bad.tolist()} — "
                "upstream a2m/postnet/LLE produced NaN/Inf")
        batch["eye_area_percent"] = eye_area_percent
        batch["cond"] = normalized.reshape(T, 1, 68 * 3).astype(np.float32)
        # driving coefficients kept for the --debug SECC panel
        # (genefacepp_infer.py:313-331 renders secc from id/exp + pose)
        batch["id_coeff"] = np.asarray(id_coeff, np.float32)
        batch["exp"] = np.asarray(exp, np.float32)

        # smoothed head pose -> lm68 2D for the torso condition (:425-429)
        smo_euler = smooth_features_xd(batch["eulers"])
        smo_trans = smooth_features_xd(batch["transs"])
        if pred.shape[-1] == 204:
            # direct-drive path: project the final driven landmarks (the
            # same cano set the head is conditioned on) — there are no
            # id/exp coefficients to reconstruct from. Use the per-identity
            # CALIBRATED camera projection (utils/lm_projection.py): the BFM
            # convention does not apply to idexp-native identities, and the
            # torso was trained on the dataset's stored 2D lms — feeding it
            # a different convention is catastrophically off-distribution
            # (found as an all-frames garbage torso in the audio-driven eval)
            cano_final = (mean + std * normalized) / 10.0 + key_mean[None]
            proj = self._cano_projection()
            if proj is not None:
                from genefaceplusplus_tpu.utils.lm_projection import project_cano_lm3d

                ds = self.dataset
                lm2d = project_cano_lm3d(
                    proj, cano_final.astype(np.float32),
                    np.asarray(batch["poses"], np.float32),
                    ds.intrinsics, ds.H, ds.W)
            else:
                lm2d = self._jit_project_lm2d(
                    jnp.asarray(cano_final), jnp.asarray(smo_euler), jnp.asarray(smo_trans))
        else:
            lm2d = self._jit_lm2d_nerf(
                jnp.asarray(id_coeff), jnp.asarray(exp), jnp.asarray(smo_euler), jnp.asarray(smo_trans)
            )
        lm2d = np.asarray(lm2d)
        if lm2d.shape[1] >= 468:
            lm2d = lm2d[:, INDEX_LM68_FROM_LM478]
        batch["lm68"] = lm2d.astype(np.float32)
        return batch

    # ------------------------------------------------------------------
    def _cano_projection(self):
        """Lazily calibrate the fixed canonical->world affine used to
        project driven landmarks for the torso condition on the
        direct-drive path (utils/lm_projection.py rationale). Cached;
        returns None (-> BFM-convention fallback) when the dataset lacks
        stored 2D landmarks or the fit does not explain them (non-static
        world head — not a RAD-NeRF-style dataset)."""
        if "cano_proj" in self._fn_cache:
            return self._fn_cache["cano_proj"]
        out = None
        ds = self.dataset
        if ds is not None and self.face3d_helper is not None and len(ds) >= 2:
            lms = [s.get("lms") for s in ds.samples]
            if all(l is not None for l in lms):
                from genefaceplusplus_tpu.utils.lm_projection import (
                    calibrate_cano_to_world)

                key_mean = np.asarray(self.face3d_helper.key_mean_shape)
                if key_mean.shape[0] >= 468:
                    key_mean = key_mean[INDEX_LM68_FROM_LM478]
                idexp = np.asarray(ds.ds["idexp_lm3d"], np.float32).reshape(-1, 68, 3)
                fids = np.clip(np.asarray(ds.frame_ids), 0, len(idexp) - 1)
                cano = idexp[fids] / 10.0 + key_mean[None]
                M, resid = calibrate_cano_to_world(
                    cano, ds.poses, ds.intrinsics, np.stack(lms), ds.H, ds.W)
                if resid <= 0.02 * ds.W:
                    out = M
                    print(f"| lm2d projection: calibrated (residual "
                          f"{resid:.2f}px @ {ds.W})")
                else:
                    print(f"| WARNING: lm2d calibration residual {resid:.1f}px "
                          f"> {0.02 * ds.W:.1f} — falling back to the BFM "
                          "projection convention")
        self._fn_cache["cano_proj"] = out
        return out

    # ------------------------------------------------------------------
    def _auto_compact_frac(self, poses, opts: RenderOptions, image_hw,
                           head_crop, max_probe: int = 32,
                           margin: float = 1.25) -> float:
        """Covering live-sample compaction budget for THIS call's poses.

        The marcher mask is pure geometry (occupancy x rays — no field, no
        condition), so the live count per pose is exact and cheap: probe up
        to `max_probe` evenly-spaced drive poses, take the max count, add
        `margin` for unprobed in-between poses, and express it as a fraction
        of the head render's R*S slot budget (R = the crop window when the
        auto head-crop is active; all live samples lie inside it by the
        crop-losslessness invariant). Returns 0.0 (compaction off) when the
        budget would not skip at least ~10% of slots, or in grid march mode."""
        if opts.march_mode != "interval":
            return 0.0
        H, W = image_hw
        key = ("live_count", opts.num_samples, opts.entry_mode, opts.max_steps,
               opts.dt_gamma, H, W)
        if key not in self._fn_cache:
            from genefaceplusplus_tpu.models.renderer import make_aabb
            from genefaceplusplus_tpu.ops import raymarch

            cfg = self.head_cfg
            intr = tuple(float(x) for x in np.asarray(self.dataset.intrinsics).reshape(-1))

            def live_count(pose, occupancy):
                from genefaceplusplus_tpu.utils.rays import pixel_rays

                ro, rd, _ = pixel_rays(pose[None], intr, H, W)
                ro, rd = ro[0], rd[0]
                aabb = make_aabb(cfg.bound)
                nears, fars = raymarch.near_far_from_aabb(ro, rd, aabb, cfg.min_near)
                occ_box = raymarch.occupancy_aabb(occupancy, cfg.bound)
                t_entry = t_exit = None
                if opts.entry_mode == "probe":
                    t_entry, t_exit = raymarch.entry_exit_depth_map(
                        ro, rd, occupancy, occ_box, cfg.bound, (H, W),
                        stride=opts.probe_stride,
                        coarse_factor=opts.probe_coarse_factor,
                        n_probe=opts.n_probe, min_near=cfg.min_near)
                m = raymarch.march_rays_interval(
                    ro, rd, nears, fars, occ_box, bound=cfg.bound,
                    dt_gamma=opts.dt_gamma, max_steps=opts.max_steps,
                    num_samples=opts.num_samples, min_near=cfg.min_near,
                    grid_size=occupancy.shape[0], t_entry=t_entry,
                    t_exit=t_exit)
                return m.mask.sum()

            self._fn_cache[key] = jax.jit(live_count)
        count_fn = self._fn_cache[key]
        T = len(poses)
        sel = np.unique(np.linspace(0, T - 1, min(T, max_probe)).astype(int))
        max_live = max(
            int(count_fn(jnp.asarray(poses[i], jnp.float32), self.occupancy))
            for i in sel)
        R = head_crop[0] * head_crop[1] if head_crop is not None else H * W
        N = R * opts.num_samples
        frac = margin * max_live / float(N)
        frac = min(max(frac, 1.0 / opts.num_samples), 1.0)
        # quantise to the renderer's actual 512-slot budget granularity
        # (renderer.py: M = ceil(frac*N / 512) * 512): successive calls whose
        # poses imply the same slot budget then produce an IDENTICAL
        # RenderOptions and hit the jit cache instead of recompiling the
        # whole chunked render graph per request
        M = min(N, max(512, ((int(frac * N) + 511) // 512) * 512))
        frac = M / float(N)
        if frac >= 0.9:
            return 0.0
        return float(frac)

    def _build_chunk_fn(self, opts: RenderOptions, H: int, W: int, chunk: int,
                        head_crop=None, torso_crop=None, sr_crop=None,
                        out_dtype="float32", mesh=None):
        """Render `chunk` frames in ONE device dispatch (lax.scan): host
        dispatch latency would otherwise dominate the production frame loop
        (docs/DESIGN.md: ~26 ms/dispatch through the TPU tunnel).
        out_dtype="uint8" quantises ON DEVICE (bit-identical to the host's
        (clip*255).astype(uint8)) — 4x less device->host frame traffic,
        which dominates streaming through the tunnel.

        mesh (or self.mesh): a Mesh with a 'rays' axis — the per-frame ray
        grid shards over it (in_shardings below; SURVEY §2.8 serving plan),
        params/occupancy replicate, outputs gather back replicated. The
        uint8 on-device quantisation is kept under the mesh."""
        if mesh is None:
            mesh = self.mesh
        mesh_key = (None if mesh is None
                    else (tuple(d.id for d in mesh.devices.flat), mesh.axis_names))
        key = ("chunk", opts, H, W, chunk, head_crop, torso_crop, sr_crop,
               out_dtype, mesh_key)
        if key in self._fn_cache:
            return self._fn_cache[key]
        head_model, torso_model, sr_model = self.head_model, self.torso_model, self.sr_model
        torso_occ2d = self.torso_occupancy_2d
        # frame-constant SR(bg) canvas; genuinely constant, so closure
        # capture (-> XLA constant) is correct here
        sr_bg = self.sr_bg if sr_crop is not None else None

        def chunk_fn(head_params, torso_params, sr_params, rays_o, rays_d,
                     cond_wins, eye_areas, occupancy, bg_color, bg_coords, lm68s):
            # rays_o/d: [C, R, 3]; cond_wins: [C, smo, 1, F]; lm68s: [C, 1, 68, 2]
            # SR stays INSIDE the scan body: batching it per chunk
            # (sr_apply_batched) measured 5% slower on TPU — materialising
            # the raw-frame stack between scan and SR costs more HBM
            # traffic than batch-1 convs lose (docs/DESIGN.md perf log)
            def body(_, xs):
                ro, rd, cw, ea, lm = xs
                out = render_full_frame(
                    head_model, head_params, ro, rd, cw, occupancy,
                    bg_color=bg_color, opts=opts, image_hw=(H, W),
                    eye_area_percent=ea, index=0,
                    torso_model=torso_model, torso_params=torso_params,
                    bg_coords=bg_coords, lm68=lm, occupancy_2d=torso_occ2d,
                    sr_model=sr_model, sr_params=sr_params,
                    head_crop=head_crop, torso_crop=torso_crop,
                    sr_crop=sr_crop, sr_bg=sr_bg,
                )
                img = out.sr_rgb_map if out.sr_rgb_map is not None else out.rgb_map.reshape(H, W, 3)
                if out_dtype == "uint8":
                    # quantise ON DEVICE: 4x less device->host frame traffic
                    img = (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
                fits = (jnp.asarray(True) if out.head_crop_fits is None
                        else out.head_crop_fits)
                return 0, (img, fits)

            _, (imgs, fits) = jax.lax.scan(body, 0, (rays_o, rays_d, cond_wins, eye_areas, lm68s))
            return imgs, fits  # [C, H', W', 3], [C] head-crop-fits flags

        if mesh is None:
            fn = jax.jit(chunk_fn)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            ray_mid = NamedSharding(mesh, P(None, "rays", None))  # [C, R, 3]
            ray_flat = NamedSharding(mesh, P("rays", None))  # [R, 3] / [R, 2]
            # args: head_params, torso_params, sr_params, rays_o, rays_d,
            #       cond_wins, eye_areas, occupancy, bg_color, bg_coords, lm68s
            in_shardings = (repl, repl, repl, ray_mid, ray_mid,
                            repl, repl, repl, ray_flat, ray_flat, repl)
            fn = jax.jit(chunk_fn, in_shardings=in_shardings, out_shardings=repl)
        self._fn_cache[key] = fn
        return fn

    def _secc_debug_frame(self, batch: Dict[str, Any], i: int, size: int) -> np.ndarray:
        """One SECC debug panel [size, size, 3] uint8 for driving frame i
        (reference --debug behavior, genefacepp_infer.py:313-331): the BFM
        mesh rasterised with NCC vertex colors when the licensed
        BFM_model_front.mat is present, else an NCC-colored splat of the
        driven keypoint landmarks (same color coding, sparse geometry)."""
        if self._secc_renderer == "unset":
            self._secc_renderer = None
            mat = os.path.join(self.bfm_dir, "BFM_model_front.mat")
            if os.path.exists(mat):
                from scipy.io import loadmat

                from genefaceplusplus_tpu.data.bfm_render import SECCRenderer

                m = loadmat(mat)
                mean_shape = m["meanshape"].reshape(-1, 3).astype(np.float32)
                mean_shape -= mean_shape.mean(0, keepdims=True)
                self._secc_renderer = SECCRenderer(
                    mean_shape, m["idBase"].astype(np.float32),
                    m["exBase"].astype(np.float32),
                    m["tri"].astype(np.int64) - 1, size=size,
                )
        idc, exp = batch["id_coeff"][i], batch["exp"][i]
        euler, trans = batch["eulers"][i], batch["transs"][i]
        if self._secc_renderer is not None:
            _, secc = self._secc_renderer.render(idc, exp, euler, trans)
            img = ((secc * 0.5 + 0.5) * 255).astype(np.uint8)
            if img.shape[0] != size:
                import cv2

                img = cv2.resize(img, (size, size))
            return img
        from genefaceplusplus_tpu.data.secc import render_secc

        lm3d_cam = np.asarray(self.face3d_helper.reconstruct_key_lm3d(
            jnp.asarray(idc[None]), jnp.asarray(exp[None]),
            jnp.asarray(euler[None]), jnp.asarray(trans[None])))[0]
        cano = np.asarray(self.face3d_helper.key_mean_shape)
        from genefaceplusplus_tpu.data.secc import ncc_colors

        return render_secc(lm3d_cam, ncc_colors(cano), size=size,
                           splat=max(2, size // 128))

    def forward_secc2video(self, batch: Dict[str, Any], inp: Dict[str, Any]) -> str:
        ds = self.dataset
        H, W = ds.H, ds.W
        T = batch["T"]
        # production fast path: coarse-probe entry + 10-sample budget is
        # bit-identical to the 16-sample AABB-entry render on trained
        # identities (tests/test_entry_probe.py + docs/DESIGN.md perf log)
        # and ~1.5x faster on the head stage; override via inp if needed.
        opts = RenderOptions(
            num_coarse=48,
            num_samples=int(inp.get("num_samples", 10)),
            T_thresh=float(inp.get("T_thresh", 1e-2)),
            entry_mode=str(inp.get("entry_mode", "probe")),
            # 0 = off; K>0 runs the color MLP on only the K highest-weight
            # samples per ray (approximation — validate per identity)
            color_topk=int(inp.get("color_topk", 0)),
        )
        # live-sample compaction budget: "auto" measures the max live count
        # over this call's drive poses and sets a covering budget (lossless
        # by construction, up to the probe subsample); a float is taken as-is
        cf_raw = inp.get("compact_frac", 0.0)
        chunk = int(inp.get("frames_per_dispatch", 8))
        chunk = max(1, min(chunk, T))
        head_crop = resolve_crop(inp, "head_crop", self.head_crop)
        torso_crop = resolve_crop(inp, "torso_crop", self.torso_crop)
        sr_crop = resolve_crop(inp, "sr_crop", self.sr_crop)
        if str(cf_raw) == "auto":
            opts = dataclasses.replace(opts, compact_frac=self._auto_compact_frac(
                batch["poses"], opts, (H, W), head_crop))
        elif float(cf_raw) > 0:
            opts = dataclasses.replace(opts, compact_frac=float(cf_raw))
        # the S=10/probe default is validated on trained identities only
        # (tests/test_entry_probe.py) — always announce the active budget so
        # a quality regression on a new identity is traceable to it
        print(f"| render: entry_mode={opts.entry_mode} num_samples={opts.num_samples} "
              f"color_topk={opts.color_topk} compact_frac={opts.compact_frac} "
              f"T_thresh={opts.T_thresh} head_crop={head_crop} torso_crop={torso_crop} "
              f"sr_crop={'on' if sr_crop else None} "
              f"mesh={self.mesh.shape if self.mesh is not None else None}")
        chunk_fn = self._build_chunk_fn(opts, H, W, chunk, head_crop=head_crop,
                                        torso_crop=torso_crop, sr_crop=sr_crop,
                                        out_dtype="uint8")
        bg_coords = get_bg_coords(H, W)[0]
        bg_color = jnp.asarray(ds.bg_img.reshape(-1, 3))
        conds = jnp.asarray(batch["cond"])  # [T, 1, 204]
        cond_windows = self._jit_cond_windows(conds, jnp.arange(T), self.head_cfg.smo_win_size)
        eye_areas = jnp.asarray(batch["eye_area_percent"])  # [T, 1]
        lm68s = jnp.asarray(batch["lm68"], jnp.float32)  # [T, 68, 2]

        debug = bool(inp.get("debug", False))
        tmp_video = os.path.splitext(inp["out_name"])[0] + "_novoice.mp4"
        writer = StreamingVideoWriter(tmp_video, fps=25)
        crop_misses = 0
        for start in range(0, T, chunk):
            idxs = [min(start + j, T - 1) for j in range(chunk)]  # pad tail
            n_real = min(chunk, T - start)
            poses = jnp.asarray(batch["poses"][idxs])  # [C, 4, 4]
            rays_o, rays_d, _ = self._jit_rays(poses, tuple(ds.intrinsics), H, W)
            imgs, fits = chunk_fn(
                self.head_params, self.torso_params, self.sr_params,
                rays_o, rays_d, cond_windows[jnp.asarray(idxs)],
                eye_areas[jnp.asarray(idxs)][:, None, :],
                self.occupancy, bg_color, bg_coords,
                lm68s[jnp.asarray(idxs)][:, None],
            )
            imgs = np.asarray(imgs)
            if head_crop is not None:
                crop_misses += int(np.sum(~np.asarray(fits)[:n_real]))
            for j in range(n_real):
                frame = imgs[j]
                if debug:
                    # side panels: driving SECC + lm68 overlay (the
                    # reference's debug layout, genefacepp_infer.py:313-331,
                    # 489-495)
                    from genefaceplusplus_tpu.data.visualization import (
                        draw_landmarks, side_by_side,
                    )

                    base = (frame if frame.dtype == np.uint8
                            else (np.clip(frame, 0, 1) * 255).astype(np.uint8))
                    secc = self._secc_debug_frame(batch, idxs[j], base.shape[0])
                    panel = draw_landmarks(
                        np.zeros_like(base), batch["lm68"][idxs[j]],
                        color=(64, 255, 64), radius=max(1, base.shape[0] // 128),
                    )
                    frame = side_by_side(base, secc, panel).astype(np.float32) / 255.0
                writer.append(frame)
        writer.close()
        if crop_misses:
            print(f"| WARNING: head exceeded the auto head-crop window on "
                  f"{crop_misses}/{T} frames (driving poses outside the "
                  f"dataset envelope) — frames were truncated; rerun with "
                  f"head_crop='off' for these poses")

        wav_path = os.path.splitext(inp["out_name"])[0] + "_audio.wav"
        audio_lib.save_wav_16k(batch["wav16k"], wav_path)
        out = mux_audio(tmp_video, wav_path, inp["out_name"], remove_wav=True)
        return out

    # ------------------------------------------------------------------
    def infer_once(self, inp: Dict[str, Any]) -> str:
        inp = default_inp(**inp)
        batch = self.prepare_batch_from_inp(inp)
        batch = self.forward_audio2secc(batch, inp)
        return self.forward_secc2video(batch, inp)
