"""Head+SR training task: full-frame renders with staged SR/perceptual losses.

Parity: RADNeRFTask (SR variant), /root/reference/tasks/radnerfs/radnerf_sr.py:87-312 —
full-image steps (n_rays == H*W), losses mse + weights-entropy + adaptive
masked ambient + sr_mse (from sr_start_iters) + perceptual on raw/SR/lip
crops (from lpips_start_iters, 0.5x weights for the SR terms), and the
lambda_ambient log10 feedback controller.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.renderer import render_rays
from genefaceplusplus_tpu.models.superresolution import Superresolution
from genefaceplusplus_tpu.training import losses as L
from genefaceplusplus_tpu.training.perceptual import perceptual_from_task_config
from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig
from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
from genefaceplusplus_tpu.utils.rays import pixel_rays, pixel_rays_jit


@flax.struct.dataclass
class SRTrainState:
    params: dict  # {'head': ..., 'sr': ...}
    opt_state: dict
    global_step: jnp.ndarray
    lambda_ambient: jnp.ndarray
    rng: jax.Array


@dataclasses.dataclass
class SRTaskConfig(HeadTaskConfig):
    sr_start_iters: int = 0
    lpips_start_iters: int = 200_000
    lambda_lpips: float = 0.001
    # optional dual-discriminator feature matching (radnerf_sr.py:235-244):
    # a FROZEN pretrained discriminator scores {SR image, raw image | camera};
    # the generator matches its per-scale features on gt vs pred. Default off
    # like every shipped reference config.
    lambda_dual_fm: float = 0.0
    disc_model_dir: str = ""  # checkpoint dir for the frozen discriminator
    # "eg3d" = the faithful EG3D dual disc (models/eg3d_discriminator.py,
    # convertible from eg3d_baseline_run2); "compact" = the small random-init
    # stack (tests / tiny resolutions). The reference mechanism is "eg3d".
    disc_arch: str = "eg3d"
    # SR block compute dtype; the reference trains these blocks at fp16
    # (radnerf_sr.py:19, conv_clamp=256) — bf16 is the TPU equivalent.
    # Params stay f32 either way.
    sr_dtype: str = "bfloat16"


class SRHeadNeRFTask(HeadNeRFTask):
    """Full-frame head + 2x SR training."""

    def __init__(self, dataset: RADNeRFDataset, model_cfg: RADNeRFConfig,
                 task_cfg: SRTaskConfig = SRTaskConfig(), hp: TaskHParams = TaskHParams(),
                 seed: int = 9999):
        super().__init__(dataset, model_cfg, task_cfg, hp, seed)
        self.sr_model = Superresolution(
            channels=3, input_resolution=dataset.H,
            dtype=jnp.bfloat16 if task_cfg.sr_dtype == "bfloat16" else jnp.float32)
        self.perceptual = perceptual_from_task_config(task_cfg)

        # frozen dual discriminator for feature matching (optional,
        # radnerf_sr.py:112-123: loaded pretrained with strict=True and
        # never optimised by this task)
        self.disc_model = None
        self.disc_params = None
        if task_cfg.lambda_dual_fm > 0:
            from genefaceplusplus_tpu.utils.ckpt import get_last_checkpoint, restore_into

            H2, W2 = 2 * dataset.H, 2 * dataset.W
            if task_cfg.disc_arch == "eg3d":
                # the reference mechanism: faithful StyleGAN2 resnet-D with
                # camera conditioning (radnerf_sr.py:112-123 loads
                # eg3d_baseline_run2 strict=True)
                from genefaceplusplus_tpu.models.eg3d_discriminator import (
                    EG3DDualDiscriminator,
                )

                # mapping depth from the converted ckpt dir's config.yaml
                # (written by scripts/convert_ckpt.py --type disc); default
                # matches the reference's MappingNetwork num_layers=8
                n_map = 8
                if task_cfg.disc_model_dir:
                    try:
                        from genefaceplusplus_tpu.config import set_hparams

                        dcfg = set_hparams(work_dir=task_cfg.disc_model_dir)
                        n_map = int(dcfg.get("disc_mapping_layers", 8))
                    except (OSError, ValueError):
                        pass
                self.disc_model = EG3DDualDiscriminator(
                    img_resolution=H2, mapping_layers=n_map)
            else:
                from genefaceplusplus_tpu.models.dual_discriminator import (
                    DualDiscriminator,
                )

                n_down = max(2, min(5, int(np.log2(dataset.H)) - 2))
                self.disc_model = DualDiscriminator(n_down=n_down)
            self.disc_params = self.disc_model.init(
                jax.random.PRNGKey(seed + 7), jnp.zeros((1, H2, W2, 3)),
                jnp.zeros((1, dataset.H, dataset.W, 3)), jnp.zeros((1, 25)),
            )
            if task_cfg.disc_model_dir:
                # strict like the reference: a configured-but-absent
                # pretrained disc must fail, not silently FM on random init
                ckpt, _ = get_last_checkpoint(task_cfg.disc_model_dir)
                if ckpt is None:
                    raise FileNotFoundError(
                        f"disc_model_dir={task_cfg.disc_model_dir!r} has no "
                        "checkpoint (convert one with scripts/convert_ckpt.py "
                        "--type disc)")
                state = ckpt.get("state_dict", ckpt)
                state = state.get("disc", state)
                self.disc_params = restore_into(self.disc_params, state,
                                                strict=True)

        self._train_step = jax.jit(self._make_sr_step(), static_argnames=("use_lpips", "use_sr"))

    def create_state(self) -> SRTrainState:
        cfg = self.cfg
        cond = jnp.zeros((cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
        head_params = self.model.init(
            jax.random.PRNGKey(self.seed), jnp.zeros((8, 3)), jnp.ones((8, 3)), cond
        )
        sr_params = self.sr_model.init(
            jax.random.PRNGKey(self.seed + 1), jnp.zeros((1, self.dataset.H, self.dataset.W, 3))
        )
        params = {"head": head_params, "sr": sr_params}
        return SRTrainState(
            params=params,
            opt_state=self.tx.init(params),
            global_step=jnp.asarray(0, jnp.int32),
            lambda_ambient=jnp.asarray(self.hp.lambda_ambient, jnp.float32),
            rng=jax.random.PRNGKey(self.seed),
        )

    # ------------------------------------------------------------------
    def _device_frames(self) -> Dict:
        """Device-resident per-frame training store, built once.

        With one host core and a network device tunnel, per-step host
        assembly (image decode + ~5 MB of transfers + eager ops) dominates
        the 0.18 s device step. Keeping every frame's gt/gt2x/bg/mask as
        uint8 device arrays (~560 MB HBM at 450x512²) turns sampling into
        an on-device gather inside the jitted step — the only per-step
        transfer left is the frame index. uint8 storage matches the
        dataset's LRU cache quantisation, so losses are bit-identical."""
        if getattr(self, "_dev_frames", None) is not None:
            return self._dev_frames
        import cv2

        from genefaceplusplus_tpu.training import frame_store

        u8 = frame_store.quantize_u8
        ds = self.dataset
        T, H, W = len(ds), ds.H, ds.W
        win = min(self.task_cfg.lip_window, H, W)
        sc = H / int(ds.ds["H"])

        gt2_l, bg_l, mask_l, lip_l = [], [], [], []
        for i in range(T):
            gt = ds.load_image(i, "gt")
            gt = ds.bg_img if gt is None else gt
            g2 = ds.load_image(i, "gt", full_res=True)
            if g2 is None or g2.shape[0] != 2 * H:
                g2 = cv2.resize(np.asarray(gt), (2 * W, 2 * H))
            bg = ds.frame_bg_torso(i)
            bg = ds.bg_img if bg is None else bg
            gt2_l.append(u8(g2))
            bg_l.append(u8(bg))
            mask_l.append(self._face_mask(i))
            rect = ds.samples[i].get("lip_rect", [0, H, 0, W])
            cy = int((rect[0] + rect[1]) / 2 * sc)
            cx = int((rect[2] + rect[3]) / 2 * sc)
            lip_l.append([int(np.clip(cy - win // 2, 0, H - win)),
                          int(np.clip(cx - win // 2, 0, W - win))])
        if self.disc_model is not None:
            from genefaceplusplus_tpu.data.eg3d_convention import (
                eg3d_camera_from_euler_trans,
            )

            cams = eg3d_camera_from_euler_trans(
                np.asarray(ds.ds["euler"])[:T], np.asarray(ds.ds["trans"])[:T]
            ).astype(np.float32)
        else:
            cams = np.zeros((T, 25), np.float32)
        self._dev_frames = {
            **frame_store.base_device_frames(ds),
            "gt2x": jnp.asarray(np.stack(gt2_l)),
            "bg": jnp.asarray(np.stack(bg_l)),
            "mask": jnp.asarray(np.stack(mask_l)),
            "lip_xy0": jnp.asarray(np.asarray(lip_l, np.int32)),
            "camera": jnp.asarray(cams),
        }
        return self._dev_frames

    def _make_gather(self):
        """On-device batch assembly from the frame store (inside jit)."""
        from genefaceplusplus_tpu.training import frame_store

        ds = self.dataset
        H, W = ds.H, ds.W
        T_all = len(ds.conds_all)
        intr = tuple(float(x) for x in np.asarray(ds.intrinsics).reshape(-1))
        smo = ds.smo_win_size

        def gather(frames, idx):
            rays_o, rays_d = frame_store.device_frame_rays(frames, idx, intr, H, W)
            return {
                "rays_o": rays_o,
                "rays_d": rays_d,
                # cond window over the FULL timeline (frame_cond_window parity)
                "cond": frame_store.device_cond_window(frames, idx, smo, T_all),
                "gt_rgb": frames["gt"][idx].astype(jnp.float32).reshape(-1, 3) / 255.0,
                "gt_rgb_2x": frames["gt2x"][idx].astype(jnp.float32).reshape(-1, 3) / 255.0,
                "bg_color": frames["bg"][idx].astype(jnp.float32).reshape(-1, 3) / 255.0,
                "face_mask": frames["mask"][idx].reshape(-1),
                "idx": idx,
                "eye_area_percent": frames["eye"][idx][None],
                "lip_xy0": frames["lip_xy0"][idx],
                "camera": frames["camera"][idx][None],
            }

        return gather

    def _make_sr_step(self, opts=None):
        model, sr_model, cfg, hp, opts, tx = (
            self.model, self.sr_model, self.cfg, self.hp,
            opts if opts is not None else self.opts, self.tx,
        )
        H, W = self.dataset.H, self.dataset.W
        tcfg: SRTaskConfig = self.task_cfg
        perceptual = self.perceptual
        disc_model, disc_params = self.disc_model, self.disc_params
        gather = self._make_gather()

        def loss_fn(params, batch, occupancy, lambda_ambient, global_step, noise, use_sr, use_lpips):
            head_params = params["head"]
            cond_feat = model.apply(head_params, batch["cond"], batch.get("eye_area_percent"),
                                    method=RADNeRF.cal_cond_feat)
            ind = model.apply(head_params, batch["idx"], method=RADNeRF.get_individual_code)

            def field_fn(xyz, dirs):
                return model.apply(head_params, xyz, dirs, cond_feat, ind, method=RADNeRF.field)

            out = render_rays(field_fn, batch["rays_o"], batch["rays_d"], occupancy,
                              bound=cfg.bound, min_near=cfg.min_near,
                              bg_color=batch["bg_color"], opts=opts, noise=noise)
            raw = out.rgb_map.reshape(1, H, W, 3)
            mse = L.mse_loss(out.rgb_map, batch["gt_rgb"])
            went = L.weights_entropy_loss(out.weights_sum)
            amb = L.ambient_loss(out.ambient_sum, batch["face_mask"], hp.ambient_loss_mode)
            amb = jnp.where(jnp.isnan(amb), 0.0, amb)
            total = mse + hp.lambda_weights_entropy * went + lambda_ambient * amb
            metrics = {"mse_loss": mse, "weights_entropy_loss": went, "ambient_loss": amb,
                       "head_psnr": L.mse2psnr(mse)}

            if use_sr:
                sr = jnp.clip(sr_model.apply(params["sr"], raw), 0.0, 1.0)
                gt512 = batch["gt_rgb_2x"].reshape(1, 2 * H, 2 * W, 3)
                sr_mse = L.mse_loss(sr, gt512)
                total = total + sr_mse
                metrics["sr_mse_loss"] = sr_mse
                if use_lpips:
                    gt_raw = batch["gt_rgb"].reshape(1, H, W, 3)
                    lp = perceptual(raw, gt_raw)
                    lp_sr = perceptual(sr, gt512)
                    total = total + tcfg.lambda_lpips * lp + 0.5 * tcfg.lambda_lpips * lp_sr
                    metrics["lpips_loss"] = lp
                    metrics["sr_lpips_loss"] = lp_sr
                    # lip-crop perceptual on the SR image (radnerf_sr.py:231-233;
                    # static window, x2 coords at SR resolution)
                    win = min(tcfg.lip_window, H, W)
                    y0, x0 = batch["lip_xy0"][0], batch["lip_xy0"][1]
                    crop = lambda img, s: jax.lax.dynamic_slice(
                        img, (0, s * y0, s * x0, 0),
                        (1, s * win, s * win, 3))
                    lp_lip = perceptual(crop(sr, 2), crop(gt512, 2))
                    total = total + 0.5 * tcfg.lambda_lpips * lp_lip
                    metrics["sr_lip_lpips_loss"] = lp_lip
                    if disc_model is not None:
                        # frozen-disc feature matching, gated like the
                        # reference on lpips_start_iters (radnerf_sr.py:235)
                        from genefaceplusplus_tpu.models.dual_discriminator import (
                            feature_matching_loss,
                        )

                        cam = batch["camera"]
                        _, fake_feats = disc_model.apply(disc_params, sr, raw, cam)
                        _, real_feats = disc_model.apply(disc_params, gt512, gt_raw, cam)
                        real_feats = [jax.lax.stop_gradient(f) for f in real_feats]
                        fm = feature_matching_loss(fake_feats, real_feats)
                        total = total + tcfg.lambda_dual_fm * fm
                        metrics["dual_feature_matching_loss"] = fm
            metrics["total_loss"] = total
            return total, metrics

        def step(state: SRTrainState, frames, idx, occupancy, use_sr: bool, use_lpips: bool):
            batch = gather(frames, idx)
            rng, sub = jax.random.split(state.rng)
            noise = jax.random.uniform(sub, batch["rays_o"].shape[:1]) if opts.perturb else None
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, occupancy, state.lambda_ambient, state.global_step,
                noise, use_sr, use_lpips,
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_lambda = L.adaptive_lambda_ambient(
                state.lambda_ambient, metrics["ambient_loss"],
                hp.target_ambient_loss, hp.lr_lambda_ambient,
            )
            metrics["lambda_ambient"] = new_lambda
            from genefaceplusplus_tpu.training.schedulers import grad_norms_by_group

            metrics.update(grad_norms_by_group(grads))
            return SRTrainState(new_params, new_opt, state.global_step + 1, new_lambda, rng), metrics

        return step

    def sample_train_batch(self, global_step=None) -> Dict:
        """Full-frame sampling = just a frame index; the batch (rays, gt,
        gt2x, bg, mask, cond window, camera) is gathered ON DEVICE inside
        the jitted step from the resident frame store (_device_frames)."""
        if global_step is not None:
            self._host_step = int(global_step)
        self._device_frames()  # built once, before the first step
        return {"frame_idx": int(self.np_rng.randint(len(self.dataset)))}

    def _build_compact_step(self, budget: float):
        """SR-step graph with a compacted head-field budget (the SR batch is
        a full frame, so the live fraction is the head's screen coverage)."""
        opts_c = dataclasses.replace(self.opts, compact_frac=budget)
        return jax.jit(self._make_sr_step(opts=opts_c),
                       static_argnames=("use_lpips", "use_sr"))

    def train_step(self, state, batch):
        if self._host_step is None:  # one-time device sync (test/resume path)
            self._host_step = int(state.global_step)
        step = self._host_step
        cs = self.task_cfg.train_compact_start
        if cs > 0 and self._compact_step is None and step >= cs:
            self._enable_train_compaction()
        step_fn = self._compact_step if self._compact_step is not None \
            else self._train_step
        use_sr = step >= self.task_cfg.sr_start_iters
        use_lpips = step >= self.task_cfg.lpips_start_iters
        state, metrics = step_fn(
            state, self._device_frames(),
            jnp.asarray(batch["frame_idx"], jnp.int32), self.occupancy,
            use_sr=use_sr, use_lpips=use_lpips)
        metrics.update(self._compact_telemetry)
        self._host_step = step + 1
        return state, metrics

    def validate(self, state, max_frames: int = 2, save_dir: str = ""):
        """Head validate (raw-res val_psnr) + SR validate: render raw val
        frames, super-resolve, PSNR against the FULL-resolution gt — the
        512² number the reference's deliverable is judged on."""
        class _Shim:
            params = state.params["head"]
            global_step = state.global_step

        metrics = super().validate(_Shim, max_frames=max_frames, save_dir=save_dir)
        ds = self.val_dataset if self.val_dataset is not None else self.dataset
        H, W = ds.H, ds.W
        sr_psnrs = []
        if not hasattr(self, "_jit_val_sr"):
            model, sr_model, cfg = self.model, self.sr_model, self.cfg
            opts = dataclasses.replace(self.opts, perturb=False)

            def val_fn(params, rays_o, rays_d, cond, eye, ind_idx, occupancy, bg_color):
                cond_feat = model.apply(params["head"], cond, eye,
                                        method=RADNeRF.cal_cond_feat)
                ind = model.apply(params["head"], ind_idx,
                                  method=RADNeRF.get_individual_code)

                def field_fn(xyz, dirs):
                    return model.apply(params["head"], xyz, dirs, cond_feat, ind,
                                       method=RADNeRF.field)

                out = render_rays(field_fn, rays_o, rays_d, occupancy,
                                  bound=cfg.bound, min_near=cfg.min_near,
                                  bg_color=bg_color, opts=opts)
                raw = out.rgb_map.reshape(1, H, W, 3)
                return jnp.clip(sr_model.apply(params["sr"], raw), 0.0, 1.0)[0]

            self._jit_val_sr = jax.jit(val_fn)
        for i in range(min(max_frames, len(ds))):
            gt2x = ds.load_image(i, "gt", full_res=True)
            if gt2x is None or gt2x.shape[0] != 2 * H:
                continue
            pose = jnp.asarray(ds.frame_pose(i)[None])
            rays_o, rays_d, _ = pixel_rays_jit(pose, ds.intrinsics, H, W)
            gid = max(0, min(int(ds.frame_ids[i]),
                             self.cfg.individual_embedding_num - 1))
            # per-frame torso-composited background = training convention
            # (head_task.validate note); plain bg would charge the torso
            # region against the head+SR stack
            bg = ds.frame_bg_torso(i)
            bg = ds.bg_img if bg is None else bg
            sr = self._jit_val_sr(
                state.params, rays_o[0], rays_d[0],
                jnp.asarray(ds.frame_cond_window(i)),
                jnp.asarray(ds.eye_area_percents[i : i + 1]),
                jnp.asarray(gid, jnp.int32),
                self.occupancy, jnp.asarray(np.asarray(bg, np.float32).reshape(-1, 3)),
            )
            mse = float(np.mean((np.asarray(sr) - gt2x) ** 2))
            sr_psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
            if save_dir:
                import os

                import cv2

                vdir = os.path.join(save_dir, "validation_results")
                os.makedirs(vdir, exist_ok=True)
                cv2.imwrite(
                    os.path.join(vdir, f"val_sr_{int(state.global_step)}_{i}.png"),
                    cv2.cvtColor((np.asarray(sr) * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        if sr_psnrs:
            metrics["val_sr_psnr"] = float(np.mean(sr_psnrs))
        return metrics

    def update_extra_state(self, state):
        # delegate with the head sub-tree; the parent also reads global_step
        # (lip-finetune gating, head_task.py:237-238)
        class _Shim:
            params = state.params["head"]
            global_step = state.global_step

        super().update_extra_state(_Shim)
