"""Torso training task: frozen head + differentiable torso field.

Parity: RADNeRFTorsoTask, /root/reference/tasks/radnerfs/radnerf_torso_sr.py:61-235 —
loads the trained head checkpoint and freezes it (:65-88; here the head is
simply not part of the optimised pytree and its outputs pass through
stop_gradient), torso losses mse + alpha entropy + L1 deform regularisation
(:139-222), torso 2D alpha-grid refresh (radnerf_torso_sr.py:246-288).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
from genefaceplusplus_tpu.models.full_renderer import render_full_frame
from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.radnerf_torso import TorsoConfig, TorsoField
from genefaceplusplus_tpu.models.renderer import RenderOptions
from genefaceplusplus_tpu.training import losses as L
from genefaceplusplus_tpu.training.grid_updater import update_torso_grid
from genefaceplusplus_tpu.training.schedulers import make_radnerf_optimizer
from genefaceplusplus_tpu.utils.ckpt import get_last_checkpoint, restore_into
from genefaceplusplus_tpu.utils.rays import get_bg_coords, pixel_rays_jit


@flax.struct.dataclass
class TorsoTrainState:
    torso_params: dict
    opt_state: dict
    global_step: jnp.ndarray
    rng: jax.Array


class TorsoNeRFTask:
    def __init__(self, dataset: RADNeRFDataset, head_cfg: RADNeRFConfig, cfg, seed: int = 9999):
        self.dataset = dataset
        self.head_cfg = head_cfg
        self.cfg = cfg
        self.head_model = RADNeRF(head_cfg)
        self.torso_cfg = TorsoConfig.from_hparams(cfg)
        self.torso_model = TorsoField(self.torso_cfg)
        self.tx = make_radnerf_optimizer(cfg.get("lr", 5e-4), cfg.get("warmup_updates", 0))
        self.opts = RenderOptions(
            max_steps=cfg.get("max_steps", 16), num_coarse=48, num_samples=16, perturb=False
        )
        self.np_rng = np.random.RandomState(seed)
        self.seed = seed
        self.lambda_we = cfg.get("lambda_weights_entropy", 1e-4)
        self.lambda_deform = cfg.get("lambda_torso_deform", 0.0)
        self.val_dataset: Optional[RADNeRFDataset] = None  # set by run.py

        # frozen head params + trained occupancy grid from the head ckpt
        # (the head must march with the same grid it was trained with —
        # radnerf_torso_sr.py:65-73 loads the whole head incl. buffers)
        H = head_cfg.grid_size
        self.occupancy = jnp.ones((H, H, H), dtype=bool)
        self.density_grid = jnp.zeros((H, H, H))
        self.head_params = self._load_head(cfg.get("head_model_dir", ""))
        self.torso_grid = jnp.zeros((H, H))
        self.mean_density_torso = 0.0
        self._grid_rng = jax.random.PRNGKey(seed + 2)
        self._train_step = jax.jit(self._make_step())
        self._jit_torso_refresh = None  # compiled lazily (params structure)

    def _load_head(self, head_dir: str):
        cond = jnp.zeros((self.head_cfg.smo_win_size, self.head_cfg.cond_win_size, self.head_cfg.cond_in_dim))
        template = self.head_model.init(
            jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.ones((8, 3)), cond
        )
        if head_dir:
            ckpt, _ = get_last_checkpoint(head_dir)
            if ckpt is not None:
                extra = ckpt.get("extra_state", {})
                if "occupancy" in extra:
                    self.occupancy = jnp.asarray(extra["occupancy"]).astype(bool)
                if "density_grid" in extra:
                    self.density_grid = jnp.asarray(extra["density_grid"])
                state = ckpt.get("state_dict", ckpt)
                state = state.get("params", state)
                # head_model_dir may hold an SR-stage checkpoint whose params
                # nest as {"head": ..., "sr": ...} (sr_task.py:128) — the
                # reference torso stage likewise loads the RADNeRFwithSR head
                # ckpt (radnerf_torso_sr.py:65-73); the torso only needs the
                # head subtree
                inner = state.get("params", state)
                if isinstance(inner, dict) and "head" in inner:
                    state = {"params": inner["head"]} if "params" in state else inner["head"]
                return restore_into(template, state)
        return template

    # ------------------------------------------------------------------
    def create_state(self) -> TorsoTrainState:
        ds = self.dataset
        bg_coords = jnp.asarray(get_bg_coords(ds.H, ds.W)[0][:8])
        lm68 = jnp.zeros((1, 68, 2))
        ind = jnp.zeros(self.torso_cfg.torso_individual_embedding_dim)
        torso_params = self.torso_model.init(
            jax.random.PRNGKey(self.seed), bg_coords, lm68, ind,
            jnp.zeros((8, 3)), jnp.zeros((8, 1)),
        )
        return TorsoTrainState(
            torso_params=torso_params,
            opt_state=self.tx.init(torso_params),
            global_step=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(self.seed),
        )

    def _make_step(self):
        head_model, torso_model = self.head_model, self.torso_model
        head_cfg, opts = self.head_cfg, self.opts
        lambda_we, lambda_deform = self.lambda_we, self.lambda_deform
        tx = self.tx

        ds_hw = (self.dataset.H, self.dataset.W)  # static

        def loss_fn(torso_params, head_params, batch, occupancy):
            out = render_full_frame(
                head_model, head_params,
                batch["rays_o"], batch["rays_d"], batch["cond"], occupancy,
                bg_color=batch["bg_color"], opts=opts, image_hw=ds_hw,
                eye_area_percent=batch["eye_area_percent"], index=batch["idx"],
                torso_model=torso_model, torso_params=torso_params,
                bg_coords=batch["bg_coords"], lm68=batch["lm68"],
                stop_head_gradient=True,
            )
            mse = L.mse_loss(out.rgb_map, batch["gt_rgb"])
            alpha = jnp.clip(out.torso_alpha[:, 0], 1e-5, 1 - 1e-5)
            went = jnp.mean(-alpha * jnp.log2(alpha) - (1 - alpha) * jnp.log2(1 - alpha))
            total = mse + lambda_we * went
            metrics = {"mse_loss": mse, "torso_entropy": went,
                       "head_psnr": L.mse2psnr(mse), "total_loss": total}
            if lambda_deform > 0:
                # L1 deformation regulariser (radnerf_torso_sr task,
                # lambda_torso_deform) on a coordinate subsample
                ind = torso_model.apply(torso_params, 0, method=TorsoField.get_individual_code)
                t_out = torso_model.apply(
                    torso_params, batch["bg_coords"][::16], batch["lm68"], ind, None, None
                )
                deform_reg = jnp.abs(t_out.deform).mean()
                total = total + lambda_deform * deform_reg
                metrics["deform_reg"] = deform_reg
                metrics["total_loss"] = total
            return total, metrics

        gather = self._make_gather()

        def step(state: TorsoTrainState, frames, idx, head_params, occupancy):
            batch = gather(frames, idx)
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.torso_params, head_params, batch, occupancy
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.torso_params)
            new_params = optax.apply_updates(state.torso_params, updates)
            from genefaceplusplus_tpu.training.schedulers import grad_norms_by_group

            metrics.update(grad_norms_by_group(grads))
            return (
                TorsoTrainState(new_params, new_opt, state.global_step + 1, state.rng),
                metrics,
            )

        return step

    # ------------------------------------------------------------------
    def _device_frames(self) -> Dict:
        """Device-resident per-frame store (same rationale as the head/SR
        tasks, docs/DESIGN.md round-3 log): train batches are gathered on
        device; the only per-step transfer is the frame index."""
        if getattr(self, "_dev_frames", None) is not None:
            return self._dev_frames
        from genefaceplusplus_tpu.training import frame_store

        ds = self.dataset
        H, W = ds.H, ds.W
        lm_l = [self._frame_lm68(i) for i in range(len(ds))]
        self._dev_frames = {
            **frame_store.base_device_frames(ds),
            "lm68": jnp.asarray(np.stack(lm_l).astype(np.float32)),
            "bg_color": jnp.asarray(np.asarray(ds.bg_img, np.float32).reshape(-1, 3)),
            "bg_coords": jnp.asarray(get_bg_coords(H, W)[0]),
        }
        return self._dev_frames

    def _make_gather(self):
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
                "cond": frame_store.device_cond_window(frames, idx, smo, T_all),
                "gt_rgb": frames["gt"][idx].astype(jnp.float32).reshape(-1, 3) / 255.0,
                "bg_color": frames["bg_color"],
                "bg_coords": frames["bg_coords"],
                "lm68": frames["lm68"][idx],
                "idx": idx,
                "eye_area_percent": frames["eye"][idx][None],
            }

        return gather

    def sample_train_batch(self) -> Dict:
        self._device_frames()  # built once, before the first step
        return {"frame_idx": int(self.np_rng.randint(len(self.dataset)))}

    def _frame_lm68(self, idx: int, ds: Optional[RADNeRFDataset] = None) -> np.ndarray:
        """Projected 2D lm68 for torso conditioning (the reference uses the
        jaw points of the projected lm68, radnerf_torso_sr.py:86-87); falls
        back to canonical xy when no 2D landmarks are stored."""
        ds = self.dataset if ds is None else ds
        lms = ds.samples[idx].get("lms")
        if lms is not None:
            return np.asarray(lms, np.float32)[None]
        return ds.ds["idexp_lm3d"][idx].reshape(68, 3)[:, :2][None]

    def sample_frame_batch(self, idx: int, ds: Optional[RADNeRFDataset] = None) -> Dict:
        ds = self.dataset if ds is None else ds
        H, W = ds.H, ds.W
        # torso training renders full (small) frames: rays over all pixels
        pose = jnp.asarray(ds.frame_pose(idx)[None])
        rays_o, rays_d, _ = pixel_rays_jit(pose, ds.intrinsics, H, W)
        gt = ds.load_image(idx, "gt")
        if gt is None:
            gt = ds.bg_img
        lm = self._frame_lm68(idx, ds)
        # individual code by GLOBAL frame id — the embedding table covers
        # the full timeline, so held-out frames keep their own code
        gid = min(int(ds.frame_ids[idx]),
                  self.torso_cfg.torso_individual_embedding_num - 1)
        return {
            "rays_o": rays_o[0],
            "rays_d": rays_d[0],
            "cond": jnp.asarray(ds.frame_cond_window(idx)),
            "gt_rgb": jnp.asarray(gt.reshape(-1, 3)),
            "bg_color": jnp.asarray(ds.bg_img.reshape(-1, 3)),
            "bg_coords": jnp.asarray(get_bg_coords(H, W)[0]),
            "lm68": jnp.asarray(lm, jnp.float32),
            "idx": max(gid, 0),
            "eye_area_percent": jnp.asarray(ds.eye_area_percents[idx : idx + 1]),
        }

    def train_step(self, state, batch):
        frames = self._device_frames()
        idx = jnp.asarray(batch["frame_idx"], jnp.int32)
        return self._train_step(state, frames, idx, self.head_params, self.occupancy)

    def update_extra_state(self, state):
        ds = self.dataset
        idx = int(self.np_rng.randint(len(ds)))
        lm = jnp.asarray(self._frame_lm68(idx), jnp.float32)

        if self._jit_torso_refresh is None:
            torso_model = self.torso_model

            def refresh(torso_params, lm, grid, rng):
                ind = torso_model.apply(torso_params, 0,
                                        method=TorsoField.get_individual_code)

                def alpha_fn(pts):
                    out = torso_model.apply(torso_params, pts, lm, ind, None, None)
                    return out.alpha[:, 0]

                return update_torso_grid(alpha_fn, grid, rng)

            self._jit_torso_refresh = jax.jit(refresh)

        self._grid_rng, sub = jax.random.split(self._grid_rng)
        self.torso_grid, mean_t = self._jit_torso_refresh(
            state.torso_params, lm, self.torso_grid, sub)
        self.mean_density_torso = float(mean_t)

    def validate(self, state, max_frames: int = 2, save_dir: str = "") -> Dict[str, float]:
        """Full-frame head+torso renders on dataset frames -> PSNR
        (matching the head task's validate; the reference logs torso PSNR
        through the same mse2psnr path, tasks/radnerfs/radnerf_torso_sr.py).

        The render is JITTED (one dispatch per frame): an eager
        render_full_frame is hundreds of separate dispatches through the
        axon tunnel — ~10 min per validation (docs/DESIGN.md tunnel rules).
        The occupancy-2D threshold enters as a traced scalar so the varying
        mean_density_torso never retriggers compilation."""
        ds = self.val_dataset if self.val_dataset is not None else self.dataset
        if getattr(self, "_jit_val", None) is None:
            head_model, torso_model, opts = self.head_model, self.torso_model, self.opts
            hw = (ds.H, ds.W)

            def val_fn(torso_params, head_params, occupancy, torso_grid, thr,
                       rays_o, rays_d, cond, bg_color, bg_coords, lm68, eye, idx):
                out = render_full_frame(
                    head_model, head_params, rays_o, rays_d, cond, occupancy,
                    bg_color=bg_color, opts=opts, image_hw=hw,
                    eye_area_percent=eye, index=idx,
                    torso_model=torso_model, torso_params=torso_params,
                    bg_coords=bg_coords, lm68=lm68,
                    occupancy_2d=torso_grid,
                    density_thresh_torso=thr, mean_density_torso=0.0,
                )
                return out.rgb_map

            self._jit_val = jax.jit(val_fn)
        thr = (min(self.torso_cfg.density_thresh_torso, self.mean_density_torso)
               if self.mean_density_torso > 0 else self.torso_cfg.density_thresh_torso)
        psnrs = []
        for i in range(min(max_frames, len(ds))):
            batch = self.sample_frame_batch(i, ds)
            rgb = self._jit_val(
                state.torso_params, self.head_params, self.occupancy,
                self.torso_grid, jnp.asarray(thr, jnp.float32),
                batch["rays_o"], batch["rays_d"], batch["cond"],
                batch["bg_color"], batch["bg_coords"], batch["lm68"],
                batch["eye_area_percent"], jnp.asarray(batch["idx"], jnp.int32),
            )
            gt = ds.load_image(i, "gt")
            if gt is None:
                continue
            mse = float(jnp.mean((rgb - gt.reshape(-1, 3)) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        return {"val_psnr": float(np.mean(psnrs))} if psnrs else {}

    def extra_state_dict(self):
        return {
            "torso_grid": self.torso_grid,
            "occupancy": self.occupancy,
            "density_grid": self.density_grid,
        }

    def load_extra_state(self, d):
        if "torso_grid" in d:
            self.torso_grid = jnp.asarray(d["torso_grid"])
        if "occupancy" in d:
            self.occupancy = jnp.asarray(d["occupancy"]).astype(bool)
        if "density_grid" in d:
            self.density_grid = jnp.asarray(d["density_grid"])
