"""Head-NeRF training task: dataset sampling + jitted step + grid refresh.

Parity: RADNeRFTask, /root/reference/tasks/radnerfs/radnerf.py:25-232 —
random-frame random-ray batches (n_rays, dataset_utils.py:356-373), losses
mse + weights-entropy + masked-ambient (+ adaptive lambda via the SR task's
controller), density-grid refresh every update_extra_interval steps with a
random condition, camera-frustum culling at startup, full-image validation
with PSNR.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.renderer import RenderOptions, render_rays
from genefaceplusplus_tpu.training.grid_updater import mark_untrained_grid, update_density_grid
from genefaceplusplus_tpu.training.radnerf_task import TaskHParams, TrainState, make_train_step
from genefaceplusplus_tpu.training.schedulers import make_radnerf_optimizer


@dataclasses.dataclass
class HeadTaskConfig:
    n_rays: int = 65536
    update_extra_interval: int = 16
    lr: float = 5e-4
    warmup_updates: int = 0
    max_steps: int = 16
    num_coarse: int = 48
    num_samples: int = 16
    grid_decay: float = 0.95
    # lip finetuning (reference finetune_lips, radnerf.py:123-160): from
    # finetune_lips_start_iter, alternate iterations sample a static lip
    # window and add a perceptual loss on it
    finetune_lips: bool = True
    finetune_lips_start_iter: int = 200_000
    lip_window: int = 64  # static window side (reference uses the dynamic
    # lip_rect; a fixed window centred on it keeps shapes static under jit)
    lambda_lpips: float = 0.01
    # perceptual backend (reference vgg19+vggface LPIPS, losses.py:128-186):
    # "small" = random-weight surrogate; "vgg19" = the real tower. Setting a
    # weights path implies vgg19 and a missing file FAILS instead of
    # silently training on the surrogate (perceptual_from_task_config).
    perceptual_arch: str = "small"
    vgg_weights_path: str = ""  # msgpack from scripts/convert_vgg.py
    vggface_weights_path: str = ""  # msgpack from scripts/convert_vgg.py --face
    # run the field as the fused Pallas kernel (fwd + custom-VJP bwd);
    # production flagship dims only (fused_field.py asserts them)
    use_fused_field: bool = False
    fused_tile: int = 1024
    # train-side live-sample compaction (ROADMAP 6b): from this step on,
    # the train step evaluates the field on only a static budget of live
    # (marcher-mask) sample slots instead of all R*S (renderer.py
    # compact_frac). 0 = off. The budget is MEASURED at the switch step —
    # max live fraction over probe batches × train_compact_margin — so the
    # early dense-grid phase trains full-slot and the compacted graph is
    # compiled exactly once. EXACT (same gradients) while the per-step
    # live count fits the budget; the occupancy grid only shrinks under
    # EMA decay after stabilisation, and overflow is surfaced via the
    # compact/probe_live_frac telemetry at every grid refresh.
    train_compact_start: int = 0
    train_compact_margin: float = 1.35

    @classmethod
    def from_hparams(cls, hp) -> "HeadTaskConfig":
        get = hp.get
        return cls(
            n_rays=get("n_rays", 65536),
            update_extra_interval=get("update_extra_interval", 16),
            lr=get("lr", 5e-4),
            warmup_updates=get("warmup_updates", 0),
            max_steps=get("max_steps", 16),
            finetune_lips=get("finetune_lips", True),
            finetune_lips_start_iter=get("finetune_lips_start_iter", 200_000),
            lambda_lpips=get("lambda_lpips_loss", 0.01),
            perceptual_arch=get("perceptual_arch", "small"),
            vgg_weights_path=get("vgg_weights_path", ""),
            vggface_weights_path=get("vggface_weights_path", ""),
            train_compact_start=get("train_compact_start", 0),
            train_compact_margin=get("train_compact_margin", 1.35),
        )


class HeadNeRFTask:
    def __init__(
        self,
        dataset: RADNeRFDataset,
        model_cfg: RADNeRFConfig,
        task_cfg: HeadTaskConfig = HeadTaskConfig(),
        hp: TaskHParams = TaskHParams(),
        seed: int = 9999,
    ):
        self.dataset = dataset
        # optional held-out split: validate() prefers it over the training
        # set (the reference's 1/11 val split, binarizer_nerf.py:279-282)
        self.val_dataset = None
        self.cfg = model_cfg
        self.task_cfg = task_cfg
        self.hp = hp
        self.model = RADNeRF(model_cfg)
        self.tx = make_radnerf_optimizer(task_cfg.lr, task_cfg.warmup_updates)
        self.opts = RenderOptions(
            max_steps=task_cfg.max_steps,
            num_coarse=task_cfg.num_coarse,
            num_samples=task_cfg.num_samples,
            perturb=True,
        )
        base_step = make_train_step(
            self.model, self.tx, self.opts, hp,
            use_fused_field=task_cfg.use_fused_field,
            fused_tile=task_cfg.fused_tile,
        )
        gather = self._make_ray_gather()

        def fused_step(state, frames, idx, inds, occupancy):
            return base_step(state, gather(frames, idx, inds), occupancy)

        self._train_step = jax.jit(fused_step)
        self._lip_step = None  # compiled lazily on first lip-finetune batch
        self._finetune_lip_flag = False
        # train-side compaction (task_cfg.train_compact_start): built once
        # when the switch step is reached, with a measured live budget
        self._compact_step = None
        self._compact_telemetry: Dict[str, float] = {}
        self._jit_live_frac = None
        # host-side mirror of state.global_step: per-step guards (staged
        # losses, compaction switch) must not read the DEVICE counter —
        # int(state.global_step) blocks on the previous step and destroys
        # host run-ahead (measured 7.4 -> 2.5 steps/s through the tunnel).
        # Synced from the trainer via sample_train_batch(global_step=...),
        # or once from the device on the first step (test/resume paths).
        self._host_step = None
        self.np_rng = np.random.RandomState(seed)
        self.seed = seed

        H = model_cfg.grid_size
        self.density_grid = mark_untrained_grid(
            jnp.zeros((H, H, H)), dataset.poses, dataset.intrinsics, model_cfg.bound
        )
        self.occupancy = jnp.ones((H, H, H), dtype=bool)
        self.mean_density = 0.0
        self._grid_rng = jax.random.PRNGKey(seed + 1)
        self._jit_grid_refresh = None  # compiled lazily (params structure)

        self.grid_telemetry: Dict[str, float] = {}
        # precompute per-frame face masks lazily
        self._face_masks: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------
    def create_state(self) -> TrainState:
        from genefaceplusplus_tpu.training.radnerf_task import create_train_state

        return create_train_state(self.model, self.tx, jax.random.PRNGKey(self.seed), self.hp)

    def _face_mask(self, idx: int) -> np.ndarray:
        if idx not in self._face_masks:
            ds = self.dataset
            lms = ds.samples[idx].get("lms")
            if lms is not None:
                # lm68 convex-hull polygon mask (dataset_utils.py:77-91)
                from genefaceplusplus_tpu.data.dataset import get_boundary_mask

                mask = get_boundary_mask(np.asarray(lms, np.float32), ds.H, ds.W)
            else:
                # fall back to the face rect when no 2D landmarks are stored
                rect = ds.samples[idx].get("face_rect")
                mask = np.zeros((ds.H, ds.W), bool)
                if rect is not None:
                    sc = ds.H / int(ds.ds["H"])
                    x0, x1, y0, y1 = (int(v * sc) for v in rect)
                    mask[x0:x1, y0:y1] = True
            self._face_masks[idx] = mask
        return self._face_masks[idx]

    def _lip_window_indices(self, idx: int) -> np.ndarray:
        """Static-size pixel window centred on the frame's lip rect."""
        ds = self.dataset
        win = min(self.task_cfg.lip_window, ds.H, ds.W)
        rect = ds.samples[idx].get("lip_rect", [0, ds.H, 0, ds.W])
        sc = ds.H / int(ds.ds["H"])
        cy = int((rect[0] + rect[1]) / 2 * sc)
        cx = int((rect[2] + rect[3]) / 2 * sc)
        y0 = int(np.clip(cy - win // 2, 0, ds.H - win))
        x0 = int(np.clip(cx - win // 2, 0, ds.W - win))
        rows = np.arange(y0, y0 + win)
        cols = np.arange(x0, x0 + win)
        return (rows[:, None] * ds.W + cols[None, :]).reshape(-1)

    def _device_frames(self) -> Dict:
        """Device-resident per-frame store (gt/bg/mask/pose/cond): batch
        assembly happens on device inside the jitted step — with one host
        core and a network device tunnel, per-step host gathers + ~2 MB
        transfers otherwise dominate the step (docs/DESIGN.md round-3 log).
        uint8 storage matches the dataset LRU quantisation bit-for-bit."""
        if getattr(self, "_dev_frames", None) is not None:
            return self._dev_frames
        from genefaceplusplus_tpu.training import frame_store

        ds = self.dataset
        bg_l, mask_l = [], []
        for i in range(len(ds)):
            bg = ds.frame_bg_torso(i)
            bg_l.append(frame_store.quantize_u8(ds.bg_img if bg is None else bg))
            mask_l.append(self._face_mask(i))
        self._dev_frames = {
            **frame_store.base_device_frames(ds),
            "bg": jnp.asarray(np.stack(bg_l)),
            "mask": jnp.asarray(np.stack(mask_l)),
        }
        return self._dev_frames

    def _make_ray_gather(self):
        """On-device batch assembly for sampled ray indices (inside jit)."""
        from genefaceplusplus_tpu.training import frame_store

        ds = self.dataset
        H, W = ds.H, ds.W
        T_all = len(ds.conds_all)
        intr = tuple(float(x) for x in np.asarray(ds.intrinsics).reshape(-1))
        smo = ds.smo_win_size

        def gather(frames, idx, inds):
            rays_o, rays_d = frame_store.device_frame_rays(
                frames, idx, intr, H, W, inds)
            return {
                "rays_o": rays_o,
                "rays_d": rays_d,
                "cond": frame_store.device_cond_window(frames, idx, smo, T_all),
                "gt_rgb": frames["gt"][idx].reshape(-1, 3)[inds].astype(jnp.float32) / 255.0,
                "bg_color": frames["bg"][idx].reshape(-1, 3)[inds].astype(jnp.float32) / 255.0,
                "face_mask": frames["mask"][idx].reshape(-1)[inds],
                "idx": idx,
                "eye_area_percent": frames["eye"][idx][None],
            }

        return gather

    def sample_train_batch(self, global_step=None) -> Dict[str, jnp.ndarray]:
        """Sampling = frame index + ray indices; everything else is gathered
        ON DEVICE inside the jitted step from the resident frame store."""
        if global_step is not None:
            self._host_step = int(global_step)
        gs = self._host_step or 0
        self._device_frames()  # built once, before the first step
        ds = self.dataset
        idx = int(self.np_rng.randint(len(ds)))
        H, W = ds.H, ds.W
        lip_active = (
            self.task_cfg.finetune_lips
            and gs > self.task_cfg.finetune_lips_start_iter
        )
        if lip_active:
            # alternate lip-window and full-image iterations (radnerf.py:158-160)
            self._finetune_lip_flag = not self._finetune_lip_flag
        if lip_active and self._finetune_lip_flag:
            inds = self._lip_window_indices(idx)
        else:
            inds = self.np_rng.randint(0, H * W, size=self.task_cfg.n_rays)
        return {
            "frame_idx": idx,
            "inds": inds.astype(np.int32),
            "_is_lip": bool(lip_active and self._finetune_lip_flag),
        }

    # ------------------------------------------------------------------
    def _live_frac_probe(self, n_probes: int = 8) -> float:
        """Max marcher live-sample fraction over sampled train batches.

        Runs ONLY the marching stage (no field eval) on n_probes random
        ray batches under the current occupancy — the quantity the
        compact_frac budget must cover (renderer.py:146-161)."""
        from genefaceplusplus_tpu.models.renderer import make_aabb
        from genefaceplusplus_tpu.ops import raymarch
        from genefaceplusplus_tpu.utils.rays import pixel_rays

        ds, cfg, opts = self.dataset, self.cfg, self.opts
        if self._jit_live_frac is None:
            intr = tuple(float(x) for x in np.asarray(ds.intrinsics).reshape(-1))
            H, W = ds.H, ds.W

            use_noise = bool(opts.perturb)

            def live_frac(pose, inds, occupancy, noise):
                rays_o, rays_d, _ = pixel_rays(pose[None], intr, H, W, inds[None])
                rays_o, rays_d = rays_o[0], rays_d[0]
                aabb = make_aabb(cfg.bound)
                nears, fars = raymarch.near_far_from_aabb(
                    rays_o, rays_d, aabb, cfg.min_near)
                occ_box = raymarch.occupancy_aabb(occupancy, cfg.bound)
                m = raymarch.march_rays_interval(
                    rays_o, rays_d, nears, fars, occ_box,
                    bound=cfg.bound, dt_gamma=opts.dt_gamma,
                    max_steps=opts.max_steps, num_samples=opts.num_samples,
                    noise=noise if use_noise else None, min_near=cfg.min_near,
                    grid_size=occupancy.shape[0],
                )
                return jnp.mean(m.mask.astype(jnp.float32))

            self._jit_live_frac = jax.jit(live_frac)
        fracs = []
        for _ in range(n_probes):
            idx = int(self.np_rng.randint(len(ds)))
            inds = self.np_rng.randint(0, ds.H * ds.W, size=self.task_cfg.n_rays)
            # probe under the SAME perturb jitter training marches with —
            # an unjittered probe can undercount the live set the jittered
            # train step will actually produce
            noise = jnp.asarray(
                self.np_rng.random_sample(self.task_cfg.n_rays), jnp.float32)
            fracs.append(float(self._jit_live_frac(
                jnp.asarray(ds.frame_pose(idx), jnp.float32),
                jnp.asarray(inds.astype(np.int32)), self.occupancy, noise)))
        return max(fracs)

    def _enable_train_compaction(self):
        """Measure the live budget and compile the compacted train step
        (one recompile; ROADMAP 6b). Falls back to the full-slot step when
        the measured budget leaves no headroom (>=85% live)."""
        frac = self._live_frac_probe()
        budget = min(1.0, frac * self.task_cfg.train_compact_margin)
        self._compact_telemetry = {
            "compact/probe_live_frac": frac,
            "compact/budget_frac": budget,
        }
        if budget >= 0.85:
            self._compact_step = self._train_step  # no win at this density
            return
        self._compact_step = self._build_compact_step(budget)

    def _build_compact_step(self, budget: float):
        """Compile the train step with a compacted field budget (subclasses
        with their own step graphs override this)."""
        opts_c = dataclasses.replace(self.opts, compact_frac=budget)
        base = make_train_step(
            self.model, self.tx, opts_c, self.hp,
            use_fused_field=self.task_cfg.use_fused_field,
            fused_tile=self.task_cfg.fused_tile,
        )
        gather = self._make_ray_gather()

        def fused_step(state, frames, idx, inds, occupancy):
            return base(state, gather(frames, idx, inds), occupancy)

        return jax.jit(fused_step)

    # ------------------------------------------------------------------
    def _make_lip_step(self):
        """Lip-window step: mse + perceptual on the [win, win] crop."""
        import optax

        from genefaceplusplus_tpu.models.renderer import render_rays
        from genefaceplusplus_tpu.training import losses as L
        from genefaceplusplus_tpu.training.perceptual import perceptual_from_task_config

        model, tx, opts, cfg = self.model, self.tx, self.opts, self.cfg
        win = min(self.task_cfg.lip_window, self.dataset.H, self.dataset.W)
        lam = self.task_cfg.lambda_lpips
        perceptual = perceptual_from_task_config(self.task_cfg)

        def loss_fn(params, batch, occupancy, noise):
            cond_feat = model.apply(params, batch["cond"], batch.get("eye_area_percent"),
                                    method=RADNeRF.cal_cond_feat)
            ind = model.apply(params, batch["idx"], method=RADNeRF.get_individual_code)

            def field_fn(xyz, dirs):
                return model.apply(params, xyz, dirs, cond_feat, ind, method=RADNeRF.field)

            out = render_rays(field_fn, batch["rays_o"], batch["rays_d"], occupancy,
                              bound=cfg.bound, min_near=cfg.min_near,
                              bg_color=batch["bg_color"], opts=opts, noise=noise)
            mse = L.mse_loss(out.rgb_map, batch["gt_rgb"])
            pred = out.rgb_map.reshape(1, win, win, 3)
            gt = batch["gt_rgb"].reshape(1, win, win, 3)
            lp = perceptual(pred, gt)
            total = mse + lam * lp
            return total, {"mse_loss": mse, "lpips_loss": lp,
                           "head_psnr": L.mse2psnr(mse), "total_loss": total}

        gather = self._make_ray_gather()

        def step(state: TrainState, frames, idx, inds, occupancy):
            batch = gather(frames, idx, inds)
            rng, sub = jax.random.split(state.rng)
            noise = jax.random.uniform(sub, batch["rays_o"].shape[:1]) if opts.perturb else None
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, occupancy, noise)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics["lambda_ambient"] = state.lambda_ambient
            return TrainState(new_params, new_opt, state.global_step + 1,
                              state.lambda_ambient, rng), metrics

        return jax.jit(step)

    def train_step(self, state: TrainState, batch):
        if self._host_step is None:  # one-time device sync (test/resume path)
            self._host_step = int(state.global_step)
        frames = self._device_frames()
        idx = jnp.asarray(batch["frame_idx"], jnp.int32)
        inds = jnp.asarray(batch["inds"], jnp.int32)
        if batch.pop("_is_lip", False):
            if self._lip_step is None:
                self._lip_step = self._make_lip_step()
            state, metrics = self._lip_step(state, frames, idx, inds, self.occupancy)
        else:
            cs = self.task_cfg.train_compact_start
            if (cs > 0 and self._compact_step is None
                    and self._host_step >= cs):
                self._enable_train_compaction()
            step_fn = self._compact_step if self._compact_step is not None \
                else self._train_step
            state, metrics = step_fn(state, frames, idx, inds, self.occupancy)
            metrics.update(self._compact_telemetry)
        metrics.update(self.grid_telemetry)
        self._host_step += 1
        return state, metrics

    def update_extra_state(self, state: TrainState):
        """Density-grid EMA refresh with a random condition (renderer.py:201-284).
        Skipped during lip finetuning (radnerf.py:184-188)."""
        gs = self._host_step if self._host_step is not None \
            else int(state.global_step)
        if (self.task_cfg.finetune_lips
                and gs > self.task_cfg.finetune_lips_start_iter):
            return
        ds = self.dataset
        idx = int(self.np_rng.randint(len(ds)))
        cond = jnp.asarray(ds.frame_cond_window(idx))

        if self._jit_grid_refresh is None:
            model, cfg, task_cfg = self.model, self.cfg, self.task_cfg

            def refresh(params, cond, grid, rng):
                cond_feat = model.apply(params, cond, method=RADNeRF.cal_cond_feat)

                def density_fn(pts):
                    return model.apply(params, pts, cond_feat, method=RADNeRF.density)

                return update_density_grid(
                    density_fn, grid, rng,
                    bound=cfg.bound, decay=task_cfg.grid_decay,
                    density_thresh=cfg.density_thresh,
                )

            self._jit_grid_refresh = jax.jit(refresh)

        self._grid_rng, sub = jax.random.split(self._grid_rng)
        self.density_grid, self.occupancy, mean_d = self._jit_grid_refresh(
            state.params, cond, self.density_grid, sub
        )
        self.mean_density = float(mean_d)
        # telemetry (reference density_grid_info, radnerf.py:203-212)
        self.grid_telemetry = {
            "density_grid/mean_density": self.mean_density,
            "density_grid/occupancy_rate": float(jnp.mean(self.occupancy)),
        }
        # compaction overflow guard: the budget was measured at the switch
        # step; the occupancy only shrinks under EMA decay, but surface the
        # live fraction every refresh so a violation is visible, and warn
        # loudly if the budget no longer covers it (gradients would drop
        # the flat-order tail of live samples)
        if self._compact_step is not None and self._compact_step is not self._train_step:
            frac = self._live_frac_probe(n_probes=1)
            self._compact_telemetry["compact/probe_live_frac"] = frac
            if frac > self._compact_telemetry.get("compact/budget_frac", 1.0):
                print(f"| WARNING: live-sample fraction {frac:.3f} exceeds the "
                      f"compaction budget "
                      f"{self._compact_telemetry['compact/budget_frac']:.3f} — "
                      "tail samples are being dropped; raise "
                      "train_compact_margin or restart compaction")

    # ------------------------------------------------------------------
    def validate(self, state: TrainState, max_frames: int = 2,
                 save_dir: str = "") -> Dict[str, float]:
        """Full-image renders on val frames -> PSNR (radnerf.py:199-200);
        renders saved to <save_dir>/validation_results when given (mirrors
        the reference's periodic validation figures, radnerf.py:234-281)."""
        ds_val = self.val_dataset if self.val_dataset is not None else self.dataset
        from genefaceplusplus_tpu.utils.rays import pixel_rays_jit

        if not hasattr(self, "_jit_val_render"):
            model, cfg = self.model, self.cfg
            v_opts = dataclasses.replace(self.opts, perturb=False)

            def val_fn(params, rays_o, rays_d, cond, eye, ind_idx, occupancy, bg):
                cond_feat = model.apply(params, cond, eye, method=RADNeRF.cal_cond_feat)
                ind = model.apply(params, ind_idx, method=RADNeRF.get_individual_code)

                def field_fn(xyz, dirs):
                    return model.apply(params, xyz, dirs, cond_feat, ind,
                                       method=RADNeRF.field)

                return render_rays(field_fn, rays_o, rays_d, occupancy,
                                   bound=cfg.bound, min_near=cfg.min_near,
                                   bg_color=bg, opts=v_opts)

            self._jit_val_render = jax.jit(val_fn)

        # The tiledgrid encoder's full-frame gather graph is XLA-hostile at
        # scale: 422 s compile at 128² and a TPU-worker crash at 256²
        # (docs/QUALITY_PARITY.md render table). Render those frames in
        # training-batch-sized ray chunks instead — the 16384-ray gather
        # graph is the shape the train step already compiles and runs. The
        # fourier flagship keeps the single-dispatch full-frame path.
        chunk = getattr(self, "val_ray_chunk", None)
        if chunk is None:
            chunk = 16384 if self.cfg.grid_type in ("tiledgrid", "hashgrid") else 0

        def _render_rgb(params, ro, rd, cond, eye, gid, occ, bg):
            n = ro.shape[0]
            if not chunk or n <= chunk:
                beat = getattr(self, "_trainer_heartbeat", None)
                if beat is not None:
                    beat()
                return self._jit_val_render(params, ro, rd, cond, eye, gid,
                                            occ, bg).rgb_map
            # pad to a chunk multiple: a ragged final slice would compile a
            # SECOND XLA graph shape — the exact compile cost the chunking
            # exists to avoid (advisor r4; harmless dup rays, sliced off)
            pad = (-n) % chunk
            if pad:
                ro = jnp.concatenate([ro, ro[-pad:]], axis=0)
                rd = jnp.concatenate([rd, rd[-pad:]], axis=0)
                bg = jnp.concatenate([bg, bg[-pad:]], axis=0)
            parts = []
            beat = getattr(self, "_trainer_heartbeat", None)
            for s in range(0, n + pad, chunk):
                part = self._jit_val_render(
                    params, ro[s:s + chunk], rd[s:s + chunk], cond, eye, gid,
                    occ, bg[s:s + chunk]).rgb_map
                if beat is not None:
                    # block per chunk so the beat tracks DEVICE progress:
                    # jit dispatch is async, so beating at dispatch time
                    # would fire every beat within milliseconds and leave
                    # the whole render un-heartbeaten (stall watchdog would
                    # still kill a long warm validation — advisor r4)
                    part.block_until_ready()
                    beat()
                parts.append(part)
            return jnp.concatenate(parts, axis=0)[:n]

        self._val_render_rgb = _render_rgb

        psnrs = []
        for i in range(min(max_frames, len(ds_val))):
            pose = jnp.asarray(ds_val.frame_pose(i)[None])
            rays_o, rays_d, _ = pixel_rays_jit(pose, ds_val.intrinsics, ds_val.H, ds_val.W)
            cond = jnp.asarray(ds_val.frame_cond_window(i))
            # the val frame's OWN blink condition and individual code — the
            # embedding table covers the full timeline (reference eval
            # passes the frame idx, radnerf.py:199)
            gid = min(int(ds_val.frame_ids[i]), self.cfg.individual_embedding_num - 1)
            # render over the frame's torso-composited background — the SAME
            # background training uses (torso-as-background convention,
            # dataset_utils.py:400-412); validating over the plain bg would
            # charge the whole torso region against the head model
            bg = ds_val.frame_bg_torso(i)
            bg = ds_val.bg_img if bg is None else bg
            rgb = _render_rgb(
                state.params, rays_o[0], rays_d[0], cond,
                jnp.asarray(ds_val.eye_area_percents[i : i + 1]),
                jnp.asarray(max(gid, 0), jnp.int32), self.occupancy,
                jnp.asarray(np.asarray(bg, np.float32).reshape(-1, 3)),
            )
            if save_dir:
                import os

                from genefaceplusplus_tpu import native

                vdir = os.path.join(save_dir, "validation_results")
                os.makedirs(vdir, exist_ok=True)
                img = native.pack_frame(
                    np.asarray(rgb).reshape(ds_val.H, ds_val.W, 3)
                )
                try:
                    import cv2

                    cv2.imwrite(
                        os.path.join(vdir, f"val_{int(state.global_step)}_{i}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    )
                except Exception:
                    pass
            gt = ds_val.load_image(i, "gt")
            if gt is None:
                continue
            mse = float(jnp.mean((rgb - gt.reshape(-1, 3)) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        return {"val_psnr": float(np.mean(psnrs))} if psnrs else {}

    def extra_state_dict(self):
        return {
            "density_grid": self.density_grid,
            "occupancy": self.occupancy,
        }

    def load_extra_state(self, d):
        if "density_grid" in d:
            self.density_grid = jnp.asarray(d["density_grid"])
        if "occupancy" in d:
            self.occupancy = jnp.asarray(d["occupancy"]).astype(bool)
