"""Production-scale quality parity on the synthetic identity.

Runs the flagship operating point — 256² head render + 2× StyleGAN2 SR ->
512², full 65536-ray full-frame steps, staged lip/perceptual schedule — on
the textured deforming synthetic face (data/synthetic_face.py), for both
the TPU-native Fourier field and the reference-parity tiledgrid encoder at
EQUAL step budget, and reports PSNR (raw + 512² SR) and LMD curves plus a
rendered validation clip (docs/QUALITY_PARITY.md round-3 evidence; VERDICT
round-2 item 1).

LMD instrument: the real metric runs a landmark detector on rendered
frames. No pretrained detector ships in this image, so `lmd` trains a
small conv regressor on the identity's GT frames (augmented), reports its
own error on held-out GT as the noise floor, and `eval` applies it to the
NeRF renders — landmark distance in 512-scale pixels.

Stages (each resumable / independent):
  python scripts/quality_production.py gen     [--frames 450]
  python scripts/quality_production.py measure                 # step timing
  python scripts/quality_production.py train --variant fourier --steps 50000
  python scripts/quality_production.py lmd                     # detector (CPU ok)
  python scripts/quality_production.py eval  --variant fourier # PSNR+LMD+clip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.environ.get("SYNTH_DATA_DIR", "/tmp/gfpp_synth")
DATA = os.path.join(DATA_DIR, "synth512", "trainval_dataset.npy")
DETECTOR = os.path.join(DATA_DIR, "lmd_detector.msgpack")
DETECTOR2 = os.path.join(DATA_DIR, "lmd_detector_v2.msgpack")
WORKROOT = os.environ.get("SYNTH_WORKROOT", "checkpoints")


def workdir(variant: str) -> str:
    return os.path.join(WORKROOT, f"synth512_{variant}")


# ---------------------------------------------------------------- dataset
def stage_gen(args):
    from genefaceplusplus_tpu.data.synthetic_face import cached_synthetic_face

    t0 = time.time()
    path = cached_synthetic_face(DATA, num_frames=args.frames, size=512)
    print(f"| dataset at {path} ({time.time() - t0:.1f}s)")


def _load_datasets():
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset

    tr = RADNeRFDataset(DATA, split="train", smo_win_size=3, with_sr=True)
    va = RADNeRFDataset(DATA, split="val", smo_win_size=3, with_sr=True,
                        smooth_eval_camera=False)
    return tr, va


def _val_bg(ds, i):
    """Per-frame torso-composited background — the training convention
    (torso-as-background); plain bg would charge the torso region against
    the head+SR stack (head_task.validate note)."""
    bg = ds.frame_bg_torso(i)
    return ds.bg_img if bg is None else bg


def _model_cfg(variant: str, n_frames: int):
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig

    # GFPP_FIELD_ACT_DTYPE=bfloat16: evaluate/train with bf16 field
    # activations (the reference's fp16-AMP analogue; A/B knob)
    # GFPP_FOURIER_POS_FEATURES / GFPP_FOURIER_POS_MAX_SCALE: field-capacity
    # ablation knobs (round-5 plateau diagnosis — the surviving lever after
    # 2x-data and encoder-family were ruled out). Mirrored into
    # _train_config so the ckpt-dir-carries-config contract rebuilds the
    # same model at eval time.
    return RADNeRFConfig(grid_type=variant, individual_embedding_num=n_frames,
                         add_eye_blink_cond=True,
                         fourier_pos_features=int(os.environ.get(
                             "GFPP_FOURIER_POS_FEATURES", "128")),
                         fourier_pos_max_scale=float(os.environ.get(
                             "GFPP_FOURIER_POS_MAX_SCALE", "128")),
                         field_act_dtype=os.environ.get(
                             "GFPP_FIELD_ACT_DTYPE", "float32"))


def _build_task(variant: str, steps: int, tr, va):
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.sr_task import SRHeadNeRFTask, SRTaskConfig

    # staged schedule scaled from the reference's 200k/250k (= 0.8 budget):
    # lpips + alternate-iteration lip finetuning over the last 20%
    tcfg = SRTaskConfig(
        n_rays=tr.H * tr.W,
        update_extra_interval=16,
        lr=5e-4,
        sr_start_iters=0,
        lpips_start_iters=int(0.8 * steps),
        finetune_lips=True,
        finetune_lips_start_iter=int(0.8 * steps),
        lambda_lpips=0.001,
        lip_window=64,
    )
    cfg = _model_cfg(variant, len(tr) + len(va))
    task = SRHeadNeRFTask(tr, cfg, tcfg, TaskHParams(), seed=0)
    task.val_dataset = va
    return task


def _train_config(variant: str, n_frames: int = 450) -> dict:
    """Self-describing checkpoint config (the ckpt-dir-carries-config
    contract) so GeneFaceInfer can rebuild the model + find the dataset."""
    return {
        "task_cls": "head", "with_sr": True, "grid_type": variant,
        "binary_data_dir": DATA_DIR, "video_id": "synth512",
        "smo_win_size": 3, "cond_win_size": 1, "add_eye_blink_cond": True,
        "grid_size": 128, "individual_embedding_num": n_frames,
        "sr_dtype": "bfloat16",
        "fourier_pos_features": int(os.environ.get(
            "GFPP_FOURIER_POS_FEATURES", "128")),
        "fourier_pos_max_scale": float(os.environ.get(
            "GFPP_FOURIER_POS_MAX_SCALE", "128")),
    }


def stage_train(args):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from genefaceplusplus_tpu.config import Config
    from genefaceplusplus_tpu.training.trainer import Trainer

    tr, va = _load_datasets()
    task = _build_task(args.variant, args.steps, tr, va)
    trainer = Trainer(
        task, workdir(args.variant),
        config=Config(_train_config(args.variant, len(tr) + len(va))),
        max_updates=args.steps,
        val_check_interval=args.val_interval,
        tb_log_interval=100,
        num_ckpt_keep=2,
        # milestones every 10k: lets later rounds re-evaluate intermediate
        # checkpoints with improved instruments (corrected-bg PSNR / LMD
        # curves) without retraining
        milestone_interval=10_000,
        update_extra_interval=16,
    )
    t0 = time.time()
    trainer.fit(resume=not args.reset)
    print(f"| {args.variant} {args.steps} steps in {(time.time() - t0) / 60:.1f} min")


def _torso_cfg(variant: str, n_frames: int = 450) -> dict:
    return {
        "task_cls": "torso", "with_sr": True, "grid_type": variant,
        "binary_data_dir": DATA_DIR, "video_id": "synth512",
        "smo_win_size": 3, "cond_win_size": 1, "add_eye_blink_cond": True,
        "grid_size": 128, "individual_embedding_num": n_frames,
        "torso_individual_embedding_dim": 8, "torso_head_aware": True,
        "lr": 5e-4, "max_steps": 16,
        "lambda_weights_entropy": 1e-4, "lambda_torso_deform": 1e-3,
        "head_model_dir": workdir(variant),
    }


def stage_train_torso(args):
    """Torso stage on top of the trained (frozen) head — the reference's
    torso_train_and_infer.sh step 2 (radnerf_torso_sr.py) at the same
    production budget: full 256² frames, head restored from the SR ckpt."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from genefaceplusplus_tpu.config import Config
    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.training.tasks.torso_task import TorsoNeRFTask
    from genefaceplusplus_tpu.training.trainer import Trainer

    tr, va = _load_datasets()
    cfg = Config(_torso_cfg(args.variant, len(tr) + len(va)))
    task = TorsoNeRFTask(tr, _model_cfg(args.variant, len(tr) + len(va)), cfg)
    task.opts = RenderOptions(max_steps=16, num_coarse=48, num_samples=16,
                              perturb=False)
    task._train_step = jax.jit(task._make_step())  # re-jit with the opts above
    trainer = Trainer(
        task, workdir(args.variant) + "_torso", config=cfg,
        max_updates=args.steps,
        val_check_interval=args.val_interval,
        tb_log_interval=100,
        num_ckpt_keep=2,
        # milestones every 10k: lets later rounds re-evaluate intermediate
        # checkpoints with improved instruments (corrected-bg PSNR / LMD
        # curves) without retraining
        milestone_interval=10_000,
        update_extra_interval=16,
    )
    t0 = time.time()
    trainer.fit(resume=not args.reset)
    print(f"| torso({args.variant}) {args.steps} steps in {(time.time() - t0) / 60:.1f} min")


A2M_AUDIO = os.path.join(DATA_DIR, "a2m_audio.npz")


def _synth_audio_track(seed: int = 123):
    """Derive a learnable synthetic "speech" track from the identity's
    stored mouth motion.

    The cached dataset's hubert is pure noise (fine for the renderer, whose
    conditioning is landmarks), so audio2motion training on it would be
    ill-posed. Real speech features encode articulation (jaw/lip state and
    its dynamics) but not brows, blinks, or pose — this construction
    mirrors that: a fixed random projection of [jaw, width, d/dt jaw] plus
    smooth nuisance latents (timbre-like variability the model must learn
    to ignore) through a tanh, with additive noise. f0 carries a weak
    prosody correlation with jaw. Cached to A2M_AUDIO so train / eval /
    inference all consume the identical track."""
    import numpy as np

    if os.path.exists(A2M_AUDIO):
        z = np.load(A2M_AUDIO)
        return z["hubert"], z["f0"]
    ds = np.load(DATA, allow_pickle=True).tolist()
    exp = np.asarray(ds["exp"], np.float32)  # dims 0..2 = jaw, width, brow
    T = len(exp)
    rng = np.random.RandomState(seed)
    t50 = np.linspace(0, T - 1, 2 * T)
    jaw = np.interp(t50, np.arange(T), exp[:, 0])
    width = np.interp(t50, np.arange(T), exp[:, 1])
    djaw = np.gradient(jaw)
    # mode="same" returns max(len(x), len(k)) — cap the kernel at the
    # (possibly tiny smoke-dataset) track length, kept odd
    klen = min(25, 2 * T - ((2 * T + 1) % 2))
    k = np.hanning(klen).astype(np.float32)
    k /= k.sum()
    nuis = np.stack([np.convolve(rng.randn(2 * T), k, mode="same")
                     for _ in range(5)], -1).astype(np.float32) * 3.0
    z = np.concatenate([np.stack([jaw, width, djaw], -1), nuis], -1)  # [2T, 8]
    proj = rng.randn(8, 1024).astype(np.float32) / np.sqrt(8)
    hubert = (np.tanh(z @ proj) + 0.05 * rng.randn(2 * T, 1024)).astype(np.float32)
    f0 = np.maximum(100 + 60 * jaw + 5 * rng.randn(2 * T), 10).astype(np.float32)
    np.savez(A2M_AUDIO, hubert=hubert, f0=f0)
    return hubert, f0


def _a2m_cfg() -> dict:
    """Self-describing a2m checkpoint config: the keys GeneFaceInfer reads
    to rebuild the model (inference/pipeline.py a2m construction) plus the
    task keys training/run.py would use."""
    return {
        "task_cls": "a2m", "use_pitch": True, "audio_in_dim": 1024,
        "motion_type": "idexp_lm3d", "a2m_target": "idexp_lm3d",
        "a2m_in_out_dim": 204,
        "a2m_hidden_channels": 256, "a2m_enc_layers": 8, "a2m_dec_layers": 4,
        "a2m_flow_hidden": 64, "a2m_flow_blocks": 4,
        "seq_len": 64, "batch_size": 8,
        "binary_data_dir": DATA_DIR, "video_id": "synth512",
    }


def stage_train_a2m(args):
    """Audio2motion at production scale on the synthetic identity: flow-VAE
    from the synthesized speech-like track to 204-d landmark motion
    (target=idexp_lm3d — the direct-drive space for identities without a
    BFM-consistent exp basis). The reference never released this stage's
    training (README.md:70); this completes the capability at scale."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from genefaceplusplus_tpu.config import Config
    from genefaceplusplus_tpu.training.tasks.a2m_task import A2MTask, A2MTaskConfig
    from genefaceplusplus_tpu.training.trainer import Trainer

    tr, _ = _load_datasets()
    hubert, f0 = _synth_audio_track()
    # seq_len must leave room for train windows + the 1/11 hold-out on
    # small smoke datasets; production (450 frames) gets the full 64
    T_total = len(hubert) // 2
    seq_len = min(64, max(8, T_total // 3 // 8 * 8))
    task = A2MTask(tr, A2MTaskConfig(
        target="idexp_lm3d", in_out_dim=204, audio_in_dim=1024,
        seq_len=seq_len,
        kl_anneal_steps=min(20_000, max(1, args.steps // 2))))
    # swap in the learnable track (the dataset's stored hubert is noise)
    assert len(hubert) == len(task.hubert), (len(hubert), len(task.hubert))
    task.hubert = np.asarray(hubert, np.float32)
    task.f0 = np.asarray(f0, np.float32)
    trainer = Trainer(
        task, workdir("a2m"), config=Config(_a2m_cfg()),
        max_updates=args.steps,
        val_check_interval=args.val_interval,
        tb_log_interval=100,
        num_ckpt_keep=2,
        milestone_interval=10_000,
    )
    t0 = time.time()
    trainer.fit(resume=not args.reset)
    print(f"| a2m {args.steps} steps in {(time.time() - t0) / 60:.1f} min")


def stage_train_postnet(args):
    """Person-specific postnet at production scale: refine RAW a2m
    predictions (sampled at the pipeline's default temperature) toward the
    identity's GT landmarks, pitch-conditioned. The reference ships this
    only as an inference-time module (genefacepp_infer.py:152-162); here
    the training leg is completed against the actual trained a2m model so
    the refiner learns the model's real error distribution, not synthetic
    noise."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from genefaceplusplus_tpu.config import Config
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer
    from genefaceplusplus_tpu.training.tasks.postnet_task import (
        PostnetTask, PostnetTaskConfig,
    )
    from genefaceplusplus_tpu.training.trainer import Trainer

    tr, _ = _load_datasets()
    hubert, f0 = _synth_audio_track()
    # the stored dataset hubert is noise — postnet must see the same
    # learnable track the a2m model was trained on
    tr.ds["hubert"] = np.asarray(hubert, np.float32)
    tr.ds["f0"] = np.asarray(f0, np.float32)

    infer = GeneFaceInfer(audio2secc_dir=workdir("a2m"), dataset=tr)
    model, params = infer.a2m_model, infer.a2m_params
    # train on the DEPLOYED temperature range, incl. the deterministic
    # prior mode (temp 0 — what eval-a2m drives with): a postnet trained
    # only on temp-0.2 samples learns to average sampling noise and is a
    # near-no-op on the prior mode's systematic error (measured: identical
    # metrics to 0.01 px with/without postnet at temp 0)
    temps = (0.0, 0.1, 0.2, 0.3)
    apps = {t: jax.jit(lambda p, b, rng, _t=t: model.apply(
        p, b, train=False, temperature=_t, rng=rng)) for t in temps}

    def predict_fn(hub, f0seg, seed):
        T = len(hub) // 2
        b = {"audio": jnp.asarray(hub)[None], "f0": jnp.asarray(f0seg)[None],
             "y_mask": jnp.ones((1, T)),
             "mouth_amp": jnp.full((1, 1), 0.4)}
        temp = temps[int(seed) % len(temps)]
        pred, _ = apps[temp](params, b, jax.random.PRNGKey(int(seed)))
        return np.asarray(pred[0])

    # pre-generate a full-track raw-prediction bank: one whole-track a2m
    # dispatch per (temperature, seed) instead of 4 window dispatches per
    # training step (0.15 -> device-speed steps/s through the tunnel);
    # temp 0 is deterministic, so it contributes a single entry
    T_total = len(hubert) // 2
    bank = []
    t0b = time.time()
    for temp in temps:
        for seed in range(1 if temp == 0.0 else 5):
            bank.append(predict_fn(np.asarray(hubert, np.float32),
                                   np.asarray(f0, np.float32),
                                   seed * len(temps) + temps.index(temp)))
    bank = np.stack(bank)
    print(f"| raw bank {bank.shape} in {time.time() - t0b:.0f}s")

    seq_len = min(64, max(8, T_total // 3 // 8 * 8))
    task = PostnetTask(tr, PostnetTaskConfig(seq_len=seq_len),
                       predict_fn=predict_fn, raw_bank=bank)
    trainer = Trainer(
        task, workdir("postnet"),
        config=Config({
            "task_cls": "postnet", "postnet_out_dim": 204,
            "postnet_hidden": 256, "postnet_layers": 4,
            "seq_len": seq_len, "batch_size": 4,
            "binary_data_dir": DATA_DIR, "video_id": "synth512",
        }),
        max_updates=args.steps,
        val_check_interval=args.val_interval,
        tb_log_interval=100,
        num_ckpt_keep=2,
    )
    t0 = time.time()
    trainer.fit(resume=not args.reset)
    print(f"| postnet {args.steps} steps in {(time.time() - t0) / 60:.1f} min")


def stage_eval_a2m(args):
    """End-to-end AUDIO-DRIVEN evaluation: held-out audio -> a2m ->
    production pipeline (quantile clamps, LLE, blink injection, region
    freeze) -> head+torso+SR frames at 512², graded against the GT video
    of the same held-out segment. Mouth-region LMD is the headline (audio
    determines the mouth; brows/blinks are prior-driven by design).
    Writes a GT | audio-driven side-by-side clip artifact."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer, default_inp
    from genefaceplusplus_tpu.inference.serving import _dispatch_render, _drain

    tr, va = _load_datasets()
    hubert, f0 = _synth_audio_track()
    torso_dir = workdir(args.variant) + "_torso"
    if not os.path.exists(os.path.join(torso_dir, "config.yaml")):
        print(f"| no torso stage at {torso_dir} — head-only eval")
        torso_dir = None
    postnet_dir = workdir("postnet") if getattr(args, "postnet", False) else None
    infer = GeneFaceInfer(
        audio2secc_dir=workdir("a2m"),
        postnet_dir=postnet_dir,
        head_model_dir=workdir(args.variant),
        torso_model_dir=torso_dir,
        dataset=tr,
    )
    # held-out segment: the renderer's val frames (last 1/11) — a strict
    # subset of the a2m task's own temporal hold-out (max(seq_len, T/11)),
    # so NEITHER model trained on these frames or their audio
    ds_np = tr.ds
    T_total = len(hubert) // 2
    a2m_holdout_start = T_total - max(64, T_total // 11)
    val_ids = sorted(int(v) for v in va.frame_ids)
    if getattr(args, "all_holdout", False):
        # grade the FULL a2m temporal hold-out (64 frames at production
        # scale): every frame's AUDIO is unseen by the a2m model, which is
        # what the mouth-LMD/sync headline grades; frames before the
        # renderer-val boundary were seen by the RENDERER, so PSNR (render
        # quality) is additionally reported on the strict subset below
        s = a2m_holdout_start
        L = (T_total - s) // 8 * 8
    else:
        s = max(val_ids[0], a2m_holdout_start)
        L = (val_ids[-1] + 1 - s) // 8 * 8
    if getattr(args, "frames", 0):
        L = min(L, max(8, int(args.frames) // 8 * 8))
    if L < 8:
        # smoke-scale datasets: the strict a2m-holdout ∩ renderer-val
        # overlap is empty — grade the last 8 frames anyway, loudly. The
        # strictness only holds at production scale (450-frame identity:
        # s=val start, L≥40).
        print("| WARNING smoke-scale dataset: grading frames that overlap "
              "a training window (held-out strictness waived)")
        s, L = max(0, T_total - 8), 8
    # resolve each global frame id to (split dataset, local index) — the
    # graded window may span the train/val boundary on smoke datasets
    id2src = {}
    for dsx in (tr, va):
        for k, fid in enumerate(dsx.frame_ids):
            id2src[int(fid)] = (dsx, k)
    srcs = [id2src[s + i] for i in range(L)]
    batch = {
        "hubert": hubert[2 * s : 2 * (s + L)],
        "f0": f0[2 * s : 2 * (s + L)],
        "T": L,
        # drive with the GT poses of the same held-out frames (pose is an
        # input, not a prediction, in this pipeline — frame-aligned grading)
        "poses": np.stack([dsx.frame_pose(k) for dsx, k in srcs]),
        "eulers": np.asarray(ds_np["euler"])[s : s + L],
        "transs": np.asarray(ds_np["trans"])[s : s + L],
    }
    temp = float(getattr(args, "temperature", 0.0) or 0.0)
    seed = getattr(args, "seed", None)
    if seed is not None:
        import jax as _jax

        infer.rng = _jax.random.PRNGKey(int(seed))
    inp = default_inp(blink_mode="period", temperature=temp, lle_percent=0.2,
                      mouth_amp=0.4)
    batch = infer.forward_audio2secc(batch, inp)
    frames = list(_drain(_dispatch_render(infer, batch, inp)))[:L]

    gts = [(dsx.load_image(k, "gt", full_res=True) * 255).astype(np.uint8)
           for dsx, k in srcs]
    lms = [dsx.samples[k]["lms"] for dsx, k in srcs]
    # PSNR vs GT is a SECONDARY number here: audio-driven motion differs
    # from GT motion by construction, so the gap vs the GT-driven eval's
    # val_sr_psnr_512 quantifies motion-induced error, not render quality
    psnrs = [-10 * np.log10(max(float(np.mean(
        (r.astype(np.float32) / 255 - g.astype(np.float32) / 255) ** 2)), 1e-10))
        for r, g in zip(frames, gts)]
    # strict subset: frames the renderer ALSO never trained on (PSNR is a
    # render-quality secondary; motion metrics are valid on the full window)
    strict = [i for i in range(L) if (s + i) >= val_ids[0]]
    res = {"variant": args.variant, "frames": L,
           "frames_renderer_heldout": len(strict),
           "held_out_start": s, "temperature": temp,
           "seed": (int(seed) if seed is not None else None),
           "postnet": bool(postnet_dir),
           # headline = strict subset (renderer-held-out frames only), the
           # semantics every earlier round reported; the full-window mean
           # includes renderer-seen frames and is a separate, named key
           "audio_driven_psnr_512": round(float(np.mean(
               [psnrs[i] for i in strict])), 2) if strict else None,
           "audio_driven_psnr_512_fullwindow": round(float(np.mean(psnrs)), 2)}
    res = _lmd_report(res, frames, gts, lms)
    res = _sync_report(res, frames, batch["hubert"], lms)
    if args.clip:
        from genefaceplusplus_tpu.data.video import StreamingVideoWriter

        os.makedirs(os.path.dirname(args.clip), exist_ok=True)
        wtr = StreamingVideoWriter(args.clip, fps=25)
        for g, r in zip(gts, frames):
            wtr.append(np.concatenate([g, r], axis=1).astype(np.float32) / 255.0)
        wtr.close()
        res["clip"] = args.clip
    print(json.dumps(res))
    suffix = "_postnet" if postnet_dir else ""
    tag = getattr(args, "tag", "") or ""
    if tag:
        suffix += f"_{tag}"
    with open(os.path.join(workdir("a2m"), f"quality_eval{suffix}.json"), "w") as f:
        json.dump(res, f, indent=2)
    return res


def stage_postnet_ab(args):
    """Postnet A/B at the DEPLOYED temperature (VERDICT r4 item 4): grade
    eval-a2m with and without the postnet refinement on >=3 sampling seeds
    at temperature 0.2 (default_inp's deployed value — round-4 graded only
    temperature 0, where the flow prior is deterministic and the postnet
    measured as a no-op). Verdict: the postnet keeps its place in the
    headline chain only if its mouth-LMD/sync delta exceeds the seed noise
    (1 sigma across seeds)."""
    import argparse as _ap

    import numpy as np

    seeds = [int(x) for x in args.seeds.split(",")]
    runs = {"off": [], "on": []}
    for postnet in (False, True):
        for seed in seeds:
            sub = _ap.Namespace(
                variant=args.variant, clip="", frames=args.frames,
                postnet=postnet, all_holdout=True, temperature=args.temperature,
                seed=seed, tag=f"ab_t{args.temperature}_s{seed}")
            res = stage_eval_a2m(sub)
            runs["on" if postnet else "off"].append(res)
            print(f"| postnet-ab postnet={postnet} seed={seed}: "
                  f"mouth={res.get('val_lmd_mouth_px_512_v2')} "
                  f"sync={res.get('sync_conf')}", flush=True)

    keys = ["val_lmd_mouth_px_512_v2", "val_lmd_px_512_v2", "sync_conf",
            "audio_driven_psnr_512"]
    summary = {"temperature": args.temperature, "seeds": seeds}
    for k in keys:
        off = np.array([r[k] for r in runs["off"] if r.get(k) is not None], float)
        on = np.array([r[k] for r in runs["on"] if r.get(k) is not None], float)
        if len(off) == 0 or len(on) == 0:
            continue
        noise = float(max(off.std(), on.std()))
        summary[k] = {
            "off_mean": round(float(off.mean()), 3),
            "on_mean": round(float(on.mean()), 3),
            "delta": round(float(on.mean() - off.mean()), 3),
            "seed_sigma": round(noise, 3),
        }
    mouth = summary.get("val_lmd_mouth_px_512_v2", {})
    sync = summary.get("sync_conf", {})
    if not mouth and not sync:
        # detector/scorer msgpack absent -> zero measurements; a demote
        # verdict on no data would be a silent lie
        summary["verdict"] = "INSTRUMENTS MISSING — no verdict"
    else:
        effect = (abs(mouth.get("delta", 0.0)) > mouth.get("seed_sigma", 0.0)
                  or abs(sync.get("delta", 0.0)) > sync.get("seed_sigma", 0.0))
        summary["verdict"] = (
            "measurable effect beyond seed noise" if effect
            else "no-op within seed noise -> demote from headline chain")
    out = os.path.join(workdir("postnet"), "ab_results.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


def stage_measure(args):
    """Per-variant step time at the production budget (sizes the runs)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    tr, va = _load_datasets()
    out = {}
    for variant in args.variants.split(","):
        task = _build_task(variant, 50_000, tr, va)
        state = task.create_state()
        task.update_extra_state(state)
        batch = task.sample_train_batch()
        t0 = time.time()
        state, m = task.train_step(state, batch)
        float(m["total_loss"])
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.steps):
            batch = task.sample_train_batch()
            t0 = time.time()
            state, m = task.train_step(state, batch)
            float(m["total_loss"])  # force completion through the tunnel
            best = min(best, time.time() - t0)
        out[variant] = {"step_s": round(best, 4), "compile_s": round(compile_s, 1),
                        "hours_for_50k": round(best * 50_000 / 3600.0, 2)}
        print(f"| {variant}: {out[variant]}")
    print(json.dumps(out))


# ------------------------------------------------------------ LMD probe
# Detector models + measurement API live in the package
# (genefaceplusplus_tpu/metrics/lmd.py); this script owns training (needs
# the synthetic dataset + augmentation pool) and binds the on-disk
# detector paths.
from genefaceplusplus_tpu.metrics.lmd import (  # noqa: E402
    lm_detector as _detector_for,
    to_detector_input as _to_det_input,
)
from genefaceplusplus_tpu.metrics import lmd as _lmd  # noqa: E402


def _detector_path(arch: str) -> str:
    return DETECTOR if arch == "v1" else DETECTOR2


def stage_lmd(args):
    import jax

    if not getattr(args, "tpu", False):
        jax.config.update("jax_platforms", "cpu")  # never contend with the TPU runs
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    arch = getattr(args, "arch", "v1")
    ds = np.load(DATA, allow_pickle=True).tolist()
    train, val = ds["train_samples"], ds["val_samples"]
    X = np.stack([_to_det_input(s["gt_img"]) for s in train])
    Y = np.stack([s["lms"].reshape(-1) for s in train])
    Xv = np.stack([_to_det_input(s["gt_img"]) for s in val])
    Yv = np.stack([s["lms"].reshape(-1) for s in val])

    # --- surroundings augmentation (round-4 instrument hardening) ---
    # The round-3 v2 detector lost the face on ~20% of head-only-clip
    # frames (VERDICT weak #3): it had only ever seen the GT composite, so
    # any change in the torso/background appearance pushed the heatmaps
    # off-distribution and the soft-argmax collapsed. The dataset stores
    # bg_img + per-frame RGBA torso, and gt = where(head_mask, head,
    # bg*(1-ta)+torso*ta) exactly (data/synthetic_face.py:348-353), so the
    # head mask is recoverable per frame; training composites the SAME head
    # pixels over a pool of alternative surroundings (other frames'
    # torso composites, recolored/blurred variants, solid fills) so the
    # detector keys on the face, not its context.
    import cv2

    bg512 = np.asarray(ds["bg_img"], np.float32) / 255.0

    def _bgtorso(s):
        t = np.asarray(s["torso_img"], np.float32) / 255.0
        return bg512 * (1 - t[..., 3:]) + t[..., :3] * t[..., 3:]

    def _at128(img):
        return cv2.resize(img.astype(np.float32), (128, 128))

    M = np.stack([
        (np.abs(np.asarray(s["gt_img"], np.float32) / 255.0 - _bgtorso(s))
         .max(-1) > 1.5 / 255.0).astype(np.float32)
        for s in train])
    M = np.stack([_at128(m) for m in M])[..., None]          # [N,128,128,1]
    rngp = np.random.RandomState(7)
    pool = [np.zeros((128, 128, 3), np.float32),
            np.ones((128, 128, 3), np.float32) * 0.5,
            _at128(bg512)]
    for j in rngp.choice(len(train), size=13, replace=False):
        pool.append(_at128(_bgtorso(train[j])))
    # head-only-render context: the head field composited over a
    # double-resampled GT torso background (what stage_eval's head-only
    # clips actually look like) — 512 -> 256 -> 512 round-trip before the
    # 128 detector input (VERDICT r4 weak #3)
    for j in rngp.choice(len(train), size=6, replace=False):
        bt = _bgtorso(train[j])
        soft = cv2.resize(cv2.resize(bt, (256, 256)), (512, 512))
        pool.append(_at128(soft))
    for _ in range(8):                                        # recolor/blur
        base = pool[rngp.randint(len(pool))]
        v = base * rngp.uniform(0.3, 1.4) + rngp.uniform(-0.2, 0.2, size=3)
        if rngp.rand() < 0.5:
            v = cv2.GaussianBlur(v, (0, 0), rngp.uniform(1, 6))
        pool.append(np.clip(v, 0, 1).astype(np.float32))
    for _ in range(8):                                        # texture noise
        v = np.clip(rngp.uniform(0.1, 0.9)
                    + cv2.GaussianBlur(rngp.randn(128, 128, 3).astype(np.float32),
                                       (0, 0), rngp.uniform(2, 10)) * 0.8, 0, 1)
        pool.append(v.astype(np.float32))
    BGPOOL = jnp.asarray(np.stack(pool))                      # [P,128,128,3]

    det = _detector_for(arch)
    params = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    tx = optax.adam(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, yb, mb, key):
        # augment: brightness/noise jitter so the detector transfers from
        # GT appearance to NeRF renders; v2 adds random translations (the
        # soft-argmax head is spatially structured, so shift equivariance
        # must come from data, with labels shifted to match) and random
        # surroundings replacement (see BGPOOL construction above)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        if arch == "v2":
            # replace surroundings on ~60% of samples BEFORE photometric
            # jitter so brightness/noise also decorrelate from context
            pidx = jax.random.randint(k4, (len(xb),), 0, BGPOOL.shape[0])
            useb = (jax.random.uniform(k5, (len(xb), 1, 1, 1)) < 0.6)
            alt = BGPOOL[pidx]
            xb = jnp.where(useb, mb * xb + (1 - mb) * alt, xb)
        xb = jnp.clip(xb * jax.random.uniform(k1, (len(xb), 1, 1, 1), minval=0.85, maxval=1.15)
                      + 0.02 * jax.random.normal(k2, xb.shape), 0, 1)
        if arch == "v2":
            sh = jax.random.randint(k3, (len(xb), 2), -8, 9)  # (dy, dx) px @128
            xb = jax.vmap(lambda im, s: jnp.roll(im, s, axis=(0, 1)))(xb, sh)
            d = jnp.stack([sh[:, 1], sh[:, 0]], -1).astype(jnp.float32) / 128.0
            yb = (yb.reshape(len(xb), 68, 2) + d[:, None, :]).reshape(len(xb), -1)
            # render-softness augmentation (round-5, VERDICT r4 weak #3):
            # head-only clips are raw 256² renders — softer than the GT
            # frames the detector trains on, which is what pushed the
            # heatmaps off-distribution on ~20% of head-only frames. With
            # p=0.35 the whole image round-trips through half resolution
            # (labels unchanged: blur is shift-free), teaching the
            # detector the render's frequency content, not just its
            # context.
            k6, k7 = jax.random.split(k5)
            soft = jax.image.resize(
                jax.image.resize(xb, (len(xb), 64, 64, 3), "linear"),
                xb.shape, "linear")
            usef = (jax.random.uniform(k6, (len(xb), 1, 1, 1)) < 0.35)
            xb = jnp.where(usef, soft, xb)

        def loss_fn(p):
            pred = det.apply(p, xb)
            return jnp.mean(jnp.abs(pred - yb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    predict = jax.jit(det.apply)
    # multi-step training dispatch: the per-iter host loop is tunnel-
    # dispatch-bound on TPU (~0.22 s/iter measured); keep the dataset
    # device-resident and scan CHUNK steps per dispatch instead
    Xd, Yd, Md = jnp.asarray(X), jnp.asarray(Y), jnp.asarray(M)
    CHUNK = 100

    @jax.jit
    def step_multi(params, opt, key):
        def body(carry, k):
            params, opt = carry
            ki = jax.random.fold_in(key, k)
            idx = jax.random.randint(jax.random.fold_in(ki, 1), (16,), 0, len(X))
            params, opt, loss = step(params, opt, Xd[idx], Yd[idx], Md[idx], ki)
            return (params, opt), loss

        (params, opt), losses = jax.lax.scan(
            body, (params, opt), jnp.arange(CHUNK))
        return params, opt, losses[-1]

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for it0 in range(0, args.iters, CHUNK):
        key, sub = jax.random.split(key)
        params, opt, loss = step_multi(params, opt, sub)
        it = it0 + CHUNK
        if it % 500 == 0:
            pv = predict(params, jnp.asarray(Xv))
            floor = float(jnp.mean(jnp.linalg.norm(
                (pv.reshape(-1, 68, 2) - Yv.reshape(-1, 68, 2)) * 512.0, axis=-1)))
            print(f"| it {it} train_l1={float(loss):.4f} "
                  f"val_floor={floor:.2f}px ({time.time() - t0:.0f}s)", flush=True)
    path = _detector_path(arch)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(lambda x: np.asarray(x), params)))
    print(f"| detector ({arch}) at {path}; held-out GT floor {floor:.2f}px @512")


def detect_lmd(frames_u8, gt_lms, arch: str = "v1", per_landmark: bool = False,
               with_conf: bool = False):
    """Package detect_lmd bound to this identity's trained detector files."""
    return _lmd.detect_lmd(frames_u8, gt_lms, _detector_path(arch), arch=arch,
                           per_landmark=per_landmark, with_conf=with_conf)


def detect_lms(frames_u8, arch: str = "v2"):
    """Package detect_lms bound to this identity's trained detector files."""
    return _lmd.detect_lms(frames_u8, _detector_path(arch), arch=arch)


SYNC_SCORER = os.path.join(DATA_DIR, "sync_scorer.msgpack")


def stage_train_sync(args):
    """Train the lip-sync confidence instrument (metrics/sync_scorer.py) on
    the identity's GT (audio, mouth-landmark) pairs — the in-repo analogue
    of the externally pretrained Sync-conf/SyncNet the reference's paper
    metrics rely on (README metric table; not downloadable here)."""
    import jax

    if not getattr(args, "tpu", False):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from genefaceplusplus_tpu.metrics import sync_confidence, train_sync_scorer
    from genefaceplusplus_tpu.metrics.sync_scorer import save_params

    ds = np.load(DATA, allow_pickle=True).tolist()
    hubert, f0 = _synth_audio_track()
    samples = list(ds["train_samples"])
    n_tr = len(samples)
    lms = np.stack([s["lms"] for s in samples])  # [T, 68, 2] normalised
    t0 = time.time()
    params = train_sync_scorer(hubert[: 2 * n_tr], lms, steps=args.iters,
                               log_every=500)
    save_params(params, SYNC_SCORER)
    # falsifiability report on the held-out tail
    val = list(ds["val_samples"])
    lms_v = np.stack([s["lms"] for s in val])
    hub_v = hubert[2 * n_tr:]
    aligned = sync_confidence(params, hub_v, lms_v)
    rng = np.random.RandomState(0)
    blocks = hub_v.reshape(-1, 2, hub_v.shape[-1])
    hub_shuf = blocks[rng.permutation(len(blocks))].reshape(hub_v.shape)
    shuffled = sync_confidence(params, hub_shuf, lms_v)
    out = {"iters": args.iters, "t_s": round(time.time() - t0, 1),
           "heldout_aligned": aligned["confidence"],
           "heldout_offset": aligned["offset"],
           "heldout_shuffled_control": shuffled["confidence"]}
    print(json.dumps(out))
    print(f"| sync scorer at {SYNC_SCORER}")


def _sync_report(res: dict, renders, hubert_seg, gt_lms):
    """Sync-confidence block for an eval: rendered frames scored via the
    v2 detector's landmarks against the driving audio, with the GT-lms
    ceiling and a shuffled-audio floor on the same window."""
    if not (os.path.exists(SYNC_SCORER) and os.path.exists(DETECTOR2)):
        return res
    import numpy as np

    from genefaceplusplus_tpu.metrics import sync_confidence
    from genefaceplusplus_tpu.metrics.sync_scorer import load_params

    params = load_params(SYNC_SCORER)
    pred_lms = detect_lms(renders, arch="v2")
    r = sync_confidence(params, hubert_seg, pred_lms)
    res["sync_conf"] = r["confidence"]
    res["sync_offset"] = r["offset"]
    gt = sync_confidence(params, hubert_seg, np.asarray(gt_lms))
    res["sync_conf_gt_ceiling"] = gt["confidence"]
    rng = np.random.RandomState(0)
    blocks = np.asarray(hubert_seg).reshape(-1, 2, np.asarray(hubert_seg).shape[-1])
    shuf = blocks[rng.permutation(len(blocks))].reshape(np.asarray(hubert_seg).shape)
    res["sync_conf_shuffled_floor"] = sync_confidence(
        params, shuf, pred_lms)["confidence"]
    return res


def _lmd_report(res: dict, renders, gts, lms):
    """Fill LMD keys for every trained instrument (v1, and v2 when present).

    The v2 instrument also reports region breakdowns on the ibug-68 layout:
    jawline 0-16 (lands on torso/background for head-only renders — an
    instrument-context region), inner face 17-67, and mouth 48-67 (the
    lip-sync region the reference's LMD claim is about)."""
    import numpy as np

    stack = np.stack(lms)
    if os.path.exists(DETECTOR):
        res["val_lmd_px_512"] = round(detect_lmd(renders, stack), 2)
        res["lmd_floor_px_512"] = round(detect_lmd(gts, stack), 2)
    if os.path.exists(DETECTOR2):
        err, conf = detect_lmd(renders, stack, arch="v2", per_landmark=True,
                               with_conf=True)
        floor, conf_gt = detect_lmd(gts, stack, arch="v2", per_landmark=True,
                                    with_conf=True)
        res["val_lmd_px_512_v2"] = round(float(err.mean()), 2)
        res["lmd_floor_px_512_v2"] = round(float(floor.mean()), 2)
        # heavy-tail check (VERDICT round-3 weak #3): per-frame mean error
        # quantiles. p90/p50 >= 2 on a clip means the detector lost the face
        # on a frame subset and the mean above overstates model error.
        pf = err.mean(axis=1)
        res["lmd_v2_p50"] = round(float(np.percentile(pf, 50)), 2)
        res["lmd_v2_p90"] = round(float(np.percentile(pf, 90)), 2)
        res["lmd_v2_tail_ratio"] = round(
            float(np.percentile(pf, 90) / max(np.percentile(pf, 50), 1e-6)), 2)
        for name, sl in (("inner", slice(17, 68)), ("mouth", slice(48, 68))):
            res[f"val_lmd_{name}_px_512_v2"] = round(float(err[:, sl].mean()), 2)
            res[f"lmd_floor_{name}_px_512_v2"] = round(float(floor[:, sl].mean()), 2)
        # instrument validity: heatmap peak prob per landmark. Low peaks on
        # renders with high peaks on GT mean the detector is off its
        # training distribution and the v2 numbers above overstate error
        # (soft-argmax centroid collapse); uniform map ~ 1/1024.
        res["lmd_v2_conf"] = round(float(conf.mean()), 4)
        res["lmd_v2_conf_floor"] = round(float(conf_gt.mean()), 4)
        res["lmd_v2_lowconf_frac"] = round(float((conf < 0.01).mean()), 4)
    return res


def _clip_start_frame(clip: str) -> int | None:
    """Global start-frame id of a committed clip, recovered from the eval
    JSON that produced it (stage_eval_a2m records held_out_start; the a2m
    all-holdout window starts BEFORE the val split, so remeasuring it
    against val-split GT would misalign by held_out_start - val_start)."""
    import glob as _glob

    base = os.path.basename(clip)
    for j in sorted(_glob.glob(os.path.join(WORKROOT, "*", "quality_eval*.json"))):
        try:
            with open(j) as f:
                d = json.load(f)
        except Exception:
            continue
        if os.path.basename(str(d.get("clip", ""))) == base and "held_out_start" in d:
            return int(d["held_out_start"])
    return None


def stage_lmd_remeasure(args):
    """Re-measure LMD (and, when the instruments exist, sync confidence) of
    a committed clip with every trained detector — lets a sharper instrument
    re-grade existing artifacts without re-rendering. Clips are side-by-side
    GT | render panels (stage_eval/stage_eval_torso/stage_eval_a2m); the
    right half is the render under test and the left half doubles as a
    compression-matched in-clip floor alongside the pristine dataset GT.

    Frame alignment: val-split clips start at the val boundary; the a2m
    all-holdout clip starts earlier (held_out_start, recovered from its
    eval JSON or overridable with --start). GT frames/landmarks are indexed
    from the GLOBAL train+val frame table so both cases grade correctly."""
    import cv2
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    ds = np.load(DATA, allow_pickle=True).tolist()
    # global frame table ordered by id (train 0..n, val n..T)
    table = {int(s["idx"]): s for s in ds["train_samples"] + ds["val_samples"]}
    val_start = min(int(s["idx"]) for s in ds["val_samples"])
    start = getattr(args, "start", None)
    if start is None:
        start = _clip_start_frame(args.clip)
    start = val_start if start is None else int(start)
    cap = cv2.VideoCapture(args.clip)
    renders, clip_gts = [], []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        f = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
        half = f.shape[1] // 2
        clip_gts.append(f[:, :half])
        renders.append(f[:, half:])
    avail = max(0, max(table) + 1 - start)
    n = min(len(renders), avail)
    if len(renders) != n:
        print(f"| WARNING: clip has {len(renders)} frames, {avail} GT frames "
              f"from start={start}; comparing first {n}")
    gts = [np.asarray(table[start + i]["gt_img"]) for i in range(n)]
    lms = [table[start + i]["lms"] for i in range(n)]
    res = _lmd_report({"clip": args.clip, "frames": n, "start_frame": start},
                      renders[:n], gts[:n], lms[:n])
    # compression-matched floor: same detectors on the clip's own GT half
    comp = _lmd_report({}, clip_gts[:n], gts[:n], lms[:n])
    for k, v in comp.items():
        if k.startswith("val_lmd"):
            res[k.replace("val_lmd", "clipgt_lmd")] = v
    # sync confidence on the same window (needs the cached audio track +
    # trained scorer). On a GT-DRIVEN clip this is the missing control for
    # the a2m sync number: motion is perfect by construction, so the score
    # isolates what detector-on-renders + render softness cost the
    # instrument; the clip-GT half gives the pixel-perfect-motion reading
    # under identical resize/compression.
    if os.path.exists(A2M_AUDIO) and os.path.exists(SYNC_SCORER):
        hub = np.load(A2M_AUDIO)["hubert"][2 * start: 2 * (start + n)]
        res2 = _sync_report({}, renders[:n], hub, lms[:n])
        res["sync_conf"] = res2.get("sync_conf")
        res["sync_offset"] = res2.get("sync_offset")
        res["sync_conf_gt_ceiling"] = res2.get("sync_conf_gt_ceiling")
        res["sync_conf_shuffled_floor"] = res2.get("sync_conf_shuffled_floor")
        gt_half = _sync_report({}, clip_gts[:n], hub, lms[:n])
        res["sync_conf_clipgt"] = gt_half.get("sync_conf")
        res["sync_offset_clipgt"] = gt_half.get("sync_offset")
    print(json.dumps(res))


# ---------------------------------------------------------------- eval
def stage_eval_curve(args):
    """Milestone PSNR/LMD curve over every retained checkpoint of a
    variant's head+SR run (VERDICT r3 item 2: the budget-vs-quality curve
    at the reference's own schedule scale, 10k milestones). One process:
    dataset load + render compile amortised across all milestones."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import re

    import jax.numpy as jnp
    import numpy as np

    from genefaceplusplus_tpu.training.trainer import _as_dict, _from_dict
    from genefaceplusplus_tpu.utils.ckpt import (
        get_all_ckpts, load_ckpt_file, restore_into)
    from genefaceplusplus_tpu.utils.rays import pixel_rays

    tr, va = _load_datasets()
    task = _build_task(args.variant, 50_000, tr, va)
    paths = sorted(get_all_ckpts(workdir(args.variant)),
                   key=lambda p: int(re.findall(r"steps_(\d+)\.ckpt", p)[0]))
    n_every = max(1, getattr(args, "every", 1))
    H, W = va.H, va.W
    max_frames = int(getattr(args, "frames", 0)) or len(va)
    idxs = np.linspace(0, len(va) - 1, min(max_frames, len(va))).astype(int)
    gts = [(va.load_image(int(i), "gt", full_res=True) * 255).astype(np.uint8)
           for i in idxs]
    lms = [va.samples[int(i)]["lms"] for i in idxs]
    task.validate(task.create_state(), max_frames=1)  # build _jit_val_sr once
    curve = []
    for path in paths[::n_every]:
        ckpt = load_ckpt_file(path)
        state = _from_dict(task.create_state(),
                           restore_into(_as_dict(task.create_state()),
                                        ckpt["state_dict"]))
        task.load_extra_state(ckpt.get("extra_state", {}))
        step = int(ckpt["global_step"])
        renders, psnrs = [], []
        for i in idxs:
            i = int(i)
            pose = jnp.asarray(va.frame_pose(i)[None])
            ro, rd, _ = pixel_rays(pose, va.intrinsics, H, W)
            gid = max(0, min(int(va.frame_ids[i]),
                             task.cfg.individual_embedding_num - 1))
            sr = np.asarray(task._jit_val_sr(
                state.params, ro[0], rd[0],
                jnp.asarray(va.frame_cond_window(i)),
                jnp.asarray(va.eye_area_percents[i:i + 1]),
                jnp.asarray(gid, jnp.int32), task.occupancy,
                jnp.asarray(np.asarray(_val_bg(va, i), np.float32).reshape(-1, 3))))
            gt2x = gts[list(idxs).index(i)].astype(np.float32) / 255.0
            mse = float(np.mean((sr - gt2x) ** 2))
            psnrs.append(-10 * np.log10(max(mse, 1e-10)))
            renders.append((np.clip(sr, 0, 1) * 255).astype(np.uint8))
        row = {"step": step, "val_sr_psnr_512": round(float(np.mean(psnrs)), 2)}
        row = _lmd_report(row, renders, gts, lms)
        curve.append(row)
        print(json.dumps(row), flush=True)
    out = os.path.join(workdir(args.variant), "quality_curve.json")
    with open(out, "w") as f:
        json.dump(curve, f, indent=2)
    print(f"| curve ({len(curve)} milestones) at {out}")


def stage_eval(args):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from genefaceplusplus_tpu.training.trainer import _as_dict, _from_dict
    from genefaceplusplus_tpu.utils.ckpt import get_last_checkpoint, restore_into

    tr, va = _load_datasets()
    task = _build_task(args.variant, 50_000, tr, va)
    state = task.create_state()
    want = getattr(args, "ckpt_step", 0) or None
    ckpt, path = get_last_checkpoint(workdir(args.variant), steps=want)
    assert ckpt is not None, (
        f"no checkpoint in {workdir(args.variant)}"
        + (f" at step {want} (milestones are kept every 10k)" if want else ""))
    state = _from_dict(task.create_state(),
                       restore_into(_as_dict(state), ckpt["state_dict"]))
    task.load_extra_state(ckpt.get("extra_state", {}))
    step = int(ckpt["global_step"])
    print(f"| {args.variant} ckpt @ step {step}: {path}")

    # render every held-out frame at 512² through the SR head
    import jax.numpy as jnp

    from genefaceplusplus_tpu.utils.rays import pixel_rays

    task.validate(state, max_frames=1)  # builds _jit_val_sr
    renders, gts, lms = [], [], []
    raw_psnrs, sr_psnrs = [], []
    H, W = va.H, va.W
    for i in range(len(va)):
        gt2x = va.load_image(i, "gt", full_res=True)
        pose = jnp.asarray(va.frame_pose(i)[None])
        ro, rd, _ = pixel_rays(pose, va.intrinsics, H, W)
        gid = max(0, min(int(va.frame_ids[i]),
                         task.cfg.individual_embedding_num - 1))
        sr = np.asarray(task._jit_val_sr(
            state.params, ro[0], rd[0], jnp.asarray(va.frame_cond_window(i)),
            jnp.asarray(va.eye_area_percents[i:i + 1]),
            jnp.asarray(gid, jnp.int32), task.occupancy,
            jnp.asarray(np.asarray(_val_bg(va, i), np.float32).reshape(-1, 3))))
        mse = float(np.mean((sr - gt2x) ** 2))
        sr_psnrs.append(-10 * np.log10(max(mse, 1e-10)))
        renders.append((sr * 255).astype(np.uint8))
        gts.append((gt2x * 255).astype(np.uint8))
        lms.append(va.samples[i]["lms"])

    res = {
        "variant": args.variant,
        "step": step,
        "val_sr_psnr_512": round(float(np.mean(sr_psnrs)), 2),
        "n_val_frames": len(va),
    }
    res = _lmd_report(res, renders, gts, lms)

    # clip artifact: GT | render side by side, 25 fps
    if args.clip:
        from genefaceplusplus_tpu.data.video import StreamingVideoWriter

        os.makedirs(os.path.dirname(args.clip), exist_ok=True)
        wtr = StreamingVideoWriter(args.clip, fps=25)
        for g, r in zip(gts, renders):
            wtr.append(np.concatenate([g, r], axis=1).astype(np.float32) / 255.0)
        wtr.close()
        res["clip"] = args.clip
    print(json.dumps(res))
    out_json = os.path.join(workdir(args.variant), "quality_eval.json")
    with open(out_json, "w") as f:
        json.dump(res, f, indent=2)


def stage_parity(args):
    """Equal-STEP-budget fourier vs tiledgrid head-to-head at 128² head res
    (+2x SR -> 256²).

    Why not at the flagship 256²: the tiled hash grid is structurally
    gather-bound on TPU — measured 63× slower per point and a TPU-worker
    crash at 256² (docs/QUALITY_PARITY.md round-2 table) — so the reference-
    parity encoder cannot run the 50k-step 256² schedule in bounded chip
    time. 128² is the largest operating point where an equal-step comparison
    is tractable; wall-clock per step is reported so the chip-time trade is
    explicit."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from genefaceplusplus_tpu.config import Config
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
    from genefaceplusplus_tpu.data.synthetic_face import cached_synthetic_face
    from genefaceplusplus_tpu.training.trainer import Trainer

    data256 = os.path.join(DATA_DIR, f"synth{args.size}", "trainval_dataset.npy")
    cached_synthetic_face(data256, num_frames=args.frames, size=args.size)
    tr = RADNeRFDataset(data256, split="train", smo_win_size=3, with_sr=True)
    va = RADNeRFDataset(data256, split="val", smo_win_size=3, with_sr=True,
                        smooth_eval_camera=False)

    results = {}
    for variant in args.variants.split(","):
        task = _build_task(variant, args.steps, tr, va)
        wd = os.path.join(WORKROOT, f"synth{args.size}_{variant}")
        # n_frames must match _build_task's model (len(tr)+len(va)) — the
        # saved ckpt config rebuilds the embedding table at restore time
        cfg = dict(_train_config(variant, len(tr) + len(va)))
        cfg["video_id"] = f"synth{args.size}"
        trainer = Trainer(
            task, wd, config=Config(cfg), max_updates=args.steps,
            val_check_interval=max(500, args.steps // 5),
            tb_log_interval=100, num_ckpt_keep=1, update_extra_interval=16,
        )
        t0 = time.time()
        state = trainer.fit(resume=not args.reset)
        wall = time.time() - t0

        # held-out eval: 256² SR PSNR + LMD on every val frame
        import jax.numpy as jnp

        from genefaceplusplus_tpu.utils.rays import pixel_rays

        task.validate(state, max_frames=1)  # builds _jit_val_sr
        renders, gts, lms, sr_psnrs = [], [], [], []
        H, W = va.H, va.W
        for i in range(len(va)):
            gt2x = va.load_image(i, "gt", full_res=True)
            pose = jnp.asarray(va.frame_pose(i)[None])
            ro, rd, _ = pixel_rays(pose, va.intrinsics, H, W)
            gid = max(0, min(int(va.frame_ids[i]),
                             task.cfg.individual_embedding_num - 1))
            sr = np.asarray(task._jit_val_sr(
                state.params, ro[0], rd[0], jnp.asarray(va.frame_cond_window(i)),
                jnp.asarray(va.eye_area_percents[i:i + 1]),
                jnp.asarray(gid, jnp.int32), task.occupancy,
                jnp.asarray(np.asarray(_val_bg(va, i), np.float32).reshape(-1, 3))))
            mse = float(np.mean((sr - gt2x) ** 2))
            sr_psnrs.append(-10 * np.log10(max(mse, 1e-10)))
            renders.append((np.clip(sr, 0, 1) * 255).astype(np.uint8))
            gts.append((np.asarray(gt2x) * 255).astype(np.uint8))
            lms.append(va.samples[i]["lms"])
        res = {
            "steps": args.steps,
            "wall_min": round(wall / 60.0, 1),
            "sec_per_step": round(wall / max(1, args.steps), 3),
            "val_sr_psnr_256": round(float(np.mean(sr_psnrs)), 2),
        }
        res = _lmd_report(res, renders, gts, lms)
        results[variant] = res
        print(f"| parity {variant}: {json.dumps(res)}")
    out = os.path.join(WORKROOT, "parity128_results.json")
    # merge with prior runs: the legs run separately (the tiledgrid leg is
    # ~70x slower), so a single-variant invocation must not drop the other
    # variant's stored result
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(merged))


def stage_eval_torso(args):
    """Flagship-composite eval: trained head (frozen) + trained torso + 2x SR
    -> 512² on every held-out frame; PSNR + LMD + side-by-side clip. This is
    the production inference composition (models/full_renderer.py), i.e. the
    path GeneFaceInfer ships."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from genefaceplusplus_tpu.config import Config
    from genefaceplusplus_tpu.models.full_renderer import render_full_frame
    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.models.superresolution import Superresolution
    from genefaceplusplus_tpu.training.tasks.torso_task import TorsoNeRFTask
    from genefaceplusplus_tpu.utils.ckpt import get_last_checkpoint, restore_into
    from genefaceplusplus_tpu.utils.rays import get_bg_coords, pixel_rays

    tr, va = _load_datasets()
    cfg = Config(_torso_cfg(args.variant, len(tr) + len(va)))
    task = TorsoNeRFTask(tr, _model_cfg(args.variant, len(tr) + len(va)), cfg)
    task.opts = RenderOptions(max_steps=16, num_coarse=48, num_samples=16,
                              color_topk=args.color_topk,
                              compact_frac=args.compact_frac)

    # torso params + 2D occupancy grid from the torso stage ckpt
    tckpt, tpath = get_last_checkpoint(workdir(args.variant) + "_torso")
    assert tckpt is not None, f"no torso ckpt in {workdir(args.variant)}_torso"
    tstate = tckpt["state_dict"]
    torso_params = restore_into(
        task.torso_model.init(
            jax.random.PRNGKey(0), jnp.zeros((8, 2)), jnp.zeros((1, 68, 2)),
            jnp.zeros(task.torso_cfg.torso_individual_embedding_dim),
            jnp.zeros((8, 3)), jnp.zeros((8, 1))),
        tstate["torso_params"])
    task.load_extra_state(tckpt.get("extra_state", {}))
    print(f"| torso ckpt @ step {int(tckpt['global_step'])}: {tpath}")

    # SR params from the head-stage (SR task) ckpt
    hckpt, _ = get_last_checkpoint(workdir(args.variant))
    sr_model = Superresolution(channels=3, input_resolution=tr.H,
                               dtype=jnp.bfloat16)
    sr_params = hckpt["state_dict"]["params"]["sr"]

    H, W = va.H, va.W
    bg_coords = jnp.asarray(get_bg_coords(H, W)[0])
    bg_color = jnp.asarray(np.asarray(tr.bg_img, np.float32).reshape(-1, 3))

    # every array is a jit ARGUMENT (numpy ckpt leaves closed over would be
    # constant-folded / break tracer indexing — the bench round-1 pathology)
    @jax.jit
    def render(hp_, tp_, sp_, occ_, grid2d_, bgc_, ro, rd, cond, eye, gid, lm68):
        out = render_full_frame(
            task.head_model, hp_, ro, rd, cond, occ_,
            bg_color=bgc_, opts=task.opts, image_hw=(H, W),
            eye_area_percent=eye, index=gid,
            torso_model=task.torso_model, torso_params=tp_,
            bg_coords=bg_coords, lm68=lm68,
            occupancy_2d=grid2d_,
            mean_density_torso=task.mean_density_torso,
            sr_model=sr_model, sr_params=sp_,
        )
        return out.sr_rgb_map, out.rgb_map

    renders, gts, lms = [], [], []
    sr_psnrs, raw_psnrs = [], []
    for i in range(len(va)):
        gt2x = va.load_image(i, "gt", full_res=True)
        gt = va.load_image(i, "gt")
        pose = jnp.asarray(va.frame_pose(i)[None])
        ro, rd, _ = pixel_rays(pose, va.intrinsics, H, W)
        gid = max(0, min(int(va.frame_ids[i]),
                         task.head_cfg.individual_embedding_num - 1))
        sr, raw = render(
            task.head_params, torso_params, sr_params,
            task.occupancy, task.torso_grid, bg_color,
            ro[0], rd[0], jnp.asarray(va.frame_cond_window(i)),
            jnp.asarray(va.eye_area_percents[i:i + 1]),
            jnp.asarray(gid, jnp.int32),
            jnp.asarray(task._frame_lm68(i, va), jnp.float32))
        sr = np.asarray(sr, np.float32)
        mse = float(np.mean((sr - gt2x) ** 2))
        sr_psnrs.append(-10 * np.log10(max(mse, 1e-10)))
        mse_r = float(np.mean((np.asarray(raw).reshape(H, W, 3) - gt) ** 2))
        raw_psnrs.append(-10 * np.log10(max(mse_r, 1e-10)))
        renders.append((np.clip(sr, 0, 1) * 255).astype(np.uint8))
        gts.append((np.asarray(gt2x) * 255).astype(np.uint8))
        lms.append(va.samples[i]["lms"])

    res = {
        "variant": args.variant + "+torso",
        "torso_step": int(tckpt["global_step"]),
        "color_topk": args.color_topk,
        "compact_frac": args.compact_frac,
        "val_sr_psnr_512_composite": round(float(np.mean(sr_psnrs)), 2),
        "val_raw_psnr_composite": round(float(np.mean(raw_psnrs)), 2),
        "n_val_frames": len(va),
    }
    res = _lmd_report(res, renders, gts, lms)
    if args.clip:
        from genefaceplusplus_tpu.data.video import StreamingVideoWriter

        os.makedirs(os.path.dirname(args.clip), exist_ok=True)
        wtr = StreamingVideoWriter(args.clip, fps=25)
        for g, r in zip(gts, renders):
            wtr.append(np.concatenate([g, r], axis=1).astype(np.float32) / 255.0)
        wtr.close()
        res["clip"] = args.clip
    print(json.dumps(res))
    tag = ""
    if args.color_topk or args.compact_frac:
        tag = f"_k{args.color_topk}_c{args.compact_frac}"
    with open(os.path.join(workdir(args.variant) + "_torso",
                           f"quality_eval{tag}.json"), "w") as f:
        json.dump(res, f, indent=2)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="stage", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--frames", type=int, default=450)
    m = sub.add_parser("measure")
    m.add_argument("--variants", type=str, default="fourier,tiledgrid")
    m.add_argument("--steps", type=int, default=8)
    t = sub.add_parser("train")
    t.add_argument("--variant", type=str, required=True)
    t.add_argument("--steps", type=int, default=50_000)
    t.add_argument("--val_interval", type=int, default=2500)
    t.add_argument("--reset", action="store_true")
    tt = sub.add_parser("train-torso")
    tt.add_argument("--variant", type=str, required=True)
    tt.add_argument("--steps", type=int, default=25_000)
    tt.add_argument("--val_interval", type=int, default=2500)
    tt.add_argument("--reset", action="store_true")
    ta = sub.add_parser("train-a2m")
    ta.add_argument("--steps", type=int, default=30_000)
    ta.add_argument("--val_interval", type=int, default=2500)
    ta.add_argument("--reset", action="store_true")
    tp = sub.add_parser("train-postnet")
    tp.add_argument("--steps", type=int, default=8000)
    tp.add_argument("--val_interval", type=int, default=1000)
    tp.add_argument("--reset", action="store_true")
    ea = sub.add_parser("eval-a2m")
    ea.add_argument("--variant", type=str, default="fourier")
    ea.add_argument("--clip", type=str, default="")
    ea.add_argument("--frames", type=int, default=0)
    ea.add_argument("--postnet", action="store_true")
    ea.add_argument("--temperature", type=float, default=0.0)
    ea.add_argument("--seed", type=int, default=None)
    ea.add_argument("--tag", type=str, default="",
                    help="suffix for the written quality_eval JSON")
    ea.add_argument("--all_holdout", action="store_true",
                    help="grade the full 64-frame a2m hold-out (audio unseen "
                         "by a2m); PSNR additionally reported on the strict "
                         "renderer-val subset")
    pab = sub.add_parser("postnet-ab")
    pab.add_argument("--variant", type=str, default="fourier")
    pab.add_argument("--temperature", type=float, default=0.2)
    pab.add_argument("--seeds", type=str, default="0,1,2")
    pab.add_argument("--frames", type=int, default=0)
    ts_ = sub.add_parser("train-sync")
    ts_.add_argument("--iters", type=int, default=2000)
    ts_.add_argument("--tpu", action="store_true")
    l = sub.add_parser("lmd")
    l.add_argument("--iters", type=int, default=3000)
    l.add_argument("--arch", type=str, default="v1", choices=["v1", "v2"])
    l.add_argument("--tpu", action="store_true",
                   help="train the detector on the accelerator (default CPU "
                        "to never contend with in-flight TPU runs)")
    lr = sub.add_parser("lmd-remeasure")
    lr.add_argument("--clip", type=str, required=True)
    lr.add_argument("--start", type=int, default=None,
                    help="global start-frame id of the clip (default: "
                         "recovered from its eval JSON, else val start)")
    ec = sub.add_parser("eval-curve")
    ec.add_argument("--variant", type=str, default="fourier")
    ec.add_argument("--every", type=int, default=1,
                    help="evaluate every Nth retained checkpoint")
    ec.add_argument("--frames", type=int, default=0,
                    help="cap val frames per milestone (0 = all)")
    e = sub.add_parser("eval")
    e.add_argument("--variant", type=str, required=True)
    e.add_argument("--clip", type=str, default="")
    e.add_argument("--ckpt_step", type=int, default=0,
                   help="evaluate this milestone checkpoint (0 = latest) — "
                        "for corrected-instrument PSNR/LMD curves")
    et = sub.add_parser("eval-torso")
    et.add_argument("--variant", type=str, required=True)
    et.add_argument("--clip", type=str, default="")
    et.add_argument("--color_topk", type=int, default=0)
    et.add_argument("--compact_frac", type=float, default=0.0)
    pa = sub.add_parser("parity")
    pa.add_argument("--variants", type=str, default="fourier,tiledgrid")
    pa.add_argument("--steps", type=int, default=2500)
    pa.add_argument("--frames", type=int, default=450)
    pa.add_argument("--size", type=int, default=256)
    pa.add_argument("--reset", action="store_true")
    args = p.parse_args()
    {"gen": stage_gen, "measure": stage_measure, "train": stage_train,
     "train-torso": stage_train_torso, "train-a2m": stage_train_a2m,
     "train-postnet": stage_train_postnet, "train-sync": stage_train_sync,
     "eval-a2m": stage_eval_a2m, "postnet-ab": stage_postnet_ab,
     "lmd": stage_lmd,
     "lmd-remeasure": stage_lmd_remeasure, "eval": stage_eval,
     "eval-torso": stage_eval_torso, "eval-curve": stage_eval_curve,
     "parity": stage_parity}[args.stage](args)


if __name__ == "__main__":
    main()
