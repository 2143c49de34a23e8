"""Round-5 bisect of the audio-driven ghost face (VERDICT r4 item 1).

Dumps the condition statistics at the exact point they enter the renderer
(pipeline's forward_audio2secc output vs the dataset's stored normalized
conds — the space the head field trained on), then renders ONE held-out
frame under three conditions:
  (a) GT cond (dataset frame_cond_window — known-good, opaque face)
  (b) raw a2m prediction normalized with the dataset stats, no pipeline
      post-processing (no LLE / blink / region freeze / clamp)
  (c) the full pipeline cond as shipped (batch["cond"])
and reports mean alpha (acc_map) + PSNR per variant. Whichever hop kills
the alpha is the bug.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quality_production import _load_datasets, _synth_audio_track, workdir

from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer, default_inp


def stats(name, x):
    x = np.asarray(x, np.float32)
    print(f"| {name:34s} shape={tuple(x.shape)} mean={x.mean():+.4f} "
          f"std={x.std():.4f} min={x.min():+.3f} max={x.max():+.3f} "
          f"absmax={np.abs(x).max():.3f}")


def main():
    tr, va = _load_datasets()
    hubert, f0 = _synth_audio_track()
    infer = GeneFaceInfer(
        audio2secc_dir=workdir("a2m"),
        head_model_dir=workdir("fourier"),
        torso_model_dir=None,
        dataset=tr,
    )
    ds_np = tr.ds
    T_total = len(hubert) // 2
    val_ids = sorted(int(v) for v in va.frame_ids)
    s = val_ids[0]
    L = 8
    id2src = {}
    for dsx in (tr, va):
        for k, fid in enumerate(dsx.frame_ids):
            id2src[int(fid)] = (dsx, k)
    srcs = [id2src[s + i] for i in range(L)]
    batch = {
        "hubert": hubert[2 * s: 2 * (s + L)],
        "f0": f0[2 * s: 2 * (s + L)],
        "T": L,
        "poses": np.stack([dsx.frame_pose(k) for dsx, k in srcs]),
        "eulers": np.asarray(ds_np["euler"])[s: s + L],
        "transs": np.asarray(ds_np["trans"])[s: s + L],
    }
    inp = default_inp(blink_mode="period", temperature=0.0, lle_percent=0.2,
                      mouth_amp=0.4)

    # ---- raw a2m prediction, replicated from forward_audio2secc ----
    a2m_batch = {
        "audio": jnp.asarray(batch["hubert"])[None],
        "f0": jnp.asarray(batch["f0"])[None],
        "y_mask": jnp.ones((1, L)),
        "mouth_amp": jnp.full((1, 1), 0.4),
    }
    pred_fn = jax.jit(lambda p, b, r: infer.a2m_model.apply(
        p, b, train=False, temperature=0.0, rng=r))
    pred, _ = pred_fn(infer.a2m_params, a2m_batch, jax.random.PRNGKey(0))
    pred = np.asarray(pred[0])  # [L, 204]

    gt_idexp = np.asarray(ds_np["idexp_lm3d"], np.float32).reshape(-1, 68, 3)[s: s + L]
    mean = np.asarray(tr.idexp_lm3d_mean, np.float32).reshape(1, 68, 3)
    std = np.asarray(tr.idexp_lm3d_std, np.float32).reshape(1, 68, 3)

    stats("GT idexp_lm3d (raw x10)", gt_idexp)
    stats("a2m pred (raw x10)", pred.reshape(L, 68, 3))
    stats("|pred - GT| raw", np.abs(pred.reshape(L, 68, 3) - gt_idexp))

    gt_norm = (gt_idexp - mean) / std
    pred_norm = (pred.reshape(L, 68, 3) - mean) / std
    stats("GT cond (normalized)", gt_norm)
    stats("a2m cond (normalized, no post)", pred_norm)
    stats("|cond delta| normalized", np.abs(pred_norm - gt_norm))

    # dataset's own stored conds for these frames (what training saw) —
    # conds_all is timeline-indexed, so index by global frame id
    stored = tr.conds_all[s: s + L]  # [L, cond_win, C]
    stats("stored conds_all (train space)", stored)
    d = np.abs(stored.reshape(L, 68, 3) - gt_norm)
    stats("|stored - recomputed GT norm|", d)

    # ---- full pipeline cond ----
    b2 = dict(batch)
    b2 = infer.forward_audio2secc(b2, inp)
    pipe_cond = b2["cond"].reshape(L, 68, 3)
    stats("pipeline cond (shipped)", pipe_cond)
    stats("|pipeline - GT norm|", np.abs(pipe_cond - gt_norm))
    stats("|pipeline - a2m norm|", np.abs(pipe_cond - pred_norm))

    # ---- render one frame under each cond ----
    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.models.full_renderer import render_full_frame
    from genefaceplusplus_tpu.utils.rays import pixel_rays
    from genefaceplusplus_tpu.utils.audio_features import get_audio_features_batch

    dsx, k = srcs[0]
    H, W = dsx.H, dsx.W
    pose = jnp.asarray(dsx.frame_pose(k)[None])
    ro, rd, _ = pixel_rays(pose, tuple(dsx.intrinsics), H, W)
    bg_color = jnp.asarray(np.asarray(tr.bg_img, np.float32).reshape(-1, 3))
    opts = RenderOptions(num_coarse=48, num_samples=10, entry_mode="probe")
    gt2x = dsx.load_image(k, "gt", full_res=True)

    from functools import partial

    @partial(jax.jit, static_argnames=("o",))
    def render(hp, cond, eye, o):
        out = render_full_frame(
            infer.head_model, hp, ro[0], rd[0], cond, infer.occupancy,
            bg_color=bg_color, opts=o, image_hw=(H, W),
            eye_area_percent=eye, index=0,
            sr_model=infer.sr_model, sr_params=infer.sr_params,
        )
        img = out.sr_rgb_map if out.sr_rgb_map is not None else out.rgb_map.reshape(H, W, 3)
        return img, out.weights_sum

    eye_gt = jnp.asarray(dsx.eye_area_percents[k:k + 1])
    variants = {
        "GT frame_cond_window": (jnp.asarray(dsx.frame_cond_window(k)), eye_gt),
        "a2m norm (no post)": (get_audio_features_batch(
            jnp.asarray(pred_norm.reshape(L, 1, 204)), jnp.arange(L),
            infer.head_cfg.smo_win_size)[0], eye_gt),
        "pipeline shipped": (get_audio_features_batch(
            jnp.asarray(b2["cond"]), jnp.arange(L),
            infer.head_cfg.smo_win_size)[0],
            jnp.asarray(b2["eye_area_percent"][0:1])),
    }
    variants["zero cond (control)"] = (
        jnp.zeros_like(variants["GT frame_cond_window"][0]), eye_gt)
    opt_sets = {
        "pipe(probe,S10)": opts,
        "eval(aabb,S16)": RenderOptions(num_coarse=48, num_samples=16),
    }
    out = {}
    for oname, o in opt_sets.items():
        prev_img = None
        for name, (cond, eye) in variants.items():
            img, acc = render(infer.head_params, cond, eye, o)
            img = np.asarray(img, np.float32)
            mse = float(np.mean((img - np.asarray(gt2x)) ** 2))
            psnr = -10 * np.log10(max(mse, 1e-10))
            out[f"{oname}/{name}"] = {
                "mean_alpha": float(np.mean(np.asarray(acc))),
                "psnr_512": round(psnr, 2)}
            dprev = (float(np.abs(img - prev_img).max()) if prev_img is not None
                     else float("nan"))
            prev_img = img
            print(f"| render[{oname}][{name:24s}] "
                  f"mean_alpha={out[f'{oname}/{name}']['mean_alpha']:.4f} "
                  f"psnr={psnr:.2f} max|img-prev|={dprev:.5f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
