"""Stage decomposition of the CURRENT production frame (crops active).

Measures the bench_full scene with components toggled off to attribute
ms/frame to head / torso / SR.  Run on the TPU: python scripts/prof_stages.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.full_renderer import (
    auto_head_bbox, auto_head_crop, auto_torso_crop, render_full_frame)
from genefaceplusplus_tpu.models.radnerf_torso import TorsoConfig, TorsoField
from genefaceplusplus_tpu.models.renderer import RenderOptions
from genefaceplusplus_tpu.models.superresolution import Superresolution
from genefaceplusplus_tpu.utils.rays import get_bg_coords, get_rays


def setup():
    cfg = RADNeRFConfig()
    head = RADNeRF(cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
    head_params = head.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    H = W = 256
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    g = cfg.grid_size
    # the bench.py occupancies (same scenes => the stage attribution
    # decomposes the headline numbers): May-calibrated head by default,
    # BENCH_SCENE=fullframe for the crop-free worst case
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    if os.environ.get("BENCH_SCENE", "head") == "fullframe":
        occupancy = jnp.asarray((xx ** 2 + (2 * yy) ** 2 + zz ** 2) < 0.6)
    else:
        occupancy = jnp.asarray((xx ** 2 + (2.2 * yy) ** 2 + (1.4 * zz) ** 2) < 0.16)
    return cfg, head, head_params, cond, rays["rays_o"][0], rays["rays_d"][0], occupancy, H, W, pose


def timeit(fn, args, n_frames, label, reps=5):
    float(fn(*args))
    best = float("inf")
    for k in range(1, reps + 1):
        a2 = list(args)
        a2[-1] = args[-1] + 0.01 * k
        t0 = time.perf_counter()
        float(fn(*a2))
        best = min(best, time.perf_counter() - t0 - 0.026)
    ms = best / n_frames * 1000
    print(f"{label:44s} {ms:7.2f} ms/frame  {1000/ms:7.1f} fps")
    return ms


def run_variant(with_torso=True, with_sr=True, n_frames=50):
    cfg, head, head_params, cond, ro, rd, occ, H, W, pose = setup()
    torso = TorsoField(TorsoConfig())
    bg_coords = get_bg_coords(H, W)[0]
    lm68 = jax.random.uniform(jax.random.PRNGKey(1), (1, 68, 2))
    torso_params = torso.init(jax.random.PRNGKey(2), bg_coords[:8], lm68, jnp.zeros(8),
                              jnp.zeros((8, 3)), jnp.zeros((8, 1)))
    sr = Superresolution(channels=3, input_resolution=H, dtype=jnp.bfloat16)
    sr_params = sr.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3)))
    g = cfg.grid_size
    if os.environ.get("BENCH_SCENE", "head") == "fullframe":
        occ2d = jnp.ones((g, g)) * 0.5  # torso everywhere (bench.py fullframe)
        torso_crop = None
    else:
        occ2d = jnp.zeros((g, g)).at[int(0.45 * g):, int(0.15 * g):int(0.85 * g)].set(0.5)
        torso_crop = auto_torso_crop(occ2d, H, W)
    bg_color = jnp.ones((H * W, 3))
    sr_crop = sr_bg = None
    if with_sr and with_torso and torso_crop is not None:
        from genefaceplusplus_tpu.models.full_renderer import auto_sr_crop
        bbox = auto_head_bbox(occ, pose[None], (2.0 * W, 2.0 * H, W / 2, H / 2),
                              H, W, bound=cfg.bound)
        sr_crop = auto_sr_crop(bbox, torso_crop, H, W)
        if sr_crop is not None:
            sr_bg = jax.jit(lambda p, b: jnp.clip(sr.apply(p, b), 0.0, 1.0))(
                sr_params, bg_color.reshape(1, H, W, 3))[0]
    opts = RenderOptions(num_coarse=48, num_samples=10, T_thresh=1e-2,
                         march_mode="interval", entry_mode="probe")
    head_crop = auto_head_crop(occ, pose[None], (2.0 * W, 2.0 * H, W / 2, H / 2),
                               H, W, bound=cfg.bound)

    @jax.jit
    def run(head_params, torso_params, sr_params, occ, ro, rd,
            bg_coords, bg_color, lm68, occ2d, cond):
        def body(carry, i):
            c = cond + 1e-3 * i + 1e-12 * carry
            out = render_full_frame(
                head, head_params, ro, rd, c, occ,
                bg_color=bg_color, opts=opts, image_hw=(H, W),
                torso_model=torso if with_torso else None,
                torso_params=torso_params if with_torso else None,
                bg_coords=bg_coords, lm68=lm68,
                occupancy_2d=occ2d if with_torso else None,
                sr_model=sr if with_sr else None,
                sr_params=sr_params if with_sr else None,
                head_crop=head_crop, torso_crop=torso_crop if with_torso else None,
                sr_crop=sr_crop, sr_bg=sr_bg,
            )
            val = out.sr_rgb_map.sum() if with_sr else out.rgb_map.sum()
            return val, ()
        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(n_frames, dtype=jnp.float32))
        return tot

    args = (head_params, torso_params, sr_params, occ, ro, rd,
            bg_coords, bg_color, lm68, occ2d, cond)
    label = f"head{'+torso' if with_torso else ''}{'+SR' if with_sr else ''}"
    return timeit(run, args, n_frames, label)


if __name__ == "__main__":
    full = run_variant(True, True)
    no_sr = run_variant(True, False)
    head_only = run_variant(False, False)
    print(f"\nattribution:  head={head_only:.2f}  torso={no_sr-head_only:.2f}  "
          f"SR={full-no_sr:.2f}  (total {full:.2f} ms/frame)")
