"""XLA cost analysis of one full-pipeline frame on CPU (no TPU needed).

BENCH_SCENE=fullframe (default here) or the May crop scene.

flops of the lowered HLO are platform-independent enough to bound the
arithmetic in the 11.5 ms TPU frame: implied TFLOP/s = flops / frame_time
vs the v5e peak tells whether the crop-free worst case is compute-bound
(near roofline -> documented negative for VERDICT #9) or overhead-bound.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_SCENE", "fullframe")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from prof_stages import setup

from genefaceplusplus_tpu.models.full_renderer import render_full_frame
from genefaceplusplus_tpu.models.radnerf_torso import TorsoConfig, TorsoField
from genefaceplusplus_tpu.models.renderer import RenderOptions
from genefaceplusplus_tpu.models.superresolution import Superresolution
from genefaceplusplus_tpu.utils.rays import get_bg_coords

cfg, head, head_params, cond, ro, rd, occ, H, W, pose = setup()
torso = TorsoField(TorsoConfig())
bg_coords = get_bg_coords(H, W)[0]
lm68 = jax.random.uniform(jax.random.PRNGKey(1), (1, 68, 2))
torso_params = torso.init(jax.random.PRNGKey(2), bg_coords[:8], lm68, jnp.zeros(8),
                          jnp.zeros((8, 3)), jnp.zeros((8, 1)))
sr = Superresolution(channels=3, input_resolution=H, dtype=jnp.bfloat16)
sr_params = sr.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3)))
g = cfg.grid_size
SCENE = os.environ.get("BENCH_SCENE", "fullframe")
if SCENE == "fullframe":
    occ2d = jnp.ones((g, g)) * 0.5
    head_crop = torso_crop = sr_crop = None
    sr_bg = None
else:  # May-calibrated crop scene, same setup as bench_full
    from genefaceplusplus_tpu.models.full_renderer import (
        auto_head_bbox, auto_head_crop, auto_sr_crop, auto_torso_crop)
    occ2d = jnp.zeros((g, g)).at[int(0.45 * g):, int(0.15 * g):int(0.85 * g)].set(0.5)
    intr = (2.0 * W, 2.0 * H, W / 2, H / 2)
    head_crop = auto_head_crop(occ, pose[None], intr, H, W, bound=cfg.bound)
    torso_crop = auto_torso_crop(occ2d, H, W)
    bbox = auto_head_bbox(occ, pose[None], intr, H, W, bound=cfg.bound)
    sr_crop = auto_sr_crop(bbox, torso_crop, H, W)
    sr_bg = (jnp.zeros((2 * H, 2 * W, 3)) if sr_crop is not None else None)
opts = RenderOptions(num_samples=10, T_thresh=1e-2, march_mode="interval",
                     entry_mode="probe")


def frame(head_params, torso_params, sr_params, cond, occ, ro, rd,
          bg_coords, bg_color, lm68, occ2d):
    out = render_full_frame(
        head, head_params, ro, rd, cond, occ, bg_color=bg_color, opts=opts,
        image_hw=(H, W), torso_model=torso, torso_params=torso_params,
        bg_coords=bg_coords, lm68=lm68, occupancy_2d=occ2d,
        sr_model=sr, sr_params=sr_params, head_crop=head_crop,
        torso_crop=torso_crop, sr_crop=sr_crop, sr_bg=sr_bg)
    return out.sr_rgb_map


bg_color = jnp.ones((H * W, 3))
args = (head_params, torso_params, sr_params, cond, occ, ro, rd,
        bg_coords, bg_color, lm68, occ2d)
lowered = jax.jit(frame).lower(*args)
compiled = lowered.compile()
ca = compiled.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
flops = ca.get("flops", float("nan"))
bytes_ = ca.get("bytes accessed", float("nan"))
print(f"{SCENE} frame: flops={flops:.3e}  bytes={bytes_:.3e}")
for ms in ((11.52, 16.4) if SCENE == 'fullframe' else (5.66, 5.85)):
    print(f"  at {ms} ms/frame -> {flops / (ms / 1e3) / 1e12:.2f} TFLOP/s "
          f"implied, {bytes_ / (ms / 1e3) / 1e9:.0f} GB/s implied")
