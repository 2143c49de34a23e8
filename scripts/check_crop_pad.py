"""Losslessness check for head-crop padding (ROADMAP #5 pad_px A/B).

Renders the bench.py May-calibrated scene once per pad_px in {12, 8, 4, 0}
and prints max|render(pad) - render(full frame, no crop)|. The projected
8-corner bbox of the occupied AABB covers the AABB's whole screen
projection (perspective maps the convex box onto the convex hull of its
projected corners), so any non-negative pad should be bit-identical to the
uncropped render — this script is the measurement backing that argument
before the default changes. Run on the TPU or CPU: values are exact either
way (the crop machinery is dynamic_slice + paste, not resampling;
tests/test_full_renderer.py asserts the pad=12 case).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from prof_stages import setup  # bench-identical scene

from genefaceplusplus_tpu.models.full_renderer import (
    auto_head_crop, render_full_frame)
from genefaceplusplus_tpu.models.renderer import RenderOptions


def main():
    cfg, head, head_params, cond, ro, rd, occ, H, W, pose = setup()
    opts = RenderOptions(num_samples=10, T_thresh=1e-2,
                         march_mode="interval", entry_mode="probe")
    intr = (2.0 * W, 2.0 * H, W / 2, H / 2)

    def render(head_crop):
        fn = jax.jit(lambda p, c: render_full_frame(
            head, p, ro, rd, c, occ, bg_color=jnp.ones((H * W, 3)),
            opts=opts, image_hw=(H, W), head_crop=head_crop).rgb_map)
        return fn(head_params, cond)

    ref = render(None)
    for pad in (12, 8, 4, 0):
        crop = auto_head_crop(occ, pose[None], intr, H, W,
                              bound=cfg.bound, pad_px=pad)
        img = render(crop)
        diff = float(jnp.max(jnp.abs(img - ref)))
        print(f"pad_px={pad:2d} crop={crop} max|crop-full|={diff:.3e}")


if __name__ == "__main__":
    main()
