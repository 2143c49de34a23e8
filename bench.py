"""Benchmark: head-NeRF render throughput on the attached TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference claims ~45 fps raw NeRF render at 256^2 with fp16
autocast on an A100/V100-class GPU (genefacepp_infer.py:434) and ships
25 fps video (BASELINE.md). vs_baseline = measured_fps / 25.

Timing methodology (docs/DESIGN.md): the axon tunnel memoizes identical
(executable, args) calls and its buffers can report ready early, so frames
are CHAINED (each frame's condition depends on the previous frame's output)
and the final scalar is fetched to the host — a strict lower bound on
device throughput.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
    from genefaceplusplus_tpu.models.renderer import RenderOptions, render_rays
    from genefaceplusplus_tpu.utils.rays import get_rays

    # production-shaped head model (May config: 128-dim MLPs, Fourier field)
    cfg = RADNeRFConfig()
    model = RADNeRF(cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )

    H = W = 256  # raw NeRF resolution of the SR pipeline (BASELINE.md)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    rays_o, rays_d = rays["rays_o"][0], rays["rays_d"][0]

    # realistic occupancy: centred blob ~30% fill (head-ish)
    g = cfg.grid_size
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    occupancy = jnp.asarray((xx ** 2 + (2 * yy) ** 2 + zz ** 2) < 0.6)

    opts = RenderOptions(num_samples=16, T_thresh=1e-2, march_mode="interval")
    n_frames = 25

    @jax.jit
    def render_frames_sum(params, rays_o, rays_d, cond, occupancy):
        # frame loop lives ON DEVICE (lax.scan): per-dispatch tunnel latency
        # (~26 ms) would otherwise dominate any per-frame host loop
        def body(carry, i):
            c = cond + 1e-3 * i + 1e-12 * carry  # per-frame cond, chained

            def field_fn(xyz, dirs):
                s, r, a = model.apply(
                    params, xyz.astype(jnp.bfloat16), dirs.astype(jnp.bfloat16),
                    c.astype(jnp.bfloat16),
                )
                return s.astype(jnp.float32), r.astype(jnp.float32), a.astype(jnp.float32)

            out = render_rays(
                field_fn, rays_o, rays_d, occupancy,
                bound=cfg.bound, min_near=cfg.min_near, bg_color=1.0, opts=opts,
            )
            return out.rgb_map.sum(), ()

        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(n_frames, dtype=jnp.float32))
        return tot

    float(render_frames_sum(params, rays_o, rays_d, cond, occupancy))  # compile

    t0 = time.perf_counter()
    float(render_frames_sum(params, rays_o, rays_d, cond + 0.01, occupancy))
    dt = time.perf_counter() - t0 - 0.026  # subtract one tunnel roundtrip
    fps = n_frames / dt

    print(json.dumps({
        "metric": "head_nerf_render_fps_256",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 25.0, 3),
    }))


if __name__ == "__main__":
    main()
