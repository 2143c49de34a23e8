"""Profile full-frame decomposition + reduced sample budgets on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.full_renderer import render_full_frame
from genefaceplusplus_tpu.models.radnerf_torso import TorsoConfig, TorsoField
from genefaceplusplus_tpu.models.renderer import RenderOptions, render_rays
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
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    occupancy = jnp.asarray((xx ** 2 + (2 * yy) ** 2 + zz ** 2) < 0.6)
    return cfg, head, head_params, cond, rays["rays_o"][0], rays["rays_d"][0], occupancy, H, W


def timeit(fn, args, n_frames, label, reps=3):
    float(fn(*args))
    best = float("inf")
    for k in range(1, reps + 1):
        a2 = list(args)
        a2[-1] = args[-1] + 0.01 * k  # vary cond (last arg)
        t0 = time.perf_counter()
        float(fn(*a2))
        best = min(best, time.perf_counter() - t0 - 0.026)
    ms = best / n_frames * 1000
    print(f"{label:50s} {ms:7.2f} ms/frame  {1000/ms:7.1f} fps")
    return ms


def head_only(S, n_frames=50, entry_mode="aabb", probe_factor=4, n_probe=24):
    cfg, head, head_params, cond, ro, rd, occ, H, W = setup()
    opts = RenderOptions(num_samples=S, T_thresh=1e-2, march_mode="interval",
                         entry_mode=entry_mode, probe_coarse_factor=probe_factor,
                         n_probe=n_probe)

    @jax.jit
    def run(head_params, ro, rd, occ, cond):
        def body(carry, i):
            c = cond + 1e-3 * i + 1e-12 * carry
            cond_feat = head.apply(head_params, c, None, method=RADNeRF.cal_cond_feat)
            ind = head.apply(head_params, 0, method=RADNeRF.get_individual_code)

            def field_fn(xyz, dirs):
                return head.apply(head_params, xyz, dirs, cond_feat, ind,
                                  method=RADNeRF.field)

            out = render_rays(field_fn, ro, rd, occ, bound=cfg.bound,
                              min_near=cfg.min_near, bg_color=1.0, opts=opts,
                              image_hw=(H, W))
            return out.rgb_map.sum(), ()
        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(n_frames, dtype=jnp.float32))
        return tot

    return timeit(run, (head_params, ro, rd, occ, cond), n_frames,
                  f"head 256^2 S={S} entry={entry_mode} f={probe_factor} P={n_probe}")


def full(S, n_frames=50):
    cfg, head, head_params, cond, ro, rd, occ, H, W = setup()
    torso = TorsoField(TorsoConfig())
    bg_coords = get_bg_coords(H, W)[0]
    lm68 = jax.random.uniform(jax.random.PRNGKey(1), (1, 68, 2))
    torso_params = torso.init(jax.random.PRNGKey(2), bg_coords[:8], lm68, jnp.zeros(8),
                              jnp.zeros((8, 3)), jnp.zeros((8, 1)))
    sr = Superresolution(channels=3, input_resolution=H)
    sr_params = sr.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3)))
    occ2d = jnp.ones((cfg.grid_size, cfg.grid_size)) * 0.5
    bg_color = jnp.ones((H * W, 3))
    opts = RenderOptions(num_samples=S, T_thresh=1e-2, march_mode="interval")

    @jax.jit
    def run(head_params, torso_params, sr_params, occ, ro, rd,
            bg_coords, bg_color, lm68, occ2d, cond):
        def body(carry, i):
            c = cond + 1e-3 * i + 1e-12 * carry
            out = render_full_frame(
                head, head_params, ro, rd, c, occ,
                bg_color=bg_color, opts=opts, image_hw=(H, W),
                torso_model=torso, torso_params=torso_params,
                bg_coords=bg_coords, lm68=lm68, occupancy_2d=occ2d,
                sr_model=sr, sr_params=sr_params,
            )
            return out.sr_rgb_map.sum(), ()
        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(n_frames, dtype=jnp.float32))
        return tot

    args = (head_params, torso_params, sr_params, occ, ro, rd,
            bg_coords, bg_color, lm68, occ2d, cond)
    return timeit(run, args, n_frames, f"full 512^2 S={S}")


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "head"):
        for S in (16, 12, 10, 8):
            head_only(S)
    if which in ("all", "probe"):
        head_only(16, entry_mode="probe")
        head_only(12, entry_mode="probe")
        head_only(10, entry_mode="probe")
        head_only(10, entry_mode="probe", probe_factor=2, n_probe=48)
    if which in ("all", "full"):
        for S in (16, 10):
            full(S)
