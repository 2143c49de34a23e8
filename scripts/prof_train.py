"""Train-step attribution + MFU (VERDICT round-2 item 5).

Decomposes the production head train step (65536 rays, S=16, 128^3
occupancy — the BENCH_MODE=train operating point) into:

  fwd        loss_fn forward only
  fwd+bwd    value_and_grad (backward cost = this minus fwd)
  step       full train step (adds optimizer update + param write)
  grid       one density-grid EMA refresh (amortised /update_extra_interval)
  sample     host-side sample_train_batch on the production SR task
             (after the on-device frame-store refactor this is ~an RNG draw)

and reports training MFU from XLA's own cost analysis
(compiled.cost_analysis()['flops']) against the chip's peak. Run on the
attached TPU with nothing else using the device:

    PYTHONPATH=/root/.axon_site python scripts/prof_train.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bf16/f32 peak TFLOPS per chip (public spec sheets); MFU uses the f32
# number when the hot matmuls run f32 (our field MLPs do)
PEAK_TFLOPS = {
    "TPU v4": {"bf16": 275.0, "f32": 137.0},
    "TPU v5e": {"bf16": 197.0, "f32": 98.5},
    "TPU v5 lite": {"bf16": 197.0, "f32": 98.5},
    "TPU v5p": {"bf16": 459.0, "f32": 229.5},
    "TPU v6e": {"bf16": 918.0, "f32": 459.0},
}

# HBM bandwidth GB/s per chip (public spec sheets) — the roofline's other
# axis. VERDICT r3 weak #7: "bandwidth-bound" must be an attribution, not a
# hypothesis; bytes come from XLA's own cost model on the compiled step.
PEAK_HBM_GBS = {
    "TPU v4": 1228.0,
    "TPU v5e": 819.0,
    "TPU v5 lite": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6e": 1638.0,
}


def _time(fn, *args, n=8, sync=lambda r: None, vary=None):
    """Best-of-n wall time with forced completion.

    vary: optional (argname-free) callable i -> extra positional arg. The
    remote tunnel MEMOIZES identical dispatches (docs/DESIGN.md timing
    rules), so every timed call must differ in at least one input or the
    loop measures the cache, not the device."""
    def call(i):
        return fn(*args, vary(i)) if vary is not None else fn(*args)

    call(0)  # compile / warm
    best = float("inf")
    for i in range(1, n + 1):
        t0 = time.perf_counter()
        r = call(i)
        sync(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.training.radnerf_task import (
        TaskHParams,
        create_train_state,
        make_train_step,
    )
    from genefaceplusplus_tpu.training.schedulers import make_radnerf_optimizer
    from genefaceplusplus_tpu.utils.rays import pixel_rays

    dev = jax.devices()[0]
    print(f"| device: {dev.device_kind}")

    cfg = RADNeRFConfig(grid_type="fourier", individual_embedding_num=512)
    head = RADNeRF(cfg)
    cond = jnp.zeros((3, 1, 204))
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)

    R, g = 65536, 128
    pose = jnp.asarray(np.eye(4, dtype=np.float32)[None].repeat(1, 0))
    pose = pose.at[:, 2, 3].set(-2.5)
    ro, rd, _ = pixel_rays(pose, (1200.0, 1200.0, 128.0, 128.0), 256, 256)
    ro, rd = ro[0][:R], rd[0][:R]
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    occupancy = jnp.asarray((xx ** 2 + (2.2 * yy) ** 2 + (1.4 * zz) ** 2) < 0.16)
    key = jax.random.PRNGKey(7)
    batch = {
        "rays_o": ro, "rays_d": rd, "cond": cond,
        "gt_rgb": jax.random.uniform(key, (R, 3)),
        "bg_color": jnp.ones((R, 3)),
        "face_mask": jnp.zeros((R,), bool),
        "idx": 0,
        "eye_area_percent": jnp.zeros((1, 1)),
    }
    tx = make_radnerf_optimizer(lr=5e-4)
    hp = TaskHParams()
    opts = RenderOptions(num_samples=16, T_thresh=1e-4, march_mode="interval",
                         perturb=True)
    state = create_train_state(head, tx, jax.random.PRNGKey(0), hp)
    step = make_train_step(head, tx, opts, hp)

    # ---- components -------------------------------------------------
    from genefaceplusplus_tpu.models.renderer import render_rays
    from genefaceplusplus_tpu.training import losses as L

    def loss_fn(params, batch, occupancy, noise):
        cond_feat = head.apply(params, batch["cond"], batch.get("eye_area_percent"),
                               method=RADNeRF.cal_cond_feat)
        ind = head.apply(params, batch["idx"], method=RADNeRF.get_individual_code)

        def field_fn(xyz, dirs):
            return head.apply(params, xyz, dirs, cond_feat, ind, method=RADNeRF.field)

        out = render_rays(field_fn, batch["rays_o"], batch["rays_d"], occupancy,
                          bound=cfg.bound, min_near=cfg.min_near,
                          bg_color=batch["bg_color"], opts=opts, noise=noise)
        return L.mse_loss(out.rgb_map, batch["gt_rgb"])

    noises = [jax.random.uniform(jax.random.PRNGKey(100 + i), (R,)) for i in range(9)]
    batches = [dict(batch, gt_rgb=jax.random.uniform(jax.random.PRNGKey(200 + i), (R, 3)))
               for i in range(9)]

    fwd = jax.jit(loss_fn)

    # the backward must survive dead-code elimination: returning only the
    # loss lets XLA DELETE the whole gradient computation, which round 4
    # measured as "bwd 1.8 ms / optimizer 48 ms" — the backward cost was
    # hiding in the optimizer residual (VERDICT r4 weak #4). Reduce the
    # grads to a scalar that feeds the output instead.
    def _fb(p, b, o, n):
        v, g_ = jax.value_and_grad(loss_fn)(p, b, o, n)
        return v + 0.0 * jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x * x), g_, 0.0)

    fwd_bwd = jax.jit(_fb)
    full = jax.jit(step, donate_argnums=())

    def step_sync(b):
        ns, m = full(state, b, occupancy)
        float(m["total_loss"])
        return ns

    t_fwd = _time(fwd, state.params, batch, occupancy, sync=float,
                  vary=lambda i: noises[i])
    t_fb = _time(fwd_bwd, state.params, batch, occupancy, sync=float,
                 vary=lambda i: noises[i])
    t_full = _time(step_sync, vary=lambda i: batches[i])

    # isolated optimizer update (VERDICT r4 item 9): the optax multi-group
    # transform alone on realistic grads, varied to defeat the tunnel's
    # dispatch memoization
    import optax

    def opt_only(params, opt_state, g_):
        upd, new_opt = tx.update(g_, opt_state, params)
        return optax.apply_updates(params, upd), new_opt

    jopt = jax.jit(opt_only)
    # jitted: the eager grad materializes every un-fused intermediate of the
    # 65536x16-sample backward in HBM and ResourceExhausts the chip
    grads_proto = jax.jit(jax.grad(loss_fn))(state.params, batch, occupancy,
                                             noises[0])
    jax.block_until_ready(grads_proto)
    gvars = [jax.tree.map(lambda x, i=i: x + 1e-6 * i, grads_proto)
             for i in range(9)]

    def opt_sync(p, s, g_):
        newp, news = jopt(p, s, g_)
        jax.block_until_ready(newp)
        return newp

    t_opt = _time(opt_sync, state.params, state.opt_state,
                  vary=lambda i: gvars[i])

    # grid refresh (jitted, as head_task does every update_extra_interval)
    from genefaceplusplus_tpu.training.grid_updater import update_density_grid

    def refresh(params, cond, grid, rng):
        cond_feat = head.apply(params, cond, method=RADNeRF.cal_cond_feat)

        def density_fn(pts):
            return head.apply(params, pts, cond_feat, method=RADNeRF.density)

        return update_density_grid(density_fn, grid, rng, bound=cfg.bound)

    jrefresh = jax.jit(refresh)
    grid0 = jnp.zeros((g, g, g))

    def refresh_sync(p, c, gr, k):
        a, b, c2 = jrefresh(p, c, gr, k)
        float(c2)
        return a

    t_grid = _time(refresh_sync, state.params, cond, grid0,
                   vary=lambda i: jax.random.PRNGKey(i))

    # XLA-reported flops + bytes for the full step -> MFU + HBM roofline
    lowered = jax.jit(step).lower(state, batch, occupancy)
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    hbm_bytes = float(cost.get("bytes accessed", 0.0)) if cost else 0.0
    peak = PEAK_TFLOPS.get(dev.device_kind, {}).get("f32")
    peak_bw = PEAK_HBM_GBS.get(dev.device_kind)
    mfu = (flops / t_full) / (peak * 1e12) if peak and t_full else None

    out = {
        "device": dev.device_kind,
        "fwd_ms": round(t_fwd * 1e3, 1),
        "bwd_ms": round((t_fb - t_fwd) * 1e3, 1),
        "optimizer_ms_residual": round((t_full - t_fb) * 1e3, 1),
        "optimizer_ms_isolated": round(t_opt * 1e3, 1),
        "step_ms": round(t_full * 1e3, 1),
        "grid_refresh_ms": round(t_grid * 1e3, 1),
        "grid_amortized_ms_per_step": round(t_grid * 1e3 / 16, 2),
        "steps_per_sec_incl_grid": round(1.0 / (t_full + t_grid / 16), 2),
        "xla_flops_per_step": flops,
        "achieved_tflops": round(flops / t_full / 1e12, 2) if t_full else None,
        "mfu_f32": round(mfu, 4) if mfu is not None else None,
    }
    # roofline attribution: arithmetic intensity of the compiled step vs the
    # machine balance point; whichever resource the step saturates harder
    # (achieved/peak) names the bound
    if hbm_bytes and t_full:
        ai = flops / hbm_bytes                       # flop/byte of the program
        achieved_gbs = hbm_bytes / t_full / 1e9
        out["xla_hbm_bytes_per_step"] = hbm_bytes
        out["achieved_hbm_gbs"] = round(achieved_gbs, 1)
        out["arith_intensity_flop_per_byte"] = round(ai, 2)
        if peak and peak_bw:
            balance = peak * 1e12 / (peak_bw * 1e9)  # flop/byte at the ridge
            out["machine_balance_flop_per_byte"] = round(balance, 1)
            out["hbm_util"] = round(achieved_gbs / peak_bw, 4)
            out["bound"] = "bandwidth" if ai < balance else "compute"
            out["bound_detail"] = (f"AI {ai:.1f} vs ridge {balance:.1f}; "
                                   f"HBM {achieved_gbs / peak_bw:.0%} vs MFU {mfu:.0%}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
