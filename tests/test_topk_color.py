"""Top-K color compaction (RenderOptions.color_topk, ROADMAP #5).

The geometry stage runs on all S samples; the color MLP runs on only the K
highest-composite-weight samples per ray, and the image renormalises by the
captured-weight fraction. These tests prove:
  (a) K = S reproduces the full render EXACTLY (the top-K then covers every
      sample, so renormalisation is the identity);
  (b) geometry-derived outputs (weights_sum / depth / ambient_sum / weights)
      are bit-equal to the full path for ANY K — only the color evaluation
      is approximated;
  (c) on a surface-like scene (opaque blob: weight mass concentrates on a
      few samples) a reduced K stays visually indistinguishable from full.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.renderer import RenderOptions, render_rays
from genefaceplusplus_tpu.utils.rays import get_rays


def _scene(G=32, H=24, W=24):
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, G)] * 3), indexing="ij")
    occ = jnp.asarray((xx ** 2 + (2.0 * yy) ** 2 + zz ** 2) < 0.25)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.2
    rays = get_rays(jnp.asarray(pose[None]), (1.2 * W, 1.2 * H, W / 2, H / 2), H, W)
    return occ, rays["rays_o"][0], rays["rays_d"][0]


def _model_and_fns(sigma_boost=0.0):
    cfg = RADNeRFConfig(
        grid_size=32, individual_embedding_num=4, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32,
        geo_feat_dim=16,
    )
    model = RADNeRF(cfg)
    cond = jnp.zeros((cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    cond_feat = model.apply(params, cond, method=RADNeRF.cal_cond_feat)
    ind = model.apply(params, 0, method=RADNeRF.get_individual_code)

    def field_fn(xyz, dirs):
        s, c, a = model.apply(params, xyz, dirs, cond_feat, ind, method=RADNeRF.field)
        return s + sigma_boost, c, a

    def sigma_fn(xyz):
        s, g, a = model.apply(params, xyz, cond_feat, method=RADNeRF.field_sigma)
        return s + sigma_boost, g, a

    def color_fn(geo, dirs):
        return model.apply(params, geo, dirs, ind, method=RADNeRF.field_color)

    return cfg, field_fn, sigma_fn, color_fn


def _render(opts, field_fn, sigma_fn, color_fn, occ, ro, rd, split=True):
    return render_rays(
        field_fn, ro, rd, occ, bound=1.0, min_near=0.05, bg_color=0.7,
        opts=opts,
        sigma_fn=sigma_fn if split else None,
        color_fn=color_fn if split else None,
    )


def test_topk_equals_full_when_k_is_s():
    occ, ro, rd = _scene()
    _, field_fn, sigma_fn, color_fn = _model_and_fns()
    base = RenderOptions(num_samples=8, T_thresh=1e-3)
    full = _render(base, field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    topk = _render(
        RenderOptions(num_samples=8, T_thresh=1e-3, color_topk=8),
        field_fn, sigma_fn, color_fn, occ, ro, rd,
    )
    np.testing.assert_allclose(np.asarray(topk.rgb_map), np.asarray(full.rgb_map),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(topk.weights_sum),
                               np.asarray(full.weights_sum), atol=1e-6)


def test_topk_geometry_outputs_exact_for_any_k():
    occ, ro, rd = _scene()
    _, field_fn, sigma_fn, color_fn = _model_and_fns()
    full = _render(RenderOptions(num_samples=8, T_thresh=1e-3),
                   field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    for K in (2, 4):
        topk = _render(RenderOptions(num_samples=8, T_thresh=1e-3, color_topk=K),
                       field_fn, sigma_fn, color_fn, occ, ro, rd)
        np.testing.assert_allclose(np.asarray(topk.weights_sum),
                                   np.asarray(full.weights_sum), atol=1e-6)
        np.testing.assert_allclose(np.asarray(topk.depth_map),
                                   np.asarray(full.depth_map), atol=1e-5)
        np.testing.assert_allclose(np.asarray(topk.ambient_sum),
                                   np.asarray(full.ambient_sum), atol=1e-5)
        np.testing.assert_allclose(np.asarray(topk.weights),
                                   np.asarray(full.weights), atol=1e-6)


def test_topk_close_on_opaque_surface():
    """With an opaque surface the weight mass sits on the first few samples
    past the entry, so K=4 of S=8 must be visually indistinguishable."""
    occ, ro, rd = _scene()
    # boost sigma so the blob is opaque (transmittance dies within ~2 samples)
    _, field_fn, sigma_fn, color_fn = _model_and_fns(sigma_boost=50.0)
    full = _render(RenderOptions(num_samples=8, T_thresh=1e-3),
                   field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    topk = _render(RenderOptions(num_samples=8, T_thresh=1e-3, color_topk=4),
                   field_fn, sigma_fn, color_fn, occ, ro, rd)
    mse = float(jnp.mean((topk.rgb_map - full.rgb_map) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 40.0, psnr


def test_topk_ignored_without_split_fns():
    """color_topk set but no sigma_fn/color_fn -> silently the full path."""
    occ, ro, rd = _scene()
    _, field_fn, sigma_fn, color_fn = _model_and_fns()
    full = _render(RenderOptions(num_samples=8, T_thresh=1e-3),
                   field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    alt = _render(RenderOptions(num_samples=8, T_thresh=1e-3, color_topk=4),
                  field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    np.testing.assert_allclose(np.asarray(alt.rgb_map), np.asarray(full.rgb_map),
                               atol=0)


def test_full_frame_topk_wiring():
    """render_full_frame passes the split closures through: K=S equals full."""
    from genefaceplusplus_tpu.models.full_renderer import render_full_frame

    occ, ro, rd = _scene()
    cfg, _, _, _ = _model_and_fns()
    model = RADNeRF(cfg)
    cond = jnp.zeros((cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    kw = dict(bg_color=jnp.full((ro.shape[0], 3), 0.7), image_hw=(24, 24))
    full = render_full_frame(model, params, ro, rd, cond, occ,
                             opts=RenderOptions(num_samples=8, T_thresh=1e-3), **kw)
    topk = render_full_frame(model, params, ro, rd, cond, occ,
                             opts=RenderOptions(num_samples=8, T_thresh=1e-3,
                                                color_topk=8), **kw)
    np.testing.assert_allclose(np.asarray(topk.rgb_map), np.asarray(full.rgb_map),
                               atol=2e-5)


# ---------------------------------------------------------------------------
# Static-budget live-sample compaction (RenderOptions.compact_frac): the
# TPU-native re-derivation of the reference's CUDA stream compaction
# (raymarching.cu march_rays_train atomic packing) — cumsum ranks, one
# gather in, one scatter out, static shapes.
# ---------------------------------------------------------------------------


def _live_frac(occ, ro, rd, S=8):
    from genefaceplusplus_tpu.ops import raymarch

    aabb = jnp.asarray([-1.0, -0.5, -1.0, 1.0, 0.5, 1.0])
    nears, fars = raymarch.near_far_from_aabb(ro, rd, aabb, 0.05)
    occ_box = raymarch.occupancy_aabb(occ, 1.0)
    m = raymarch.march_rays_interval(ro, rd, nears, fars, occ_box, bound=1.0,
                                     dt_gamma=1 / 256, max_steps=16,
                                     num_samples=S, min_near=0.05,
                                     grid_size=occ.shape[0])
    return float(np.asarray(m.mask).mean())


def test_compact_exact_when_budget_covers_live():
    """With M >= live count the compacted render is exact (both field paths)."""
    occ, ro, rd = _scene()
    lf = _live_frac(occ, ro, rd)
    assert lf < 0.85  # the scene actually has dead samples to skip
    _, field_fn, sigma_fn, color_fn = _model_and_fns()
    full = _render(RenderOptions(num_samples=8, T_thresh=1e-3),
                   field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    # fused-field path
    comp = _render(RenderOptions(num_samples=8, T_thresh=1e-3, compact_frac=0.9),
                   field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    np.testing.assert_allclose(np.asarray(comp.rgb_map), np.asarray(full.rgb_map),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(comp.weights_sum),
                               np.asarray(full.weights_sum), atol=1e-6)
    np.testing.assert_allclose(np.asarray(comp.depth_map),
                               np.asarray(full.depth_map), atol=1e-5)
    # composed with top-K color
    both = _render(RenderOptions(num_samples=8, T_thresh=1e-3, compact_frac=0.9,
                                 color_topk=8),
                   field_fn, sigma_fn, color_fn, occ, ro, rd)
    np.testing.assert_allclose(np.asarray(both.rgb_map), np.asarray(full.rgb_map),
                               atol=2e-5)


def test_compact_overflow_degrades_gracefully():
    """A budget below the live count drops the flat-order tail: output stays
    finite and in range, weights_sum never exceeds the exact render's."""
    occ, ro, rd = _scene()
    _, field_fn, sigma_fn, color_fn = _model_and_fns(sigma_boost=50.0)
    full = _render(RenderOptions(num_samples=8, T_thresh=1e-3),
                   field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    tiny = _render(RenderOptions(num_samples=8, T_thresh=1e-3, compact_frac=0.05),
                   field_fn, sigma_fn, color_fn, occ, ro, rd, split=False)
    out = np.asarray(tiny.rgb_map)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0
    assert float(np.asarray(tiny.weights_sum).sum()) <= \
        float(np.asarray(full.weights_sum).sum()) + 1e-4


def test_compact_full_frame_wiring():
    """render_full_frame + pipeline knob: compact_frac flows through and the
    cropped production path stays exact at a covering budget."""
    from genefaceplusplus_tpu.models.full_renderer import render_full_frame

    occ, ro, rd = _scene()
    cfg, _, _, _ = _model_and_fns()
    model = RADNeRF(cfg)
    cond = jnp.zeros((cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    kw = dict(bg_color=jnp.full((ro.shape[0], 3), 0.7), image_hw=(24, 24))
    full = render_full_frame(model, params, ro, rd, cond, occ,
                             opts=RenderOptions(num_samples=8, T_thresh=1e-3), **kw)
    comp = render_full_frame(model, params, ro, rd, cond, occ,
                             opts=RenderOptions(num_samples=8, T_thresh=1e-3,
                                                compact_frac=0.9), **kw)
    np.testing.assert_allclose(np.asarray(comp.rgb_map), np.asarray(full.rgb_map),
                               atol=2e-5)
