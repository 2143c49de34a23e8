"""Hierarchical entry-depth prepass: conservativeness + render parity.

The probe prepass (ops/raymarch.py:entry_depth_map) replaces the reference
marcher's per-cell empty-space skipping (raymarching.cu:429-441) with a
strided coarse-ray probe; these tests prove (a) the tightened entry is never
LATER than the true first occupied fine-lattice sample (no geometry is ever
skipped), and (b) a probe-entry render with a reduced sample budget matches
the exact grid-mode (reference-semantics) render.
"""

import numpy as np
import jax.numpy as jnp

from genefaceplusplus_tpu.ops import raymarch
from genefaceplusplus_tpu.utils.rays import get_rays


def _blob_occupancy(G=64, seed=0):
    rng = np.random.RandomState(seed)
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, G)] * 3), indexing="ij")
    occ = np.zeros((G, G, G), bool)
    for _ in range(3):
        c = rng.uniform(-0.4, 0.4, 3)
        r = rng.uniform(0.15, 0.35)
        occ |= ((xx - c[0]) ** 2 + (yy - c[1]) ** 2 + (zz - c[2]) ** 2) < r ** 2
    return jnp.asarray(occ)


def _image_rays(H=32, W=32, z=-2.2):
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = z
    rays = get_rays(jnp.asarray(pose[None]), (1.2 * W, 1.2 * H, W / 2, H / 2), H, W)
    return rays["rays_o"][0], rays["rays_d"][0]


def test_probe_entry_is_conservative():
    """t_entry <= t of the first occupied fine-lattice sample, every ray."""
    G, H, W = 64, 32, 32
    occ = _blob_occupancy(G)
    ro, rd = _image_rays(H, W)
    bound = 1.0
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    nears, fars = raymarch.near_far_from_aabb(ro, rd, aabb, 0.05)

    # ground truth: exact grid-mode march (reference semantics), big K
    gt = raymarch.march_rays(ro, rd, nears, fars, occ, bound=bound,
                             num_coarse=64, num_samples=1)
    t_star = np.asarray(gt.ts[:, 0] - gt.deltas[:, 0])  # t at first occupied sample
    hit = np.asarray(gt.mask[:, 0])
    assert hit.sum() > 50  # the scene is actually visible

    occ_box = raymarch.occupancy_aabb(occ, bound)
    t_entry = np.asarray(raymarch.entry_depth_map(
        ro, rd, occ, occ_box, bound, (H, W), stride=4, coarse_factor=4,
        n_probe=32,
    ))
    assert np.all(t_entry[hit] <= t_star[hit] + 1e-4), (
        float((t_entry[hit] - t_star[hit]).max()))
    # and it is genuinely TIGHT for the bulk of hitting rays: the median gap
    # to the true entry stays within a few coarse cells (the win that lets
    # S drop 16 -> 10)
    gap = t_star[hit] - t_entry[hit]
    assert np.median(gap) < 4.5 * (2.0 * bound / (G // 4)), float(np.median(gap))


def test_probe_render_matches_high_budget_ground_truth():
    """Adaptive probed-interval render at S in {10, 12} vs an S=128 reference.

    Round-4 ghost-face postmortem: the old fixed-dt lattice from t_entry
    covered only S*dt_min of depth, so identities whose occupied span is
    deeper (the trained synth512 head spans ~0.9) lost their density
    entirely — weights_sum collapsed 19x and the face rendered translucent
    (docs/DESIGN.md round-5 log). The fix (entry_exit_depth_map +
    march_rays_interval t_exit): stretch the S samples adaptively over the
    probed occupied span. This test grades the fix against a 128-sample
    fixed-dt reference (which always covers the span at G=64):

    - OPACITY is the product property that broke: mean weights_sum must match
      the reference to <1% relative, p99 per-ray gap < 0.05 even on
      adversarial multi-blob scenes with depth discontinuities.
    - RGB is quadrature-limited on sigma step functions (worst case); the
      smooth trained fields do far better. Floor: 28 dB vs the reference
      (measured 31-38 dB across seeds).
    """
    from genefaceplusplus_tpu.models.renderer import RenderOptions, render_rays

    G, H, W = 64, 32, 32
    for seed in (0, 1, 2):
        occ = _blob_occupancy(G, seed=seed)
        ro, rd = _image_rays(H, W)

        def field_fn(xyz, dirs):
            inside = raymarch.occupancy_lookup(occ, xyz, 1.0)
            sigma = 30.0 * inside.astype(jnp.float32)
            rgb = 0.5 + 0.4 * jnp.sin(2.0 * xyz)
            amb = jnp.zeros((xyz.shape[0], 2))
            return sigma, rgb, amb

        gt = render_rays(
            field_fn, ro, rd, occ, bound=1.0, min_near=0.05, bg_color=1.0,
            opts=RenderOptions(num_samples=128, march_mode="interval"),
        )
        g = np.asarray(gt.rgb_map)
        ws_gt = np.asarray(gt.weights_sum)
        for S in (12, 10):
            probe = render_rays(
                field_fn, ro, rd, occ, bound=1.0, min_near=0.05, bg_color=1.0,
                opts=RenderOptions(num_samples=S, march_mode="interval",
                                   entry_mode="probe", n_probe=32),
                image_hw=(H, W),
            )
            ws = np.asarray(probe.weights_sum)
            rel = abs(float(ws.mean()) - float(ws_gt.mean())) / max(float(ws_gt.mean()), 1e-9)
            assert rel < 0.01, (seed, S, rel)
            ws_gap = np.abs(ws_gt - ws)
            assert float(np.quantile(ws_gap, 0.99)) < 0.05, (
                seed, S, float(np.quantile(ws_gap, 0.99)))
            a = np.asarray(probe.rgb_map)
            mse = float(((a - g) ** 2).mean())
            psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
            assert psnr > 28.0, (seed, S, psnr)
