import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genefaceplusplus_tpu.models.full_renderer import render_full_frame
from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.radnerf_torso import (
    TorsoConfig,
    TorsoField,
    composite_head_torso,
    sample_occupancy_2d,
)
from genefaceplusplus_tpu.models.renderer import RenderOptions
from genefaceplusplus_tpu.models.superresolution import Superresolution
from genefaceplusplus_tpu.utils.rays import get_bg_coords, get_rays


def test_sample_occupancy_2d_corners():
    H = 8
    grid = jnp.zeros((H, H)).at[0, 0].set(1.0).at[H - 1, H - 1].set(2.0)
    coords = jnp.asarray([[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]])
    v = sample_occupancy_2d(grid, coords)
    np.testing.assert_allclose(np.asarray(v), [1.0, 2.0, 0.0], atol=1e-5)


def test_torso_field_shapes():
    cfg = TorsoConfig(torso_individual_embedding_num=16, fourier_features=16, torso_head_aware=True)
    model = TorsoField(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (32, 2), minval=-1, maxval=1)
    lm68 = jax.random.uniform(jax.random.PRNGKey(1), (1, 68, 2))
    params = model.init(jax.random.PRNGKey(2), x, lm68, jnp.zeros(8), jnp.zeros((32, 3)), jnp.zeros((32, 1)))
    out = model.apply(params, x, lm68, jnp.zeros(8), jnp.zeros((32, 3)), jnp.zeros((32, 1)))
    assert out.alpha.shape == (32, 1)
    assert out.color.shape == (32, 3)
    assert out.deform.shape == (32, 2)
    assert (np.asarray(out.alpha) >= 0).all() and (np.asarray(out.alpha) <= 1).all()


def test_composite_head_torso_opaque_head_hides_torso():
    N = 4
    head = jnp.ones((N, 3)) * 0.5
    ws = jnp.ones((N,))  # fully opaque head
    ta = jnp.ones((N, 1))
    tc = jnp.zeros((N, 3))
    img, _ = composite_head_torso(head, ws, ta, tc, bg_color=1.0)
    np.testing.assert_allclose(np.asarray(img), 0.5, atol=1e-6)
    # transparent head -> torso color shows
    img2, _ = composite_head_torso(jnp.zeros((N, 3)), jnp.zeros((N,)), ta, tc + 0.25, 1.0)
    np.testing.assert_allclose(np.asarray(img2), 0.25, atol=1e-6)


def test_full_frame_with_torso_and_sr():
    H = W = 16
    head_cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=8, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32, geo_feat_dim=16,
    )
    head = RADNeRF(head_cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    head_params = head.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)

    torso_cfg = TorsoConfig(torso_individual_embedding_num=8, fourier_features=8, torso_head_aware=True)
    torso = TorsoField(torso_cfg)
    bg_coords = get_bg_coords(H, W)[0]
    lm68 = jax.random.uniform(jax.random.PRNGKey(1), (1, 68, 2))
    torso_params = torso.init(
        jax.random.PRNGKey(2), bg_coords, lm68, jnp.zeros(8), jnp.zeros((H * W, 3)), jnp.zeros((H * W, 1))
    )

    sr = Superresolution(channels=3, input_resolution=H)
    sr_params = sr.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3)))

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    occ = jnp.ones((16, 16, 16), bool)
    occ2d = jnp.ones((16, 16)) * 0.5

    out = render_full_frame(
        head, head_params,
        rays["rays_o"][0], rays["rays_d"][0], cond, occ,
        bg_color=jnp.ones((H * W, 3)),
        opts=RenderOptions(num_coarse=16, num_samples=8),
        image_hw=(H, W),
        torso_model=torso, torso_params=torso_params,
        bg_coords=bg_coords, lm68=lm68, occupancy_2d=occ2d,
        sr_model=sr, sr_params=sr_params,
    )
    assert out.rgb_map.shape == (H * W, 3)
    assert out.sr_rgb_map.shape == (2 * H, 2 * W, 3)
    img = np.asarray(out.sr_rgb_map)
    assert np.isfinite(img).all() and (img >= 0).all() and (img <= 1).all()


def test_full_frame_head_only_matches_bg_when_empty():
    H = W = 8
    head_cfg = RADNeRFConfig(
        grid_size=8, individual_embedding_num=4, smo_win_size=3,
        fourier_pos_features=8, fourier_amb_features=8,
        hidden_dim_sigma=16, hidden_dim_ambient=16, hidden_dim_color=16, geo_feat_dim=8,
    )
    head = RADNeRF(head_cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    head_params = head.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    out = render_full_frame(
        head, head_params,
        rays["rays_o"][0], rays["rays_d"][0], cond,
        jnp.zeros((8, 8, 8), bool),  # empty occupancy
        bg_color=0.75,
        opts=RenderOptions(num_coarse=8, num_samples=4),
        image_hw=(H, W),
    )
    np.testing.assert_allclose(np.asarray(out.rgb_map), 0.75, atol=1e-6)


def test_head_crop_matches_full_render():
    """Fixed-size head crop with dynamic offset is LOSSLESS vs the full-frame
    render whenever the crop covers the occupied AABB's screen projection
    (head rays outside it have zero samples in both paths)."""
    H = W = 32
    head_cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=4, smo_win_size=3,
        fourier_pos_features=8, fourier_amb_features=8,
        hidden_dim_sigma=16, hidden_dim_ambient=16, hidden_dim_color=16, geo_feat_dim=8,
    )
    head = RADNeRF(head_cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    head_params = head.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)

    # small off-centre blob so the crop is a strict subwindow
    g = head_cfg.grid_size
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    occ = jnp.asarray(((xx - 0.2) ** 2 + (yy + 0.1) ** 2 + zz ** 2) < 0.12)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    ro, rd = rays["rays_o"][0], rays["rays_d"][0]
    opts = RenderOptions(num_samples=8)

    full = render_full_frame(
        head, head_params, ro, rd, cond, occ, bg_color=0.75,
        opts=opts, image_hw=(H, W),
    )
    crop = render_full_frame(
        head, head_params, ro, rd, cond, occ, bg_color=0.75,
        opts=opts, image_hw=(H, W), head_crop=(24, 24),
    )
    np.testing.assert_allclose(
        np.asarray(crop.rgb_map), np.asarray(full.rgb_map), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(crop.weights_sum), np.asarray(full.weights_sum), atol=1e-5)

    # the crop actually covers the hit set for this scene
    from genefaceplusplus_tpu.models.full_renderer import head_crop_offset
    from genefaceplusplus_tpu.ops.raymarch import occupancy_aabb

    _, _, fits = head_crop_offset(ro, rd, occupancy_aabb(occ, 1.0), (H, W), (24, 24))
    assert bool(fits)


@pytest.mark.parametrize("pad_px", [12, 4, 0])
def test_auto_head_crop_lossless_at_any_pad(pad_px):
    """auto_head_crop is lossless for ANY pad_px >= 0: the screen bbox of
    the occupied AABB's 8 projected corners covers the AABB's whole
    projection (perspective maps the convex box onto the convex hull of
    the projected corners), so every ray that can hit the box lands inside
    the unpadded rect already — pad only absorbs rounding. Backs the
    ROADMAP #5 pad_px A/B (scripts/check_crop_pad.py measures the same
    equality at the bench scene's production shapes)."""
    from genefaceplusplus_tpu.models.full_renderer import (
        auto_head_crop, head_crop_offset)
    from genefaceplusplus_tpu.ops.raymarch import occupancy_aabb

    H = W = 32
    head_cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=4, smo_win_size=3,
        fourier_pos_features=8, fourier_amb_features=8,
        hidden_dim_sigma=16, hidden_dim_ambient=16, hidden_dim_color=16, geo_feat_dim=8,
    )
    head = RADNeRF(head_cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    head_params = head.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    g = head_cfg.grid_size
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    occ = jnp.asarray(((xx - 0.2) ** 2 + (yy + 0.1) ** 2 + zz ** 2) < 0.12)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    intr = (2.0 * W, 2.0 * H, W / 2, H / 2)
    rays = get_rays(jnp.asarray(pose[None]), intr, H, W)
    ro, rd = rays["rays_o"][0], rays["rays_d"][0]
    opts = RenderOptions(num_samples=8)

    crop_hw = auto_head_crop(occ, pose[None], intr, H, W, bound=1.0,
                             pad_px=pad_px, multiple=4)
    if crop_hw is None:
        # at this 32² toy scale a large pad pushes the crop past
        # max_area_frac and auto_head_crop correctly declines to crop
        pytest.skip(f"pad_px={pad_px} exceeds max_area_frac at 32²")
    assert crop_hw[0] < H  # strict subwindow

    full = render_full_frame(head, head_params, ro, rd, cond, occ,
                             bg_color=0.75, opts=opts, image_hw=(H, W))
    crop = render_full_frame(head, head_params, ro, rd, cond, occ,
                             bg_color=0.75, opts=opts, image_hw=(H, W),
                             head_crop=crop_hw)
    np.testing.assert_allclose(
        np.asarray(crop.rgb_map), np.asarray(full.rgb_map), atol=1e-5)
    _, _, fits = head_crop_offset(ro, rd, occupancy_aabb(occ, 1.0), (H, W), crop_hw)
    assert bool(fits)


def test_torso_crop_matches_full_render():
    """Static torso rect from the 2D occupancy footprint is lossless: the
    same occupancy mask that defines the rect zeroes alpha outside it."""
    from genefaceplusplus_tpu.models.full_renderer import auto_torso_crop

    H = W = 32
    head_cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=4, smo_win_size=3,
        fourier_pos_features=8, fourier_amb_features=8,
        hidden_dim_sigma=16, hidden_dim_ambient=16, hidden_dim_color=16, geo_feat_dim=8,
    )
    head = RADNeRF(head_cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    head_params = head.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    occ = jnp.zeros((16, 16, 16), bool).at[6:10, 6:10, 6:10].set(True)

    torso = TorsoField(TorsoConfig(torso_individual_embedding_num=4, grid_size=16))
    bg_coords = get_bg_coords(H, W)[0]
    lm68 = jax.random.uniform(jax.random.PRNGKey(1), (1, 68, 2))
    torso_params = torso.init(jax.random.PRNGKey(2), bg_coords[:8], lm68,
                              jnp.zeros(8), jnp.zeros((8, 3)), jnp.zeros((8, 1)))
    # torso footprint: lower-centre cells only
    occ2d = jnp.zeros((16, 16)).at[9:15, 4:12].set(1.0)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    ro, rd = rays["rays_o"][0], rays["rays_d"][0]
    opts = RenderOptions(num_samples=8)

    crop = auto_torso_crop(occ2d, H, W, pad_px=2, multiple=4)
    assert crop is not None and crop[2] < H

    kw = dict(bg_color=0.6, opts=opts, image_hw=(H, W), torso_model=torso,
              torso_params=torso_params, bg_coords=bg_coords, lm68=lm68,
              occupancy_2d=occ2d)
    full = render_full_frame(head, head_params, ro, rd, cond, occ, **kw)
    cropped = render_full_frame(head, head_params, ro, rd, cond, occ,
                                torso_crop=crop, **kw)
    np.testing.assert_allclose(np.asarray(cropped.rgb_map),
                               np.asarray(full.rgb_map), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cropped.torso_alpha),
                               np.asarray(full.torso_alpha), atol=1e-5)


def test_sr_crop_matches_full_render():
    """Static-region SR skip is lossless: outside union(head bbox, torso
    rect) the raw composite equals the static bg, so pasting the per-frame
    SR of the outer rect into precomputed SR(bg) reproduces full-frame SR
    (incl. position-correct sliced const noise, noise_strength != 0)."""
    import flax

    from genefaceplusplus_tpu.models.full_renderer import (
        auto_head_bbox, auto_sr_crop, auto_torso_crop)

    H = W = 64
    head_cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=4, smo_win_size=3,
        fourier_pos_features=8, fourier_amb_features=8,
        hidden_dim_sigma=16, hidden_dim_ambient=16, hidden_dim_color=16, geo_feat_dim=8,
    )
    head = RADNeRF(head_cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    head_params = head.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    occ = jnp.zeros((16, 16, 16), bool).at[7:9, 7:9, 7:9].set(True)

    torso = TorsoField(TorsoConfig(torso_individual_embedding_num=4, grid_size=16))
    bg_coords = get_bg_coords(H, W)[0]
    lm68 = jax.random.uniform(jax.random.PRNGKey(1), (1, 68, 2))
    torso_params = torso.init(jax.random.PRNGKey(2), bg_coords[:8], lm68,
                              jnp.zeros(8), jnp.zeros((8, 3)), jnp.zeros((8, 1)))
    occ2d = jnp.zeros((16, 16)).at[11:15, 6:10].set(1.0)

    sr = Superresolution(channels=3, input_resolution=W)
    sr_params = sr.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3)))
    # non-zero noise strengths so the const-noise slicing is actually tested
    flat = flax.traverse_util.flatten_dict(sr_params)
    for k in flat:
        if k[-1] == "noise_strength":
            flat[k] = jnp.asarray(0.3)
    sr_params = flax.traverse_util.unflatten_dict(flat)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    intr = (2.0 * W, 2.0 * H, W / 2, H / 2)
    rays = get_rays(jnp.asarray(pose[None]), intr, H, W)
    ro, rd = rays["rays_o"][0], rays["rays_d"][0]
    opts = RenderOptions(num_samples=8)

    torso_crop = auto_torso_crop(occ2d, H, W, pad_px=2, multiple=4)
    bbox = auto_head_bbox(occ, pose[None], intr, H, W)
    sr_crop = auto_sr_crop(bbox, torso_crop, H, W, margin=8, multiple=8,
                           max_area_frac=1.1)
    assert sr_crop is not None
    (orr, orc, oh, ow), (ir, ic, ih, iw) = sr_crop
    assert oh < H or ow < W  # actually crops something
    # inner inside outer with margin (or flush at image edge)
    assert orr <= ir and orc <= ic and ir + ih <= orr + oh and ic + iw <= orc + ow

    bg_color = jnp.full((H * W, 3), 0.6)
    sr_bg = jnp.clip(sr.apply(sr_params, bg_color.reshape(1, H, W, 3)), 0.0, 1.0)[0]

    kw = dict(bg_color=bg_color, opts=opts, image_hw=(H, W), torso_model=torso,
              torso_params=torso_params, bg_coords=bg_coords, lm68=lm68,
              occupancy_2d=occ2d, sr_model=sr, sr_params=sr_params)
    full = render_full_frame(head, head_params, ro, rd, cond, occ, **kw)
    cropped = render_full_frame(head, head_params, ro, rd, cond, occ,
                                sr_crop=sr_crop, sr_bg=sr_bg,
                                torso_crop=torso_crop, **kw)
    np.testing.assert_allclose(np.asarray(cropped.sr_rgb_map),
                               np.asarray(full.sr_rgb_map), atol=2e-5)


def test_sr_apply_batched_matches_single():
    """Chunk-level batched SR (sr_apply_batched) is frame-wise identical to
    single-frame application, with and without the static-region skip."""
    from genefaceplusplus_tpu.models.full_renderer import sr_apply_batched

    H = W = 32
    sr = Superresolution(channels=3, input_resolution=W)
    sr_params = sr.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    raws = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W, 3))

    batched = np.asarray(sr_apply_batched(sr, sr_params, raws))
    for i in range(3):
        single = np.asarray(sr_apply_batched(sr, sr_params, raws[i:i + 1]))[0]
        np.testing.assert_allclose(batched[i], single, atol=1e-5)

    sr_crop = ((4, 0, 24, 32), (8, 4, 16, 24))
    bg = jnp.full((1, H, W, 3), 0.5)
    sr_bg = jnp.clip(sr.apply(sr_params, bg), 0.0, 1.0)[0]
    batched = np.asarray(sr_apply_batched(sr, sr_params, raws, sr_crop, sr_bg))
    assert batched.shape == (3, 2 * H, 2 * W, 3)
    for i in range(3):
        single = np.asarray(
            sr_apply_batched(sr, sr_params, raws[i:i + 1], sr_crop, sr_bg))[0]
        np.testing.assert_allclose(batched[i], single, atol=1e-5)
