import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.renderer import RenderOptions, render_rays
from genefaceplusplus_tpu.utils.rays import get_rays


def small_cfg(**kw):
    d = dict(
        grid_size=32,
        desired_resolution=256,
        log2_hashmap_size=12,
        individual_embedding_num=64,
        smo_win_size=3,
        fourier_pos_features=32,
        fourier_amb_features=16,
        hidden_dim_sigma=64,
        hidden_dim_ambient=64,
        hidden_dim_color=64,
        geo_feat_dim=32,
    )
    d.update(kw)
    return RADNeRFConfig(**d)


def build(cfg, seed=0):
    model = RADNeRF(cfg)
    key = jax.random.PRNGKey(seed)
    cond = jax.random.normal(key, (cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    return model, params, cond


@pytest.mark.parametrize("grid_type", ["fourier", "tiledgrid"])
def test_field_shapes_and_finiteness(grid_type):
    cfg = small_cfg(grid_type=grid_type)
    model, params, cond = build(cfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    dirs = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    sigma, rgb, amb = model.apply(params, xyz, dirs, cond)
    assert sigma.shape == (64,)
    assert rgb.shape == (64, 3)
    assert amb.shape == (64, cfg.ambient_coord_dim)
    assert (np.asarray(sigma) >= 0).all()
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    assert (np.abs(np.asarray(amb)) <= 1).all()  # tanh range


def test_cond_changes_output():
    cfg = small_cfg()
    model, params, cond = build(cfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.5, maxval=0.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (32, 1))
    s1, _, a1 = model.apply(params, xyz, dirs, cond)
    s2, _, a2 = model.apply(params, xyz, dirs, cond * 5.0 + 1.0)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_blink_cond_changes_output():
    cfg = small_cfg(add_eye_blink_cond=True)
    model, params, cond = build(cfg)
    f0 = model.apply(params, cond, jnp.zeros((1, 1)), method=RADNeRF.cal_cond_feat)
    f1 = model.apply(params, cond, jnp.ones((1, 1)) * 0.2, method=RADNeRF.cal_cond_feat)
    assert f0.shape == (1, cfg.cond_out_dim)
    assert not np.allclose(np.asarray(f0), np.asarray(f1))
    # blink only affects the first eye_blink_dim channels pre-attention;
    # post-attention both change, but the features must differ


def test_full_render_pipeline():
    cfg = small_cfg()
    model, params, cond = build(cfg)
    H = W = 16
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    occ = jnp.ones((cfg.grid_size,) * 3, bool)

    def field_fn(xyz, dirs):
        return model.apply(params, xyz, dirs, cond)

    opts = RenderOptions(num_coarse=24, num_samples=8)
    out = render_rays(
        field_fn, rays["rays_o"][0], rays["rays_d"][0], occ,
        bound=cfg.bound, min_near=cfg.min_near, bg_color=1.0, opts=opts,
    )
    img = np.asarray(out.rgb_map)
    assert img.shape == (H * W, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    assert np.isfinite(np.asarray(out.depth_map)).all()


def test_render_gradients_flow_to_all_param_groups():
    cfg = small_cfg()
    model, params, cond = build(cfg)
    rays_o = jnp.zeros((32, 3)).at[:, 2].set(-2.0)
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (32, 1))
    occ = jnp.ones((cfg.grid_size,) * 3, bool)
    opts = RenderOptions(num_coarse=16, num_samples=8)

    def loss(params):
        def field_fn(xyz, dirs):
            return model.apply(params, xyz, dirs, cond)

        out = render_rays(field_fn, rays_o, rays_d, occ, bound=1.0, min_near=0.05,
                          bg_color=0.0, opts=opts)
        return (out.rgb_map ** 2).sum()

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    zero_groups = [
        "/".join(str(k) for k in path)
        for path, leaf in flat
        if float(jnp.abs(leaf).sum()) == 0.0
    ]
    # every major submodule should receive gradient (blink path can be 0 as
    # eye_area_percent defaults to 0; individual embeddings only index 0 row)
    for needed in ["position_embedder", "ambient_net", "sigma_net", "color_net", "cond_prenet"]:
        assert not any(needed in z for z in zero_groups), (needed, zero_groups)
