"""Multi-chip (virtual 8-device CPU mesh) sharded rendering tests."""

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.inference.serving import ShardedFrameRenderer
from genefaceplusplus_tpu.models.full_renderer import render_full_frame
from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.models.renderer import RenderOptions
from genefaceplusplus_tpu.parallel.mesh import make_mesh
from genefaceplusplus_tpu.utils.rays import get_bg_coords, get_rays


def test_sharded_frame_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    H = W = 16  # 256 rays -> 32/device
    cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=8, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32, geo_feat_dim=16,
    )
    model = RADNeRF(cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    opts = RenderOptions(num_coarse=16, num_samples=8)

    def frame_fn(head_params, torso_params, sr_params, rays_o, rays_d,
                 cond_win, eye_area, occupancy, bg_color, bg_coords, lm68):
        out = render_full_frame(
            model, head_params, rays_o, rays_d, cond_win, occupancy,
            bg_color=bg_color, opts=opts, image_hw=(H, W), eye_area_percent=eye_area,
        )
        return out.rgb_map

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    occ = jnp.ones((16, 16, 16), bool)
    args = (
        params, None, None, rays["rays_o"][0], rays["rays_d"][0], cond,
        jnp.zeros((1, 1)), occ, jnp.ones((H * W, 3)), get_bg_coords(H, W)[0],
        jnp.zeros((1, 68, 2)),
    )

    single = jax.jit(frame_fn)(*args)
    mesh = make_mesh(8)
    sharded = ShardedFrameRenderer(frame_fn, mesh)(*args)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=3e-4)


def test_mesh_helpers():
    from genefaceplusplus_tpu.parallel.mesh import ray_sharding, replicated, shard_rays

    mesh = make_mesh(8)
    x = jnp.zeros((64, 3))
    xs = shard_rays(mesh, x)
    assert xs.sharding.spec == ray_sharding(mesh).spec
    assert replicated(mesh).spec == jax.sharding.PartitionSpec()


def test_sharded_frame_with_compaction_and_topk():
    """compact_frac + color_topk under the rays-sharded mesh: GSPMD must
    partition the cumsum/top_k (or insert collectives) and match the
    single-device exact render when the budget covers the live count."""
    assert jax.device_count() >= 8
    H = W = 16
    cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=8, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32, geo_feat_dim=16,
    )
    model = RADNeRF(cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    # compact occupancy -> real dead samples for the compaction to skip
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, 16)] * 3), indexing="ij")
    occ = jnp.asarray((xx ** 2 + (2 * yy) ** 2 + zz ** 2) < 0.3)

    def make_fn(opts):
        def frame_fn(head_params, torso_params, sr_params, rays_o, rays_d,
                     cond_win, eye_area, occupancy, bg_color, bg_coords, lm68):
            out = render_full_frame(
                model, head_params, rays_o, rays_d, cond_win, occupancy,
                bg_color=bg_color, opts=opts, image_hw=(H, W),
                eye_area_percent=eye_area,
            )
            return out.rgb_map
        return frame_fn

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(jnp.asarray(pose[None]), (2.0 * W, 2.0 * H, W / 2, H / 2), H, W)
    args = (
        params, None, None, rays["rays_o"][0], rays["rays_d"][0], cond,
        jnp.zeros((1, 1)), occ, jnp.ones((H * W, 3)), get_bg_coords(H, W)[0],
        jnp.zeros((1, 68, 2)),
    )
    exact = jax.jit(make_fn(RenderOptions(num_coarse=16, num_samples=8)))(*args)
    mesh = make_mesh(8)
    fast_opts = RenderOptions(num_coarse=16, num_samples=8, compact_frac=0.9,
                              color_topk=8)
    sharded = ShardedFrameRenderer(make_fn(fast_opts), mesh)(*args)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(exact), atol=3e-4)
