"""Fused-field custom VJP: Pallas backward vs XLA autodiff of the same math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genefaceplusplus_tpu.ops.fastmath import fast_cos, fast_sin, fast_tanh
from genefaceplusplus_tpu.ops.pallas import fused_field as F


def _random_weights(key, amb_dim=3):
    ks = jax.random.split(key, 10)
    r = lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.1
    pos_B = r(ks[0], (8, 128)).at[3:].set(0.0)
    amb_B = r(ks[4], (128, 64)).at[amb_dim:].set(0.0)
    return F.FieldWeights(
        pos_B=pos_B,
        amb_w1=r(ks[1], (384, 128)).astype(jnp.bfloat16),
        amb_w2=r(ks[2], (128, 128)).astype(jnp.bfloat16),
        amb_w3=r(ks[3], (128, 128)).astype(jnp.bfloat16),
        amb_B=amb_B,
        sig_w1=r(ks[5], (384, 128)).astype(jnp.bfloat16),
        sig_w2=r(ks[6], (128, 128)).astype(jnp.bfloat16),
        sig_w3=r(ks[7], (128, 256)).astype(jnp.bfloat16),
        col_w1=r(ks[8], (256, 128)).astype(jnp.bfloat16),
        col_w2=r(ks[9], (128, 128)).astype(jnp.bfloat16),
    )


def _xla_reference(xyz, dirs, cond_feat, ind_code, w, amb_dim=3):
    """Pure-jnp re-statement of the kernel math (f32 throughout)."""
    f32 = jnp.float32
    N = xyz.shape[0]
    xyz8 = jnp.zeros((N, 8), f32).at[:, :3].set(xyz)
    dirs8 = jnp.zeros((N, 8), f32).at[:, :3].set(dirs)
    W = jax.tree.map(lambda a: a.astype(f32), w)

    cond128 = jnp.zeros((1, 128), f32).at[:, :64].set(cond_feat.reshape(1, 64))
    ind16 = jnp.zeros((1, 16), f32).at[:, : ind_code.shape[-1]].set(ind_code.reshape(1, -1))

    proj = xyz8 @ W.pos_B
    pos_feat = jnp.concatenate([fast_sin(proj), fast_cos(proj)], -1)
    amb_bias = cond128 @ W.amb_w1[256:]
    a1 = jax.nn.relu(pos_feat @ W.amb_w1[:256] + amb_bias)
    a2 = jax.nn.relu(a1 @ W.amb_w2)
    amb_logit = a2 @ W.amb_w3
    ids = jnp.arange(128)[None]
    amb_pos = jnp.where(ids < amb_dim, fast_tanh(amb_logit), 0.0)
    aproj = amb_pos @ W.amb_B
    amb_feat = jnp.concatenate([fast_sin(aproj), fast_cos(aproj)], -1)
    s1 = jax.nn.relu(pos_feat @ W.sig_w1[:256] + amb_feat @ W.sig_w1[256:384])
    s2 = jax.nn.relu(s1 @ W.sig_w2)
    sig_out = s2 @ W.sig_w3
    sigma = jnp.exp(jnp.clip(sig_out[:, 0], -15.0, 15.0))
    geo = sig_out[:, 1:129]
    sh = F._sh16(dirs8)
    col_bias = ind16 @ W.col_w1[144:160]
    c1 = jax.nn.relu(sh @ W.col_w1[:16] + geo @ W.col_w1[16:144] + col_bias)
    rgb_logit = c1 @ W.col_w2
    rgb = jax.nn.sigmoid(rgb_logit[:, :3])
    return sigma, rgb, amb_pos[:, :amb_dim]


def _loss(outs, coefs):
    sigma, rgb, amb = outs
    cs, cr, ca = coefs
    return jnp.sum(sigma * cs) + jnp.sum(rgb * cr) + jnp.sum(amb * ca)


@pytest.mark.parametrize("ind_dim", [4, 0])
def test_fused_vjp_matches_xla_autodiff(ind_dim):
    amb_dim = 3
    key = jax.random.PRNGKey(0)
    w = _random_weights(key, amb_dim)
    N = 40  # exercises tile padding (tile=32 below -> 2 tiles, 24 pad rows)
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(1), 5)
    xyz = jax.random.uniform(k1, (N, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(k2, (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cond = jax.random.normal(k3, (1, 64)) * 0.2
    ind = jax.random.normal(k4, (ind_dim,)) * 0.2 if ind_dim else jnp.zeros((0,))
    coefs = (jax.random.normal(k5, (N,)),
             jax.random.normal(k1, (N, 3)),
             jax.random.normal(k2, (N, amb_dim)))

    def loss_fused(cond, ind, w):
        outs = F.fused_field_train(xyz, dirs, cond, ind, w, amb_dim=amb_dim,
                                   tile=32, interpret=True)
        return _loss(outs, coefs)

    def loss_ref(cond, ind, w):
        return _loss(_xla_reference(xyz, dirs, cond, ind, w, amb_dim), coefs)

    # forward parity first
    np.testing.assert_allclose(loss_fused(cond, ind, w), loss_ref(cond, ind, w),
                               rtol=5e-2, atol=5e-2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(cond, ind, w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(cond, ind, w)

    def close(a, b, name):
        """bf16 kernel vs f32 reference: individual elements can flip on
        relu boundaries, so require directional agreement (cosine) + norm
        ratio + a loose normalised elementwise bound."""
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        assert a.shape == b.shape, name
        nb = max(np.linalg.norm(b), 1e-8)
        cos = float(a @ b) / max(np.linalg.norm(a) * nb, 1e-12)
        assert cos > 0.99, f"{name}: cosine {cos}"
        ratio = np.linalg.norm(a) / nb
        assert 0.9 < ratio < 1.1, f"{name}: norm ratio {ratio}"
        # loose elementwise sanity net only: a handful of elements sit on
        # relu boundaries that flip between bf16 and f32 evaluation
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=0.25,
                                   err_msg=f"grad mismatch: {name}")

    close(g_fused[0], g_ref[0], "cond_feat")
    if ind_dim:
        close(g_fused[1], g_ref[1], "ind_code")
    for name in F.FieldWeights._fields:
        close(getattr(g_fused[2], name), getattr(g_ref[2], name), name)


def test_fused_train_step_end_to_end_interpret():
    """make_train_step(use_fused_field=True) runs and its gradients update
    the real flax param tree (through the differentiable weight folding)."""
    import numpy as np

    from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.training.radnerf_task import (
        TaskHParams, create_train_state, make_train_step,
    )
    from genefaceplusplus_tpu.training.schedulers import make_radnerf_optimizer

    cfg = RADNeRFConfig(grid_size=16, individual_embedding_num=8)  # production widths
    model = RADNeRF(cfg)
    tx = make_radnerf_optimizer(1e-3)
    opts = RenderOptions(num_samples=2, perturb=False, march_mode="interval")
    state = create_train_state(model, tx, jax.random.PRNGKey(0))
    R = 8
    batch = {
        "rays_o": jnp.zeros((R, 3)).at[:, 2].set(-2.0),
        "rays_d": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1)),
        "cond": jnp.zeros((cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim)),
        "gt_rgb": jax.random.uniform(jax.random.PRNGKey(1), (R, 3)),
        "bg_color": jnp.ones((R, 3)),
        "face_mask": jnp.zeros((R,), bool),
        "idx": 0,
        "eye_area_percent": jnp.zeros((1, 1)),
    }
    occ = jnp.ones((16, 16, 16), bool)
    step = make_train_step(model, tx, opts, TaskHParams(),
                           use_fused_field=True, fused_tile=16,
                           fused_interpret=True)
    new_state, m = step(state, batch, occ)
    assert np.isfinite(float(m["total_loss"]))
    # the field weights (incl. the Fourier B) actually moved
    for path in (("sigma_net", "Dense_0", "kernel"), ("position_embedder", "B")):
        a = state.params["params"]
        b = new_state.params["params"]
        for k in path:
            a, b = a[k], b[k]
        assert not np.allclose(np.asarray(a), np.asarray(b)), path


def test_fused_vjp_zero_for_nondiff_inputs():
    w = _random_weights(jax.random.PRNGKey(0))
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
    cond = jnp.zeros((1, 64))
    ind = jnp.zeros((4,))

    def loss(xyz, dirs):
        s, r, a = F.fused_field_train(xyz, dirs, cond, ind, w, tile=16, interpret=True)
        return jnp.sum(s) + jnp.sum(r)

    gx, gd = jax.grad(loss, argnums=(0, 1))(xyz, dirs)
    assert (np.asarray(gx) == 0).all() and (np.asarray(gd) == 0).all()
