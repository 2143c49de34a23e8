"""Pallas fused-field kernel vs the XLA reference model path."""

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig
from genefaceplusplus_tpu.ops.pallas.fused_field import (
    FieldWeights,
    fused_field_eval,
    weights_from_params,
)


def test_fused_field_matches_model():
    cfg = RADNeRFConfig(
        grid_type="fourier",
        fourier_pos_features=128,
        fourier_amb_features=64,
        hidden_dim_ambient=128,
        hidden_dim_sigma=128,
        hidden_dim_color=128,
        geo_feat_dim=128,
        cond_out_dim=64,
        ambient_coord_dim=3,
        individual_embedding_num=16,
        individual_embedding_dim=4,
        smo_win_size=3,
    )
    model = RADNeRF(cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)

    N = 300  # deliberately not a tile multiple
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    cond_feat = model.apply(params, cond, method=RADNeRF.cal_cond_feat)
    ind = model.apply(params, 0, method=RADNeRF.get_individual_code)
    sigma_ref, rgb_ref, amb_ref = model.apply(params, xyz, dirs, cond_feat, ind, method=RADNeRF.field)

    w = weights_from_params(params, cfg, bound=cfg.bound)
    sigma, rgb, amb = fused_field_eval(
        xyz, dirs, cond_feat, ind, w, amb_dim=3, bound=cfg.bound, tile=256, interpret=True
    )
    # the kernel runs its MLP matmuls in bf16 (the production inference
    # precision, matching the reference's fp16 autocast); compare at
    # bf16-level tolerances, sigma in log space (exp amplifies)
    np.testing.assert_allclose(
        np.log(np.asarray(sigma) + 1e-6), np.log(np.asarray(sigma_ref) + 1e-6), atol=0.3
    )
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=0.08)
    np.testing.assert_allclose(np.asarray(amb), np.asarray(amb_ref), atol=0.05)
    # correlation sanity: bf16 noise must not decorrelate the fields.
    # sigma is excluded: at random init log-sigma is near-constant, so its
    # correlation is dominated by bf16 noise (its atol bound above suffices)
    for a, b in ((np.asarray(rgb), np.asarray(rgb_ref)), (np.asarray(amb), np.asarray(amb_ref))):
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.98
