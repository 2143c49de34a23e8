"""field_act_dtype=bfloat16: same params, halved activation traffic,
f32-close outputs (the TPU analogue of the reference's fp16 AMP inference,
genefacepp_infer.py:458,474)."""

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.models.radnerf import RADNeRF, RADNeRFConfig

CFG = dict(grid_size=16, individual_embedding_num=4, smo_win_size=3,
           fourier_pos_features=32, fourier_amb_features=16,
           hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32,
           geo_feat_dim=16)


def _outputs(field_act_dtype):
    cfg = RADNeRFConfig(field_act_dtype=field_act_dtype, **CFG)
    model = RADNeRF(cfg)
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (3, 1, 204))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (256, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = model.init(key, pos[:8], dirs[:8], cond)
    sigma, color, amb = model.apply(params, pos, dirs, cond)
    return params, np.asarray(sigma), np.asarray(color), np.asarray(amb)


def test_bf16_field_matches_f32_closely():
    """Same init (params are dtype-independent) -> bf16 compute tracks f32:
    color within bf16 resolution, sigma within a small relative error."""
    p32, s32, c32, a32 = _outputs("float32")
    pbf, sbf, cbf, abf = _outputs("bfloat16")
    # identical param pytrees: dtype is a compute property, not a param one
    chex_equal = jax.tree.map(lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), p32, pbf)
    assert all(jax.tree.leaves(chex_equal))
    assert np.all(np.isfinite(sbf)) and np.all(np.isfinite(cbf))
    # color in [0,1]: random-weight logits sit at sigmoid's steepest point,
    # so the worst pixel sees ~bf16-logit-error/4; trained-identity quality
    # is gated separately by the TPU eval (quality_production eval with
    # field_act_dtype override)
    assert np.max(np.abs(cbf - c32)) < 0.10, np.max(np.abs(cbf - c32))
    assert np.mean(np.abs(cbf - c32)) < 0.02, np.mean(np.abs(cbf - c32))
    # sigma = trunc_exp(logit): compare in log space (relative); bf16's
    # ~2-decimal mantissa puts the worst random-weight point around 6%
    rel = np.abs(np.log1p(sbf) - np.log1p(s32)) / (np.abs(np.log1p(s32)) + 1.0)
    assert np.max(rel) < 0.15, np.max(rel)
    assert np.mean(rel) < 0.02, np.mean(rel)
    # outputs stay f32 regardless of compute dtype (renderer contract)
    assert sbf.dtype == np.float32 and cbf.dtype == np.float32


def test_default_is_f32_and_bitstable():
    """No knob -> the exact pre-knob behavior (f32 everywhere)."""
    _, s1, c1, _ = _outputs("float32")
    _, s2, c2, _ = _outputs("float32")
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(c1, c2)


def test_field_act_dtype_flows_from_hparams():
    """yaml/hparams key -> RADNeRFConfig -> MLP compute dtype (the egs
    surface: egs/egs_bases/radnerf/base.yaml field_act_dtype)."""
    cfg = RADNeRFConfig.from_hparams({"field_act_dtype": "bfloat16"})
    assert cfg.field_act_dtype == "bfloat16"
    assert RADNeRFConfig.from_hparams({}).field_act_dtype == "float32"
