"""Fused RAD-NeRF field evaluation as ONE Pallas TPU kernel.

The XLA path runs the field as ~10 separate matmul HLOs; between layers the
[N, 128] activations round-trip through HBM (~0.5 GB of traffic per layer
boundary at 1M points/frame). This kernel keeps every weight matrix
(~0.6 MB total) and the activation tile resident in VMEM and chains:

  xyz -> Fourier proj -> sin/cos -> [pos_feat | cond] -> ambient MLP (3)
      -> tanh -> ambient Fourier -> [pos_feat | amb_feat] -> sigma MLP (3)
      -> trunc_exp -> [SH(dirs) | geo | ind] -> color MLP (2) -> sigmoid

so HBM traffic is exactly: read xyz+dirs tiles, write one [T, 128] packed
output row per point. Inference fast path (training uses the XLA path,
which autodiffs; a custom VJP kernel is future work).

Packed output layout per point (PACK_* indices below):
  [0]=sigma, [1:4]=rgb, [4:4+amb_dim]=ambient_pos, rest zero.

Restrictions (asserted): all hidden widths 128, pos feats 128, amb feats 64,
cond 64, geo 128 — the production flagship config.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genefaceplusplus_tpu.ops.fastmath import fast_cos, fast_sin, fast_tanh

PACK_SIGMA = 0
PACK_RGB = slice(1, 4)


def pack_amb(amb_dim: int) -> slice:
    return slice(4, 4 + amb_dim)


class FieldWeights(NamedTuple):
    """All field weights, padded to lane-aligned shapes (see `from_params`)."""

    pos_B: jnp.ndarray  # [8, 128]   (xyz pad 3->8) * 2pi/bound folded in
    amb_w1: jnp.ndarray  # [384, 128] rows: 256 pos_feat + 64 cond + pad
    amb_w2: jnp.ndarray  # [128, 128]
    amb_w3: jnp.ndarray  # [128, 128] cols: amb_dim valid
    amb_B: jnp.ndarray  # [128, 64]  rows: amb_dim valid, * 2pi folded in
    sig_w1: jnp.ndarray  # [384, 128] rows: 256 pos_feat + 128 amb_feat
    sig_w2: jnp.ndarray  # [128, 128]
    sig_w3: jnp.ndarray  # [128, 256] cols: 1 sigma + 128 geo + pad
    col_w1: jnp.ndarray  # [256, 128] rows: 16 SH + 128 geo + ind_dim + pad
    col_w2: jnp.ndarray  # [128, 128] cols: 3 rgb valid


def weights_from_params(params, cfg, bound: float = 1.0) -> FieldWeights:
    """Fold a flax RADNeRF param tree (grid_type='fourier') into kernel form."""
    p = params["params"]
    c = cfg
    assert c.grid_type == "fourier"
    assert c.fourier_pos_features == 128 and c.fourier_amb_features == 64
    assert c.hidden_dim_ambient == 128 and c.hidden_dim_sigma == 128 and c.hidden_dim_color == 128
    assert c.geo_feat_dim == 128 and c.cond_out_dim == 64

    two_pi = 2.0 * math.pi

    def pad(x, shape, dtype=jnp.bfloat16):
        out = np.zeros(shape, np.float32)
        out[: x.shape[0], : x.shape[1]] = np.asarray(x, np.float32)
        return jnp.asarray(out, dtype=dtype)

    pos_B = pad(np.asarray(p["position_embedder"]["B"]).T * (two_pi / bound), (8, 128), jnp.float32)
    amb = p["ambient_net"]
    amb_w1 = pad(amb["Dense_0"]["kernel"], (384, 128))
    amb_w2 = pad(amb["Dense_1"]["kernel"], (128, 128))
    amb_w3 = pad(amb["Dense_2"]["kernel"], (128, 128))
    amb_B = pad(np.asarray(p["ambient_embedder"]["B"]).T * two_pi, (128, 64), jnp.float32)
    sig = p["sigma_net"]
    sig_w1 = pad(sig["Dense_0"]["kernel"], (384, 128))
    sig_w2 = pad(sig["Dense_1"]["kernel"], (128, 128))
    sig_w3 = pad(sig["Dense_2"]["kernel"], (128, 256))
    col = p["color_net"]
    col_w1 = pad(col["Dense_0"]["kernel"], (256, 128))
    col_w2 = pad(col["Dense_1"]["kernel"], (128, 128))
    return FieldWeights(pos_B, amb_w1, amb_w2, amb_w3, amb_B,
                        sig_w1, sig_w2, sig_w3, col_w1, col_w2)


def _sh16(d):
    """Degree-4 real SH basis, [T, 16] (ops/sh_encoder.py inlined for fusion)."""
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    cols = [
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (x2 - y2),
        0.59004358992664352 * y * (-3.0 * x2 + y2),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
    ]
    return jnp.stack(cols, axis=-1)


def _kernel(amb_dim, ind_dim,
            xyz_ref, dirs_ref, amb_bias_ref, col_bias_ref,
            pos_B, amb_w1p, amb_w2, amb_w3, amb_B,
            sig_w1p, sig_w1a, sig_w2, sig_w3, col_w1s, col_w1g, col_w2,
            out_ref):
    """Split-dot formulation: no concat buffers, per-frame constant terms
    (cond @ W, ind @ W) arrive as precomputed biases. MLP matmuls bf16 with
    f32 accumulation; Fourier projections/sin/cos/tanh/exp stay f32."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    dot = functools.partial(jnp.dot, preferred_element_type=f32)
    T = xyz_ref.shape[0]

    xyz = xyz_ref[:]  # [T, 8] f32
    proj = dot(xyz, pos_B[:])  # [T, 128] f32 (high-frequency: keep f32)
    pos_feat = jnp.concatenate([fast_sin(proj), fast_cos(proj)], axis=-1).astype(bf16)

    # ambient MLP; cond contribution folded into amb_bias
    h = jnp.maximum(dot(pos_feat, amb_w1p[:]) + amb_bias_ref[:], 0.0).astype(bf16)
    h = jnp.maximum(dot(h, amb_w2[:]), 0.0).astype(bf16)
    amb_logit = dot(h, amb_w3[:])  # [T, 128] f32
    col_ids = jax.lax.broadcasted_iota(jnp.int32, amb_logit.shape, 1)
    amb_pos = jnp.where(col_ids < amb_dim, fast_tanh(amb_logit), 0.0)

    aproj = dot(amb_pos, amb_B[:])  # [T, 64] f32
    amb_feat = jnp.concatenate([fast_sin(aproj), fast_cos(aproj)], axis=-1).astype(bf16)

    # sigma MLP; first layer split over (pos_feat | amb_feat)
    h = jnp.maximum(dot(pos_feat, sig_w1p[:]) + dot(amb_feat, sig_w1a[:]), 0.0).astype(bf16)
    h = jnp.maximum(dot(h, sig_w2[:]), 0.0).astype(bf16)
    sig_out = dot(h, sig_w3[:])  # [T, 256] f32
    sigma = jnp.exp(jnp.clip(sig_out[:, 0:1], -15.0, 15.0))  # trunc_exp fwd
    geo = sig_out[:, 1:129].astype(bf16)  # [T, 128]

    dirs = dirs_ref[:]  # [T, 8]
    sh = _sh16(dirs).astype(bf16)  # [T, 16]
    # color MLP; first layer split over (SH | geo), ind folded into col_bias
    h = jnp.maximum(
        dot(sh, col_w1s[:]) + dot(geo, col_w1g[:]) + col_bias_ref[:], 0.0
    ).astype(bf16)
    rgb_logit = dot(h, col_w2[:])  # [T, 128] f32
    rgb = 1.0 / (1.0 + jnp.exp(-rgb_logit[:, 0:3]))

    out = jnp.concatenate(
        [sigma, rgb, amb_pos[:, :amb_dim],
         jnp.zeros((T, 128 - 4 - amb_dim), f32)], axis=-1,
    )
    out_ref[:] = out


def fused_field_eval(
    xyz: jnp.ndarray,  # [N, 3] in [-bound, bound]
    dirs: jnp.ndarray,  # [N, 3]
    cond_feat: jnp.ndarray,  # [1, 64]
    ind_code: jnp.ndarray,  # [ind_dim] (<= 16)
    weights: FieldWeights,
    amb_dim: int = 3,
    bound: float = 1.0,
    tile: int = 1024,
    interpret: bool = False,
):
    """Returns (sigma [N], rgb [N,3], ambient_pos [N, amb_dim])."""
    N = xyz.shape[0]
    n_pad = (N + tile - 1) // tile * tile
    ind_dim = int(ind_code.shape[-1]) if ind_code is not None else 0

    def pad_pts(a, w):
        out = jnp.zeros((n_pad, w), jnp.float32)
        return out.at[:N, : a.shape[-1]].set(a.astype(jnp.float32))

    # NOTE: bound scaling of xyz is folded into pos_B (weights_from_params)
    xyz8 = pad_pts(xyz, 8)
    dirs8 = pad_pts(dirs, 8)

    # per-frame constant contributions become biases (computed once, not per point)
    cond128 = jnp.zeros((1, 128), jnp.float32).at[:, :64].set(cond_feat.reshape(1, 64))
    amb_w1p = weights.amb_w1[:256]          # pos_feat rows
    amb_w1c = weights.amb_w1[256:]          # cond rows (padded to 128)
    amb_bias = (cond128.astype(jnp.bfloat16) @ amb_w1c).astype(jnp.float32)  # [1, 128]
    sig_w1p = weights.sig_w1[:256]
    sig_w1a = weights.sig_w1[256:384]
    col_w1s = weights.col_w1[:16]           # SH rows
    col_w1g = weights.col_w1[16:144]        # geo rows
    col_w1i = weights.col_w1[144:160]       # ind rows
    ind16 = jnp.zeros((1, 16), jnp.float32)
    if ind_code is not None and ind_dim > 0:
        ind16 = ind16.at[:, :ind_dim].set(ind_code.reshape(1, -1))
    col_bias = (ind16.astype(jnp.bfloat16) @ col_w1i).astype(jnp.float32)  # [1, 128]

    grid = (n_pad // tile,)
    pt_spec = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    mats = (weights.pos_B, amb_w1p, weights.amb_w2, weights.amb_w3, weights.amb_B,
            sig_w1p, sig_w1a, weights.sig_w2, weights.sig_w3, col_w1s, col_w1g,
            weights.col_w2)
    out = pl.pallas_call(
        functools.partial(_kernel, amb_dim, ind_dim),
        grid=grid,
        in_specs=[
            pt_spec(8), pt_spec(8), full(amb_bias), full(col_bias),
            *[full(w) for w in mats],
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        # tiles > 1024 need the scoped-VMEM cap raised (Mosaic keeps all
        # chained intermediates live); measured: tile=4096 @100MB runs at
        # ~18ms/1M pts, tile=2048 thrashes — see docs/DESIGN.md
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 * 2 ** 20 if tile > 1024 else None)
        ) if tile > 1024 else None,
        interpret=interpret,
    )(xyz8, dirs8, amb_bias, col_bias, *mats)

    out = out[:N]
    return out[:, PACK_SIGMA], out[:, PACK_RGB], out[:, pack_amb(amb_dim)]
