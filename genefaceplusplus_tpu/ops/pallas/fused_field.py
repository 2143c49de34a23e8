"""Fused RAD-NeRF field evaluation as ONE Pallas TPU kernel.

The XLA path runs the field as ~10 separate matmul HLOs; between layers the
[N, 128] activations round-trip through HBM (~0.5 GB of traffic per layer
boundary at 1M points/frame). This kernel keeps every weight matrix
(~0.6 MB total) and the activation tile resident in VMEM and chains:

  xyz -> Fourier proj -> sin/cos -> [pos_feat | cond] -> ambient MLP (3)
      -> tanh -> ambient Fourier -> [pos_feat | amb_feat] -> sigma MLP (3)
      -> trunc_exp -> [SH(dirs) | geo | ind] -> color MLP (2) -> sigmoid

so HBM traffic is exactly: read xyz+dirs tiles, write one [T, 128] packed
output row per point. `fused_field_train` adds a custom VJP whose backward
is a second Pallas kernel (recompute-in-VMEM: activations are rebuilt per
tile, weight grads accumulate across the sequential grid), so training can
run the fused kernel end to end.

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


def weights_from_params_jnp(params, cfg, bound: float = 1.0) -> FieldWeights:
    """Differentiable variant of weights_from_params: pure jnp padding, so
    jax.grad flows from FieldWeights grads (fused_field_train's custom VJP)
    back into the flax param tree. Weight dtypes follow weights_from_params
    (MLP mats bf16, Fourier B f32)."""
    p = params["params"]
    c = cfg
    assert c.grid_type == "fourier"
    two_pi = 2.0 * math.pi

    def pad(x, shape, dtype=jnp.bfloat16):
        x = jnp.asarray(x, jnp.float32)
        out = jnp.zeros(shape, jnp.float32)
        out = out.at[: x.shape[0], : x.shape[1]].set(x)
        return out.astype(dtype)

    f32 = jnp.float32
    pos_B = pad(p["position_embedder"]["B"].T * (two_pi / bound), (8, 128), f32)
    amb = p["ambient_net"]
    sig = p["sigma_net"]
    col = p["color_net"]
    return FieldWeights(
        pos_B=pos_B,
        amb_w1=pad(amb["Dense_0"]["kernel"], (384, 128)),
        amb_w2=pad(amb["Dense_1"]["kernel"], (128, 128)),
        amb_w3=pad(amb["Dense_2"]["kernel"], (128, 128)),
        amb_B=pad(p["ambient_embedder"]["B"].T * two_pi, (128, 64), f32),
        sig_w1=pad(sig["Dense_0"]["kernel"], (384, 128)),
        sig_w2=pad(sig["Dense_1"]["kernel"], (128, 128)),
        sig_w3=pad(sig["Dense_2"]["kernel"], (128, 256)),
        col_w1=pad(col["Dense_0"]["kernel"], (256, 128)),
        col_w2=pad(col["Dense_1"]["kernel"], (128, 128)),
    )


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


# ---------------------------------------------------------------------------
# Training path: custom VJP with a Pallas backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(amb_dim,
                xyz_ref, dirs_ref, amb_bias_ref, col_bias_ref,
                pos_B, amb_w1p, amb_w2, amb_w3, amb_B,
                sig_w1p, sig_w1a, sig_w2, sig_w3, col_w1s, col_w1g, col_w2,
                gout_ref,
                # accumulated weight grads (block (0,0) every step)
                g_pos_B, g_amb_w1p, g_amb_bias, g_amb_w2, g_amb_w3, g_amb_B,
                g_sig_w1p, g_sig_w1a, g_sig_w2, g_sig_w3,
                g_col_w1s, g_col_w1g, g_col_bias, g_col_w2):
    """Recompute the forward chain for this tile, then backprop it.

    Derivatives use the exact functions (cos for sin, sech^2 for tanh,
    sigmoid' for sigmoid) — the forward's polynomial approximations are
    faithful enough that their analytic derivatives match to training
    precision. MXU matmuls bf16 with f32 accumulation, like the forward.
    """
    f32, bf16 = jnp.float32, jnp.bfloat16
    dot = functools.partial(jnp.dot, preferred_element_type=f32)
    T = xyz_ref.shape[0]

    # ---- forward recompute (mirrors _kernel) ----
    xyz = xyz_ref[:]
    proj = dot(xyz, pos_B[:])
    sin_p, cos_p = fast_sin(proj), fast_cos(proj)
    pos_feat = jnp.concatenate([sin_p, cos_p], axis=-1).astype(bf16)

    a1 = jnp.maximum(dot(pos_feat, amb_w1p[:]) + amb_bias_ref[:], 0.0)
    a1b = a1.astype(bf16)
    a2 = jnp.maximum(dot(a1b, amb_w2[:]), 0.0)
    a2b = a2.astype(bf16)
    amb_logit = dot(a2b, amb_w3[:])
    col_ids = jax.lax.broadcasted_iota(jnp.int32, amb_logit.shape, 1)
    amb_mask = col_ids < amb_dim
    amb_pos = jnp.where(amb_mask, fast_tanh(amb_logit), 0.0)

    aproj = dot(amb_pos, amb_B[:])
    sin_a, cos_a = fast_sin(aproj), fast_cos(aproj)
    amb_feat = jnp.concatenate([sin_a, cos_a], axis=-1).astype(bf16)

    s1 = jnp.maximum(dot(pos_feat, sig_w1p[:]) + dot(amb_feat, sig_w1a[:]), 0.0)
    s1b = s1.astype(bf16)
    s2 = jnp.maximum(dot(s1b, sig_w2[:]), 0.0)
    s2b = s2.astype(bf16)
    sig_out = dot(s2b, sig_w3[:])
    sig_logit = sig_out[:, 0:1]
    sigma = jnp.exp(jnp.clip(sig_logit, -15.0, 15.0))
    geo = sig_out[:, 1:129].astype(bf16)

    dirs = dirs_ref[:]
    sh = _sh16(dirs).astype(bf16)
    c1 = jnp.maximum(dot(sh, col_w1s[:]) + dot(geo, col_w1g[:]) + col_bias_ref[:], 0.0)
    c1b = c1.astype(bf16)
    rgb_logit = dot(c1b, col_w2[:])
    rgb = 1.0 / (1.0 + jnp.exp(-rgb_logit[:, 0:3]))

    # ---- backward ----
    gout = gout_ref[:]  # [T, 128] packed: [0]=sigma, [1:4]=rgb, [4:4+amb]=amb
    g_sigma = gout[:, 0:1]
    g_rgb = gout[:, 1:4]
    g_amb_direct = jnp.pad(
        gout[:, 4 : 4 + amb_dim], ((0, 0), (0, 128 - amb_dim))
    )  # [T, 128]; cols >= amb_dim zero

    out_ids = jax.lax.broadcasted_iota(jnp.int32, rgb_logit.shape, 1)
    g_rgb_logit = jnp.where(
        out_ids < 3,
        jnp.pad(g_rgb * rgb * (1.0 - rgb), ((0, 0), (0, 125))),
        0.0,
    ).astype(bf16)
    _acc(g_col_w2, dot(c1b.T, g_rgb_logit))
    g_c1 = (dot(g_rgb_logit, col_w2[:].T) * (c1 > 0.0)).astype(bf16)
    _acc(g_col_w1s, dot(sh.T, g_c1))
    _acc(g_col_w1g, dot(geo.T, g_c1))
    _acc_row0(g_col_bias, jnp.sum(g_c1.astype(f32), axis=0, keepdims=True))
    g_geo = dot(g_c1, col_w1g[:].T)  # [T, 128]

    in_range = (sig_logit > -15.0) & (sig_logit < 15.0)
    g_sig0 = jnp.where(in_range, g_sigma * sigma, 0.0)
    g_sig_out = jnp.concatenate(
        [g_sig0, g_geo, jnp.zeros((T, 127), f32)], axis=-1
    ).astype(bf16)  # [T, 256]
    _acc(g_sig_w3, dot(s2b.T, g_sig_out))
    g_s2 = (dot(g_sig_out, sig_w3[:].T) * (s2 > 0.0)).astype(bf16)
    _acc(g_sig_w2, dot(s1b.T, g_s2))
    g_s1 = (dot(g_s2, sig_w2[:].T) * (s1 > 0.0)).astype(bf16)
    _acc(g_sig_w1p, dot(pos_feat.T, g_s1))
    _acc(g_sig_w1a, dot(amb_feat.T, g_s1))
    g_pos_feat_s = dot(g_s1, sig_w1p[:].T)  # [T, 256] f32
    g_amb_feat = dot(g_s1, sig_w1a[:].T)  # [T, 128]

    g_aproj = g_amb_feat[:, :64] * cos_a - g_amb_feat[:, 64:] * sin_a  # [T, 64]
    _acc(g_amb_B, dot(amb_pos.astype(bf16).T, g_aproj.astype(bf16)))
    g_amb_pos = dot(g_aproj.astype(bf16), amb_B[:].astype(bf16).T) + g_amb_direct
    g_amb_logit = jnp.where(
        amb_mask, g_amb_pos * (1.0 - amb_pos * amb_pos), 0.0
    ).astype(bf16)
    _acc(g_amb_w3, dot(a2b.T, g_amb_logit))
    g_a2 = (dot(g_amb_logit, amb_w3[:].T) * (a2 > 0.0)).astype(bf16)
    _acc(g_amb_w2, dot(a1b.T, g_a2))
    g_a1 = (dot(g_a2, amb_w2[:].T) * (a1 > 0.0)).astype(bf16)
    _acc(g_amb_w1p, dot(pos_feat.T, g_a1))
    _acc_row0(g_amb_bias, jnp.sum(g_a1.astype(f32), axis=0, keepdims=True))
    g_pos_feat = g_pos_feat_s + dot(g_a1, amb_w1p[:].T)  # [T, 256]

    g_proj = g_pos_feat[:, :128] * cos_p - g_pos_feat[:, 128:] * sin_p
    _acc(g_pos_B, dot(xyz.astype(bf16).T, g_proj.astype(bf16)))


def _acc(ref, val):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ref[:] = jnp.zeros_like(ref)

    ref[:] = ref[:] + val.astype(ref.dtype)


def _acc_row0(ref, row):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ref[:] = jnp.zeros_like(ref)

    ref[0:1, :] = ref[0:1, :] + row.astype(ref.dtype)


def _fused_backward(xyz8, dirs8, amb_bias, col_bias, mats, gout_pad,
                    amb_dim: int, tile: int, interpret: bool):
    """Run the backward kernel; returns grads aligned with `mats` order plus
    (g_amb_bias [1,128], g_col_bias [1,128])."""
    n_pad = xyz8.shape[0]
    grid = (n_pad // tile,)
    pt_spec = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    acc_spec = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0), memory_space=pltpu.VMEM)

    (pos_B, amb_w1p, amb_w2, amb_w3, amb_B,
     sig_w1p, sig_w1a, sig_w2, sig_w3, col_w1s, col_w1g, col_w2) = mats
    grad_shapes = [
        pos_B.shape, amb_w1p.shape, (8, 128), amb_w2.shape, amb_w3.shape,
        amb_B.shape, sig_w1p.shape, sig_w1a.shape, sig_w2.shape, sig_w3.shape,
        col_w1s.shape, col_w1g.shape, (8, 128), col_w2.shape,
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, amb_dim),
        grid=grid,
        in_specs=[
            pt_spec(8), pt_spec(8), full(amb_bias), full(col_bias),
            *[full(w) for w in mats], pt_spec(128),
        ],
        out_specs=tuple(acc_spec(s) for s in grad_shapes),
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(xyz8, dirs8, amb_bias, col_bias, *mats, gout_pad)
    return outs


@functools.lru_cache(maxsize=8)
def _make_fused_field_train(amb_dim: int, ind_dim: int, bound: float,
                            tile: int, interpret: bool):
    """custom_vjp-wrapped fused field: (xyz, dirs, cond_feat, ind_code,
    weights) -> (sigma, rgb, ambient_pos), differentiable w.r.t. cond_feat,
    ind_code, and every FieldWeights matrix (xyz/dirs get zero grads — they
    come from the marcher and are not optimised)."""

    def _prep(xyz, dirs, cond_feat, ind_code, weights):
        N = xyz.shape[0]
        n_pad = (N + tile - 1) // tile * tile

        def pad_pts(a, w):
            out = jnp.zeros((n_pad, w), jnp.float32)
            return out.at[:N, : a.shape[-1]].set(a.astype(jnp.float32))

        xyz8, dirs8 = pad_pts(xyz, 8), pad_pts(dirs, 8)
        cond128 = jnp.zeros((1, 128), jnp.float32).at[:, :64].set(cond_feat.reshape(1, 64))
        amb_w1p, amb_w1c = weights.amb_w1[:256], weights.amb_w1[256:]
        amb_bias = (cond128.astype(jnp.bfloat16) @ amb_w1c).astype(jnp.float32)
        sig_w1p, sig_w1a = weights.sig_w1[:256], weights.sig_w1[256:384]
        col_w1s, col_w1g, col_w1i = (weights.col_w1[:16], weights.col_w1[16:144],
                                     weights.col_w1[144:160])
        ind16 = jnp.zeros((1, 16), jnp.float32)
        if ind_dim > 0:
            ind16 = ind16.at[:, :ind_dim].set(ind_code.reshape(1, -1))
        col_bias = (ind16.astype(jnp.bfloat16) @ col_w1i).astype(jnp.float32)
        mats = (weights.pos_B, amb_w1p, weights.amb_w2, weights.amb_w3,
                weights.amb_B, sig_w1p, sig_w1a, weights.sig_w2, weights.sig_w3,
                col_w1s, col_w1g, weights.col_w2)
        return xyz8, dirs8, cond128, ind16, amb_bias, col_bias, mats, N, n_pad

    def fwd_impl(xyz, dirs, cond_feat, ind_code, weights):
        return fused_field_eval(xyz, dirs, cond_feat,
                                ind_code if ind_dim > 0 else jnp.zeros((0,)),
                                weights, amb_dim=amb_dim, bound=bound,
                                tile=tile, interpret=interpret)

    @jax.custom_vjp
    def f(xyz, dirs, cond_feat, ind_code, weights):
        return fwd_impl(xyz, dirs, cond_feat, ind_code, weights)

    def f_fwd(xyz, dirs, cond_feat, ind_code, weights):
        out = fwd_impl(xyz, dirs, cond_feat, ind_code, weights)
        return out, (xyz, dirs, cond_feat, ind_code, weights)

    def f_bwd(res, g):
        xyz, dirs, cond_feat, ind_code, weights = res
        g_sigma, g_rgb, g_amb = g
        (xyz8, dirs8, cond128, ind16, amb_bias, col_bias, mats, N, n_pad) = _prep(
            xyz, dirs, cond_feat, ind_code, weights)

        gout = jnp.zeros((n_pad, 128), jnp.float32)
        gout = gout.at[:N, 0].set(g_sigma.astype(jnp.float32))
        gout = gout.at[:N, 1:4].set(g_rgb.astype(jnp.float32))
        gout = gout.at[:N, 4 : 4 + amb_dim].set(g_amb.astype(jnp.float32))

        (g_pos_B, g_amb_w1p, g_amb_bias8, g_amb_w2, g_amb_w3, g_amb_B,
         g_sig_w1p, g_sig_w1a, g_sig_w2, g_sig_w3,
         g_col_w1s, g_col_w1g, g_col_bias8, g_col_w2) = _fused_backward(
            xyz8, dirs8, amb_bias, col_bias, mats, gout,
            amb_dim, tile, interpret)

        g_amb_bias = g_amb_bias8[0:1]  # [1, 128]
        g_col_bias = g_col_bias8[0:1]

        amb_w1c = weights.amb_w1[256:]
        col_w1i = weights.col_w1[144:160]
        g_cond = (g_amb_bias @ amb_w1c.astype(jnp.float32).T)[0, :64]
        g_cond = g_cond.reshape(cond_feat.shape).astype(cond_feat.dtype)
        g_ind = (g_col_bias @ col_w1i.astype(jnp.float32).T)[0, :max(ind_dim, 1)]
        g_ind = (g_ind[:ind_dim].reshape(ind_code.shape).astype(ind_code.dtype)
                 if ind_dim > 0 else jnp.zeros_like(ind_code))

        # bias grads also flow into the cond/ind ROWS of the packed w1s
        g_amb_w1 = jnp.concatenate(
            [g_amb_w1p, cond128.T @ g_amb_bias], axis=0
        ).astype(weights.amb_w1.dtype)
        g_sig_w1 = jnp.concatenate([g_sig_w1p, g_sig_w1a], axis=0).astype(weights.sig_w1.dtype)
        g_col_w1 = jnp.concatenate(
            [g_col_w1s, g_col_w1g, ind16.T @ g_col_bias,
             jnp.zeros((weights.col_w1.shape[0] - 160, 128), jnp.float32)], axis=0
        ).astype(weights.col_w1.dtype)

        g_weights = FieldWeights(
            pos_B=g_pos_B.astype(weights.pos_B.dtype),
            amb_w1=g_amb_w1,
            amb_w2=g_amb_w2.astype(weights.amb_w2.dtype),
            amb_w3=g_amb_w3.astype(weights.amb_w3.dtype),
            amb_B=g_amb_B.astype(weights.amb_B.dtype),
            sig_w1=g_sig_w1,
            sig_w2=g_sig_w2.astype(weights.sig_w2.dtype),
            sig_w3=g_sig_w3.astype(weights.sig_w3.dtype),
            col_w1=g_col_w1,
            col_w2=g_col_w2.astype(weights.col_w2.dtype),
        )
        return (jnp.zeros_like(xyz), jnp.zeros_like(dirs), g_cond, g_ind, g_weights)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_field_train(xyz, dirs, cond_feat, ind_code, weights,
                      amb_dim: int = 3, bound: float = 1.0, tile: int = 1024,
                      interpret: bool = False):
    """Differentiable fused field (forward AND backward as Pallas kernels).

    Same contract as fused_field_eval; grads flow to cond_feat, ind_code,
    and all FieldWeights. Use weights_from_params + grads mapped back by the
    caller (the packed w1 grads include the cond/ind rows)."""
    ind_dim = int(ind_code.shape[-1]) if ind_code is not None else 0
    if ind_code is None:
        ind_code = jnp.zeros((0,), jnp.float32)
    fn = _make_fused_field_train(amb_dim, ind_dim, float(bound), tile, interpret)
    return fn(xyz, dirs, cond_feat, ind_code, weights)
