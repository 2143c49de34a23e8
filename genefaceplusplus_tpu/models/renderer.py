"""Volume rendering driver: ties marching + field eval + compositing.

Parity: NeRFRenderer.render, /root/reference/modules/radnerfs/renderer.py:286-399.

TPU-native: the reference has two branches — training (atomic stream
compaction) and eval (alive-ray while-loop). Both collapse here into ONE
static-shape pass (see ops/raymarch.py for the equivalence argument):

  near/far slab -> K-lattice march over the occupancy grid -> compact first
  S occupied samples -> batched field eval over [R*S] points -> masked
  composite with T_thresh -> background blend.

The whole pipeline is jit-compiled once per (R, S, K) shape and runs at
MXU-bound throughput; rays shard over a device mesh via pjit (parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from genefaceplusplus_tpu.ops import composite as composite_ops
from genefaceplusplus_tpu.ops import raymarch


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static render hyper-parameters (shape-affecting: recompilation on change)."""

    max_steps: int = 16  # reference max_steps budget -> dt_min
    num_coarse: int = 48  # K lattice points examined per ray (grid mode)
    num_samples: int = 16  # S compacted samples per ray
    dt_gamma: float = 0.00390625  # 1/256
    T_thresh: float = 1e-4
    perturb: bool = False
    # 'interval': gather-free occupied-AABB marching (TPU fast path)
    # 'grid': per-cell occupancy testing (exact reference semantics)
    march_mode: str = "interval"
    # 'aabb': entry = occupied-AABB slab only
    # 'probe': + strided coarse-occupancy entry-depth prepass (needs
    #   image_hw at the render_rays call, interval mode only) — tightens the
    #   per-ray entry so num_samples can drop ~16 -> ~10 at equal coverage
    entry_mode: str = "aabb"
    probe_stride: int = 4
    probe_coarse_factor: int = 4
    n_probe: int = 32
    # 0 = evaluate the color MLP on all S samples. K in (0, S): evaluate
    # color only on the K highest-composite-weight samples per ray (the
    # geometry stage still runs on all S); the image renormalises by the
    # captured-weight fraction. Inference-only approximation (ROADMAP #5);
    # requires sigma_fn/color_fn at the render_rays call.
    color_topk: int = 0
    # 0 = field on all R*S sample slots. f in (0, 1): evaluate the field on
    # only a static budget of M = ceil(f*R*S) slots, filled with the LIVE
    # (marcher-mask) samples via a cumsum compaction — the TPU-native
    # equivalent of the reference's CUDA stream compaction
    # (raymarching.cu march_rays_train atomic ray packing): no sort, no
    # dynamic shapes, one gather in / one scatter out. EXACT whenever the
    # frame's live-sample count fits the budget (dead slots are masked by
    # the composite either way); overflow drops the flat-order tail, so f
    # must exceed the identity's measured live fraction.
    compact_frac: float = 0.0


class RenderOutput(NamedTuple):
    rgb_map: jnp.ndarray  # [R, 3] (head composited over bg)
    depth_map: jnp.ndarray  # [R]
    weights_sum: jnp.ndarray  # [R]
    ambient_sum: jnp.ndarray  # [R]
    weights: jnp.ndarray  # [R, S]
    ambient_pos: jnp.ndarray  # [R*S, D_amb] (for ambient loss)
    head_image: jnp.ndarray  # [R, 3] pre-background head contribution


def make_aabb(bound: float) -> jnp.ndarray:
    """Training/infer AABB (renderer.py:81): y half-height (face-shaped box)."""
    return jnp.asarray([-bound, -bound / 2, -bound, bound, bound / 2, bound], jnp.float32)


def render_rays(
    field_fn,
    rays_o: jnp.ndarray,  # [R, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    occupancy: jnp.ndarray,  # [H, H, H] bool
    bound: float,
    min_near: float,
    bg_color,  # scalar or [R, 3]
    opts: RenderOptions,
    noise: Optional[jnp.ndarray] = None,  # [R] in [0,1) for perturb
    image_hw: Optional[tuple] = None,  # enables entry_mode='probe'
    sigma_fn=None,  # (xyz [M,3]) -> (sigma [M], geo_feat [M,G], amb [M,D])
    color_fn=None,  # (geo_feat [M,G], dirs [M,3]) -> rgb [M,3]
) -> RenderOutput:
    """Render a batch of rays through a conditioned field.

    Args:
      field_fn: (xyz [M,3], dirs [M,3]) -> (sigma [M], rgb [M,3], amb [M,D]).
        The caller closes over cond_feat/ind_code (they are per-frame).
      image_hw: (H, W) of the image-ordered ray grid; required when
        opts.entry_mode == 'probe' (the prepass subsamples the ray grid).
      sigma_fn/color_fn: split-stage field (RADNeRF.field_sigma/field_color
        closures) enabling opts.color_topk — the color MLP then runs on
        only the K highest-weight samples per ray.
    """
    R = rays_o.shape[0]
    S = opts.num_samples
    aabb = make_aabb(bound)
    nears, fars = raymarch.near_far_from_aabb(rays_o, rays_d, aabb, min_near)

    if opts.march_mode == "interval":
        occ_box = raymarch.occupancy_aabb(occupancy, bound)
        t_entry = t_exit = None
        if opts.entry_mode == "probe" and image_hw is not None:
            # entry AND exit: the marcher stretches the per-ray lattice over
            # the probed occupied span, so the sample budget covers deep
            # identities too (round-4 ghost-face fix, raymarch.py docstring)
            t_entry, t_exit = raymarch.entry_exit_depth_map(
                rays_o, rays_d, occupancy, occ_box, bound, image_hw,
                stride=opts.probe_stride, coarse_factor=opts.probe_coarse_factor,
                n_probe=opts.n_probe, min_near=min_near,
            )
        m = raymarch.march_rays_interval(
            rays_o, rays_d, nears, fars, occ_box,
            bound=bound, dt_gamma=opts.dt_gamma, max_steps=opts.max_steps,
            num_samples=S, noise=noise, min_near=min_near,
            grid_size=occupancy.shape[0], t_entry=t_entry, t_exit=t_exit,
        )
    else:
        m = raymarch.march_rays(
            rays_o,
            rays_d,
            nears,
            fars,
            occupancy,
            bound=bound,
            dt_gamma=opts.dt_gamma,
            max_steps=opts.max_steps,
            num_coarse=opts.num_coarse,
            num_samples=S,
            noise=noise,
        )

    N = R * S
    xyz = m.xyzs.reshape(N, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (R, S, 3)).reshape(N, 3)

    # static-budget live-sample compaction (opts.compact_frac docstring):
    # slot j of the compact buffer holds the j-th live sample (flat order);
    # values scattered back to dead slots are masked by the composite, so
    # this is exact while the live count fits the budget.
    src = rank = None
    cf = opts.compact_frac
    if 0.0 < cf < 1.0:
        flat_mask = m.mask.reshape(N)
        M = min(N, max(512, ((int(cf * N) + 511) // 512) * 512))
        rank = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
        keep_slot = flat_mask & (rank < M)
        dest = jnp.where(keep_slot, rank, M)  # dead/overflow -> dropped slot
        src = jnp.zeros((M + 1,), jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")[:M]
        # unwritten (pad) slots keep src=0: they re-evaluate sample 0, and
        # every writer of a duplicated slot writes the same value — exact.

    def _scatter(vals, width=None):
        if width is None:
            return jnp.zeros((N,), vals.dtype).at[src].set(vals)
        return jnp.zeros((N, width), vals.dtype).at[src].set(vals)

    K = opts.color_topk
    if 0 < K < S and sigma_fn is not None and color_fn is not None:
        # top-K color compaction: geometry on all S samples, color MLP on
        # only the K highest-weight samples per ray; the image renormalises
        # by the captured-weight fraction (exact when the top-K carry all
        # surviving weight, which per-identity telemetry must confirm).
        import jax

        if src is not None:
            sigma_c, geo_c, amb_c = sigma_fn(xyz[src])
            sigma = _scatter(sigma_c).reshape(R, S)
            amb_abs = _scatter(jnp.abs(amb_c).sum(-1)).reshape(R, S)
            ambient_pos = _scatter(amb_c, amb_c.shape[-1])
        else:
            sigma, geo_feat, ambient_pos = sigma_fn(xyz)
            sigma = sigma.reshape(R, S)
            amb_abs = jnp.abs(ambient_pos).sum(-1).reshape(R, S)
        w_full, keep = composite_ops.composite_weights(
            sigma, m.deltas, m.mask, T_thresh=opts.T_thresh
        )
        w_k, idx_k = jax.lax.top_k(w_full, K)  # [R, K]
        if src is not None:
            # geo features live in the compact buffer; a top-K sample is
            # live (w>0) so rank[] is its compact position (zero-weight
            # picks gather arbitrary finite rows that the w_k factor kills)
            n_flat = (jnp.arange(R, dtype=jnp.int32)[:, None] * S + idx_k).reshape(-1)
            cpos = jnp.clip(rank[n_flat], 0, src.shape[0] - 1)
            geo_k = geo_c[cpos]
        else:
            geo_k = jnp.take_along_axis(
                geo_feat.reshape(R, S, -1), idx_k[..., None], axis=1
            ).reshape(R * K, -1)
        dirs_k = jnp.broadcast_to(rays_d[:, None, :], (R, K, 3)).reshape(R * K, 3)
        rgb_k = color_fn(geo_k, dirs_k).reshape(R, K, 3)

        weights_sum = w_full.sum(axis=-1)
        capture = w_k.sum(axis=-1)
        scale = jnp.where(capture > 1e-8, weights_sum / jnp.maximum(capture, 1e-8), 0.0)
        image_pre = (w_k[..., None] * rgb_k).sum(axis=-2) * scale[..., None]
        comp = composite_ops.CompositeResult(
            weights_sum=weights_sum,
            ambient_sum=(amb_abs * keep).sum(axis=-1),
            depth=(w_full * m.ts).sum(axis=-1),
            image=image_pre,
            weights=w_full,
        )
    else:
        if src is not None:
            sigma_c, rgb_c, amb_c = field_fn(xyz[src], dirs[src])
            sigma = _scatter(sigma_c)
            rgb = _scatter(rgb_c, 3)
            amb_abs = _scatter(jnp.abs(amb_c).sum(-1)).reshape(R, S)
            ambient_pos = _scatter(amb_c, amb_c.shape[-1])
        else:
            sigma, rgb, ambient_pos = field_fn(xyz, dirs)
            amb_abs = jnp.abs(ambient_pos).sum(-1).reshape(R, S)

        comp = composite_ops.composite_rays(
            sigma.reshape(R, S),
            rgb.reshape(R, S, 3),
            amb_abs,
            m.deltas,
            m.ts,
            m.mask,
            T_thresh=opts.T_thresh,
        )

    image = composite_ops.blend_background(comp.image, comp.weights_sum, bg_color)
    depth = composite_ops.normalize_depth(comp.depth, nears, fars)
    return RenderOutput(
        rgb_map=image,
        depth_map=depth,
        weights_sum=comp.weights_sum,
        ambient_sum=comp.ambient_sum,
        weights=comp.weights,
        ambient_pos=ambient_pos,
        head_image=comp.image,
    )
