"""Full-frame renderer: head NeRF [+ torso field] [+ 2x super-resolution].

Parity: the eval path of RADNeRF(withSR).render and
RADNeRFTorsowithSR.render (/root/reference/modules/radnerfs/radnerf_sr.py:203-210,
radnerf_torso_sr.py:116-244): raw 256^2 head render, torso composited
behind the head, SR to 512^2.

One jit-able pure function per frame; everything static-shape.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from genefaceplusplus_tpu.models.radnerf import RADNeRF
from genefaceplusplus_tpu.models.radnerf_torso import (
    TorsoField,
    composite_head_torso,
    sample_occupancy_2d,
)
from genefaceplusplus_tpu.models.renderer import RenderOptions, render_rays
from genefaceplusplus_tpu.models.superresolution import Superresolution


def head_crop_offset(
    rays_o: jnp.ndarray,  # [H*W, 3] image-ordered
    rays_d: jnp.ndarray,  # [H*W, 3]
    occ_aabb: jnp.ndarray,  # [6] occupied-region AABB (ops/raymarch.occupancy_aabb)
    image_hw: tuple,
    crop_hw: tuple,
    min_near: float = 0.05,
):
    """Dynamic top-left (row, col) of a crop_hw window covering every ray
    that intersects the occupied AABB; clamped inside the image.

    The TPU-static equivalent of the reference's alive-ray early-out for
    rays that never touch the head (renderer.py:340-384 kills them on the
    first march): the head field is only evaluated on a fixed-size crop
    whose OFFSET tracks the head's screen projection per frame; everything
    outside contributes exactly zero (no occupied cell intersects those
    rays), so pasting the crop into a zero canvas is lossless as long as the
    crop covers the hit set. Also returns `fits` (hit extent <= crop) for
    telemetry.
    """
    from genefaceplusplus_tpu.ops.raymarch import near_far_from_aabb

    H, W = image_hw
    ch, cw = crop_hw
    n2, f2 = near_far_from_aabb(rays_o, rays_d, occ_aabb, min_near)
    hit = (f2 > n2).reshape(H, W)
    rows = hit.any(axis=1)
    cols = hit.any(axis=0)
    ridx = jnp.arange(H, dtype=jnp.int32)
    cidx = jnp.arange(W, dtype=jnp.int32)
    big = jnp.int32(10 ** 6)
    r_min = jnp.min(jnp.where(rows, ridx, big))
    r_max = jnp.max(jnp.where(rows, ridx, -1))
    c_min = jnp.min(jnp.where(cols, cidx, big))
    c_max = jnp.max(jnp.where(cols, cidx, -1))
    any_hit = rows.any()
    # centre the crop on the hit rect; clamp into the image
    r0 = jnp.clip((r_min + r_max + 1 - ch) // 2, 0, H - ch)
    c0 = jnp.clip((c_min + c_max + 1 - cw) // 2, 0, W - cw)
    r0 = jnp.where(any_hit, r0, 0)
    c0 = jnp.where(any_hit, c0, 0)
    fits = jnp.logical_and(r_max - r_min < ch, c_max - c_min < cw)
    return r0, c0, fits


def auto_head_bbox(
    occupancy,
    poses,  # [N, 4, 4] c2w numpy
    intrinsics,  # (fx, fy, cx, cy)
    H: int,
    W: int,
    bound: float = 1.0,
):
    """(r_lo, r_hi, c_lo, c_hi) screen bbox of the occupied AABB's projection
    across every pose (float, unclamped), or None when degenerate. Every ray
    that can hit the occupied region lies inside this bbox — the hit set is
    a subset of the projected AABB corners' hull. Host-side, once at load."""
    import numpy as onp

    occ = onp.asarray(occupancy)
    if not occ.any():
        return None
    from genefaceplusplus_tpu.ops.raymarch import occupancy_aabb

    box = onp.asarray(occupancy_aabb(jnp.asarray(occ), bound))
    corners = onp.stack(
        onp.meshgrid(box[[0, 3]], box[[1, 4]], box[[2, 5]], indexing="ij"),
        axis=-1,
    ).reshape(8, 3)
    fx, fy, cx, cy = intrinsics
    poses = onp.asarray(poses).reshape(-1, 4, 4)
    r_lo, r_hi, c_lo, c_hi = H, 0.0, W, 0.0
    for pose in poses:
        R, t = pose[:3, :3], pose[:3, 3]
        cam = (corners - t) @ R  # R^T @ (X - t) per corner
        z = cam[:, 2]
        if onp.any(z <= 1e-3):
            return None  # box reaches behind the camera: keep full frame
        col = cx + fx * cam[:, 0] / z
        row = cy + fy * cam[:, 1] / z
        r_lo, r_hi = min(r_lo, row.min()), max(r_hi, row.max())
        c_lo, c_hi = min(c_lo, col.min()), max(c_hi, col.max())
    return (r_lo, r_hi, c_lo, c_hi)


def auto_head_crop(
    occupancy,
    poses,  # [N, 4, 4] c2w numpy
    intrinsics,  # (fx, fy, cx, cy)
    H: int,
    W: int,
    bound: float = 1.0,
    pad_px: int = 12,
    multiple: int = 16,
    max_area_frac: float = 0.85,
    bbox=None,  # precomputed auto_head_bbox result (avoids re-projection)
):
    """Crop (ch, cw) covering the occupied AABB's screen projection across
    every pose, padded and rounded up; None when cropping would not pay
    (>= max_area_frac of the frame) or the geometry is degenerate.
    multiple=16 keeps lane-dim tiling while shaving up to 31+31 wasted
    rows/cols vs the round-2 multiple=32 (measured equal-or-better fps).

    Host-side (numpy) — run once at load time; the per-frame OFFSET is
    computed in-graph by head_crop_offset.
    """
    import numpy as onp

    if bbox is None:
        bbox = auto_head_bbox(occupancy, poses, intrinsics, H, W, bound)
    if bbox is None:
        return None
    r_lo, r_hi, c_lo, c_hi = bbox
    ch = int(onp.clip(r_hi - r_lo, 0, H) + 2 * pad_px)
    cw = int(onp.clip(c_hi - c_lo, 0, W) + 2 * pad_px)
    ch = min(H, int(onp.ceil(ch / multiple)) * multiple)
    cw = min(W, int(onp.ceil(cw / multiple)) * multiple)
    if ch * cw >= max_area_frac * H * W:
        return None
    return (ch, cw)


def auto_torso_crop(
    occupancy_2d,
    H: int,
    W: int,
    thr: float = 0.01,
    pad_px: int = 8,
    multiple: int = 16,
    max_area_frac: float = 0.9,
):
    """Static (r0, c0, ch, cw) screen rect containing every pixel whose
    2D torso-occupancy sample can exceed `thr` (one grid cell of bilinear
    margin), or None when cropping would not pay. Host-side, once at load:
    the torso's culling grid is pose-independent at inference, so unlike the
    head crop the rect needs no per-frame offset.

    `thr` MUST be <= the render-time mask threshold
    (min(density_thresh_torso, mean_density_torso) in render_full_frame) —
    a larger thr would exclude pixels the mask keeps, silently cutting real
    torso alpha. Callers pass the same config value used at render time."""
    import numpy as onp

    g2 = onp.asarray(occupancy_2d)
    occ = g2 > thr
    if not occ.any():
        return None
    G = g2.shape[0]
    rows = onp.where(occ.any(axis=1))[0]
    cols = onp.where(occ.any(axis=0))[0]
    # one grid cell of bilinear margin on each side (sample_occupancy_2d)
    r_lo = max(0, rows.min() - 1) / max(G - 1, 1) * (H - 1)
    r_hi = min(G - 1, rows.max() + 1) / max(G - 1, 1) * (H - 1)
    c_lo = max(0, cols.min() - 1) / max(G - 1, 1) * (W - 1)
    c_hi = min(G - 1, cols.max() + 1) / max(G - 1, 1) * (W - 1)
    r0 = max(0, int(r_lo) - pad_px)
    c0 = max(0, int(c_lo) - pad_px)
    ch = min(H - r0, int(onp.ceil((r_hi - r0 + pad_px) / multiple)) * multiple)
    cw = min(W - c0, int(onp.ceil((c_hi - c0 + pad_px) / multiple)) * multiple)
    if ch * cw >= max_area_frac * H * W:
        return None
    return (r0, c0, ch, cw)


def auto_sr_crop(
    head_bbox,  # (r_lo, r_hi, c_lo, c_hi) from auto_head_bbox, or None
    torso_rect,  # (r0, c0, ch, cw) torso footprint, None when NO torso term
    H: int,
    W: int,
    pad_px: int = 4,
    margin: int = 16,
    multiple: int = 16,
    max_area_frac: float = 0.9,
):
    """((outer), (inner)) rects at raw resolution for cropped SR, or None.

    Outside the union of the head's all-pose screen bbox and the torso
    footprint the composited raw image equals the static background
    EXACTLY, so full-frame SR differs from the precomputed SR(bg) only
    within `margin` (>= the SR receptive field, ~5 px at input res) of that
    union: per frame, SR only `outer`, paste `inner` (= union + margin)
    into the SR(bg) canvas. Lossless both ways: outside inner, every SR
    input within the receptive field equals bg; inside inner, pixels are
    >= margin from the outer boundary (or outer is flush with the image
    edge, where conv padding matches the full-frame computation).
    Host-side, once at load.

    Callers must pass torso_rect=(0,0,H,W) (-> None returned) when a torso
    renders WITHOUT 2D-occupancy culling — its alpha is then unbounded.
    """
    import numpy as onp

    if head_bbox is None:
        return None
    r_lo, r_hi, c_lo, c_hi = head_bbox
    r0 = max(0, int(onp.floor(r_lo)) - pad_px)
    r1 = min(H, int(onp.ceil(r_hi)) + pad_px)
    c0 = max(0, int(onp.floor(c_lo)) - pad_px)
    c1 = min(W, int(onp.ceil(c_hi)) + pad_px)
    if torso_rect is not None:
        tr0, tc0, th, tw = torso_rect
        r0, c0 = min(r0, tr0), min(c0, tc0)
        r1, c1 = max(r1, tr0 + th), max(c1, tc0 + tw)
    ir0, ic0 = max(0, r0 - margin), max(0, c0 - margin)
    ir1, ic1 = min(H, r1 + margin), min(W, c1 + margin)
    er0, ec0 = max(0, ir0 - margin), max(0, ic0 - margin)
    er1, ec1 = min(H, ir1 + margin), min(W, ic1 + margin)
    eh = min(H - er0, int(onp.ceil((er1 - er0) / multiple)) * multiple)
    ew = min(W - ec0, int(onp.ceil((ec1 - ec0) / multiple)) * multiple)
    if eh * ew >= max_area_frac * H * W:
        return None
    return ((er0, ec0, eh, ew), (ir0, ic0, ir1 - ir0, ic1 - ic0))


def sr_apply_batched(sr_model, sr_params, raws, sr_crop=None, sr_bg=None):
    """Batched SR over a chunk of raw frames: [B, H, W, 3] -> [B, 2H, 2W, 3].

    Batch-1 convs underutilize the MXU; running SR ONCE per chunk (outside
    the per-frame scan) amortises weight loads and fills the systolic array.
    Applies the same static-region skip as render_full_frame when
    sr_crop/sr_bg are given (auto_sr_crop invariants hold per frame)."""
    B, H, W, _ = raws.shape
    if sr_crop is not None and sr_bg is not None:
        (orr, orc, oh, ow), (ir, ic, ih, iw) = sr_crop
        raw_c = raws[:, orr:orr + oh, orc:orc + ow]
        sr_c = sr_model.apply(sr_params, raw_c, noise_offset=(orr, orc))
        dy, dx = 2 * (ir - orr), 2 * (ic - orc)
        patch = jnp.clip(sr_c[:, dy:dy + 2 * ih, dx:dx + 2 * iw], 0.0, 1.0)
        canvas = jnp.broadcast_to(sr_bg.astype(patch.dtype)[None], (B,) + sr_bg.shape)
        return jax.vmap(
            lambda c, p: jax.lax.dynamic_update_slice(c, p, (2 * ir, 2 * ic, 0))
        )(canvas, patch)
    return jnp.clip(sr_model.apply(sr_params, raws), 0.0, 1.0)


class FrameOutput(NamedTuple):
    rgb_map: jnp.ndarray  # [H*W, 3] raw-resolution composited image
    sr_rgb_map: Optional[jnp.ndarray]  # [H2, W2, 3] super-resolved (or None)
    depth_map: jnp.ndarray  # [H*W]
    weights_sum: jnp.ndarray  # [H*W]
    torso_alpha: Optional[jnp.ndarray]  # [H*W, 1]
    torso_rgb: Optional[jnp.ndarray]  # [H*W, 3]
    # scalar bool (or None when head_crop is off): True when the head's
    # screen-projected hit extent fit inside the crop window this frame.
    # False means the pose left the envelope the crop was sized from and
    # the head was truncated — callers should fall back to head_crop=off
    # for such poses (see head_crop_offset docstring).
    head_crop_fits: Optional[jnp.ndarray] = None


def render_full_frame(
    head_model: RADNeRF,
    head_params,
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    cond_window: jnp.ndarray,  # [smo_win, T_win, C]
    occupancy: jnp.ndarray,  # [H, H, H] bool
    bg_color,  # [N, 3] or scalar
    opts: RenderOptions,
    image_hw: tuple,
    eye_area_percent: Optional[jnp.ndarray] = None,
    index=0,
    torso_model: Optional[TorsoField] = None,
    torso_params=None,
    bg_coords: Optional[jnp.ndarray] = None,  # [N, 2]
    lm68: Optional[jnp.ndarray] = None,  # [1, 68, 2]
    occupancy_2d: Optional[jnp.ndarray] = None,  # [H, H] torso alpha grid
    mean_density_torso: float = 0.0,
    density_thresh_torso: Optional[float] = None,  # default: torso cfg's value
    sr_model: Optional[Superresolution] = None,
    sr_params=None,
    stop_head_gradient: bool = False,
    head_crop: Optional[tuple] = None,  # (ch, cw): evaluate head on a crop
    torso_crop: Optional[tuple] = None,  # (r0, c0, ch, cw) static torso rect
    sr_crop: Optional[tuple] = None,  # ((outer), (inner)) from auto_sr_crop
    sr_bg=None,  # [2H, 2W, 3] precomputed SR of the static background
) -> FrameOutput:
    cfg = head_model.cfg
    crop_fits = None

    cond_feat = head_model.apply(head_params, cond_window, eye_area_percent, method=RADNeRF.cal_cond_feat)
    ind_code = head_model.apply(head_params, index, method=RADNeRF.get_individual_code)

    def field_fn(xyz, dirs):
        return head_model.apply(head_params, xyz, dirs, cond_feat, ind_code, method=RADNeRF.field)

    # split-stage closures for opts.color_topk (top-K color compaction)
    def sigma_fn(xyz):
        return head_model.apply(head_params, xyz, cond_feat, method=RADNeRF.field_sigma)

    def color_fn(geo_feat, dirs):
        return head_model.apply(head_params, geo_feat, dirs, ind_code, method=RADNeRF.field_color)

    H, W = image_hw
    if head_crop is not None and tuple(head_crop) != (H, W):
        # fixed-size crop, dynamic offset: head rays outside the occupied
        # AABB's screen projection contribute exactly zero, so render the
        # head on crop_hw rays and paste into a zero canvas (lossless while
        # the crop covers the hit set — head_crop_offset docstring)
        from genefaceplusplus_tpu.ops.raymarch import occupancy_aabb

        ch, cw = head_crop
        occ_box = occupancy_aabb(occupancy, cfg.bound)
        r0, c0, crop_fits = head_crop_offset(rays_o, rays_d, occ_box, image_hw, head_crop, cfg.min_near)
        ro_c = jax.lax.dynamic_slice(rays_o.reshape(H, W, 3), (r0, c0, 0), (ch, cw, 3)).reshape(-1, 3)
        rd_c = jax.lax.dynamic_slice(rays_d.reshape(H, W, 3), (r0, c0, 0), (ch, cw, 3)).reshape(-1, 3)
        crop_out = render_rays(
            field_fn, ro_c, rd_c, occupancy,
            bound=cfg.bound, min_near=cfg.min_near,
            bg_color=0.0, opts=opts, image_hw=(ch, cw),
            sigma_fn=sigma_fn, color_fn=color_fn,
        )
        head_image = jax.lax.dynamic_update_slice(
            jnp.zeros((H, W, 3), crop_out.head_image.dtype),
            crop_out.head_image.reshape(ch, cw, 3), (r0, c0, 0),
        ).reshape(H * W, 3)
        weights_sum = jax.lax.dynamic_update_slice(
            jnp.zeros((H, W), crop_out.weights_sum.dtype),
            crop_out.weights_sum.reshape(ch, cw), (r0, c0),
        ).reshape(H * W)
        depth_map = jax.lax.dynamic_update_slice(
            jnp.zeros((H, W), crop_out.depth_map.dtype),
            crop_out.depth_map.reshape(ch, cw), (r0, c0),
        ).reshape(H * W)
        head_out = crop_out._replace(
            head_image=head_image, weights_sum=weights_sum, depth_map=depth_map
        )
    else:
        # torso treats plain bg as its backdrop; head blends over torso_bg later
        head_out = render_rays(
            field_fn, rays_o, rays_d, occupancy,
            bound=cfg.bound, min_near=cfg.min_near,
            bg_color=0.0,  # defer background blending to the torso composite
            opts=opts,
            image_hw=image_hw,
            sigma_fn=sigma_fn, color_fn=color_fn,
        )
    head_image = head_out.head_image
    weights_sum = head_out.weights_sum
    if stop_head_gradient:
        head_image = jax.lax.stop_gradient(head_image)
        weights_sum = jax.lax.stop_gradient(weights_sum)

    torso_alpha = torso_rgb = None
    if torso_model is not None:
        assert bg_coords is not None
        if density_thresh_torso is None:
            density_thresh_torso = torso_model.cfg.density_thresh_torso
        t_ind = torso_model.apply(torso_params, index, method=TorsoField.get_individual_code)
        # crop is only lossless when the occupancy mask (which defines the
        # rect and zeroes alpha outside it) is active
        if torso_crop is not None and occupancy_2d is not None and tuple(torso_crop[2:]) != (H, W):
            # the torso's screen footprint is STATIC across frames (the 2D
            # occupancy grid that culls it is pose-independent at inference,
            # radnerf_torso_sr.py:196-199), so the field only needs to run
            # on a compile-time sub-rect; alpha is exactly zero outside it
            # by the same occupancy mask that defines the rect.
            tr0, tc0, tch, tcw = torso_crop
            sel = lambda a, c: a.reshape(H, W, c)[tr0:tr0 + tch, tc0:tc0 + tcw].reshape(-1, c)
            t_out = torso_model.apply(
                torso_params,
                sel(bg_coords, 2),
                lm68,
                t_ind,
                sel(head_image, 3) if torso_model.cfg.torso_head_aware else None,
                sel(weights_sum[:, None], 1) if torso_model.cfg.torso_head_aware else None,
            )
            alpha_c, color_c = t_out.alpha, t_out.color
            # the mask is mandatory here (it zeroes any alpha outside the
            # rect that bilinear sampling could otherwise leak); the branch
            # guard guarantees occupancy_2d is present. NB: losslessness
            # requires the rect to have been computed with a threshold <=
            # this one (auto_torso_crop thr; callers pass the same value).
            thr = min(density_thresh_torso, mean_density_torso) if mean_density_torso > 0 else density_thresh_torso
            occ = sample_occupancy_2d(occupancy_2d, sel(bg_coords, 2))
            alpha_c = alpha_c * (occ > thr)[:, None]
            paste = lambda a, c: jnp.zeros((H, W, c), a.dtype).at[
                tr0:tr0 + tch, tc0:tc0 + tcw].set(a.reshape(tch, tcw, c)).reshape(-1, c)
            alpha = paste(alpha_c, 1)
            color = paste(color_c, 3)
        else:
            t_out = torso_model.apply(
                torso_params,
                bg_coords,
                lm68,
                t_ind,
                head_image if torso_model.cfg.torso_head_aware else None,
                weights_sum[:, None] if torso_model.cfg.torso_head_aware else None,
            )
            alpha, color = t_out.alpha, t_out.color
            if occupancy_2d is not None:
                # 2D occupancy culling (radnerf_torso_sr.py:196-199) as a mask
                thr = min(density_thresh_torso, mean_density_torso) if mean_density_torso > 0 else density_thresh_torso
                occ = sample_occupancy_2d(occupancy_2d, bg_coords)
                alpha = alpha * (occ > thr)[:, None]
        image, torso_bg = composite_head_torso(head_image, weights_sum, alpha, color, bg_color)
        torso_alpha, torso_rgb = alpha, torso_bg
    else:
        image = jnp.clip(head_image + (1.0 - weights_sum)[..., None] * bg_color, 0.0, 1.0)

    sr_image = None
    if sr_model is not None:
        H, W = image_hw
        raw = image.reshape(1, H, W, 3)
        if sr_crop is not None and sr_bg is not None:
            # outside `inner` the raw image == static bg exactly, so its SR
            # is frame-constant: SR only the outer rect (inner + receptive-
            # field margin), paste inner into the precomputed SR(bg) canvas
            # (auto_sr_crop docstring; equality in tests/test_full_renderer)
            (orr, orc, oh, ow), (ir, ic, ih, iw) = sr_crop
            raw_c = raw[:, orr:orr + oh, orc:orc + ow]
            sr_c = sr_model.apply(sr_params, raw_c, noise_offset=(orr, orc))[0]
            dy, dx = 2 * (ir - orr), 2 * (ic - orc)
            patch = jnp.clip(sr_c[dy:dy + 2 * ih, dx:dx + 2 * iw], 0.0, 1.0)
            sr_image = jax.lax.dynamic_update_slice(
                sr_bg.astype(patch.dtype), patch, (2 * ir, 2 * ic, 0))
        else:
            sr_image = jnp.clip(sr_model.apply(sr_params, raw), 0.0, 1.0)[0]

    return FrameOutput(
        rgb_map=image,
        sr_rgb_map=sr_image,
        depth_map=head_out.depth_map,
        weights_sum=weights_sum,
        torso_alpha=torso_alpha,
        torso_rgb=torso_rgb,
        head_crop_fits=crop_fits,
    )
