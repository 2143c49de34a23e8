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


class FrameOutput(NamedTuple):
    rgb_map: jnp.ndarray  # [H*W, 3] raw-resolution composited image
    sr_rgb_map: Optional[jnp.ndarray]  # [H2, W2, 3] super-resolved (or None)
    depth_map: jnp.ndarray  # [H*W]
    weights_sum: jnp.ndarray  # [H*W]
    torso_alpha: Optional[jnp.ndarray]  # [H*W, 1]
    torso_rgb: Optional[jnp.ndarray]  # [H*W, 3]


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
    density_thresh_torso: float = 0.01,
    sr_model: Optional[Superresolution] = None,
    sr_params=None,
    stop_head_gradient: bool = False,
) -> FrameOutput:
    cfg = head_model.cfg

    cond_feat = head_model.apply(head_params, cond_window, eye_area_percent, method=RADNeRF.cal_cond_feat)
    ind_code = head_model.apply(head_params, index, method=RADNeRF.get_individual_code)

    def field_fn(xyz, dirs):
        return head_model.apply(head_params, xyz, dirs, cond_feat, ind_code, method=RADNeRF.field)

    # torso treats plain bg as its backdrop; head blends over torso_bg later
    head_out = render_rays(
        field_fn, rays_o, rays_d, occupancy,
        bound=cfg.bound, min_near=cfg.min_near,
        bg_color=0.0,  # defer background blending to the torso composite
        opts=opts,
        image_hw=image_hw,
    )
    head_image = head_out.head_image
    weights_sum = head_out.weights_sum
    if stop_head_gradient:
        head_image = jax.lax.stop_gradient(head_image)
        weights_sum = jax.lax.stop_gradient(weights_sum)

    torso_alpha = torso_rgb = None
    if torso_model is not None:
        assert bg_coords is not None
        t_ind = torso_model.apply(torso_params, index, method=TorsoField.get_individual_code)
        t_out = torso_model.apply(
            torso_params,
            bg_coords,
            lm68,
            t_ind,
            head_image if torso_model.cfg.torso_head_aware else None,
            weights_sum[:, None] if torso_model.cfg.torso_head_aware else None,
        )
        alpha = t_out.alpha
        if occupancy_2d is not None:
            # 2D occupancy culling (radnerf_torso_sr.py:196-199) as a mask
            thr = min(density_thresh_torso, mean_density_torso) if mean_density_torso > 0 else density_thresh_torso
            occ = sample_occupancy_2d(occupancy_2d, bg_coords)
            alpha = alpha * (occ > thr)[:, None]
        image, torso_bg = composite_head_torso(head_image, weights_sum, alpha, t_out.color, bg_color)
        torso_alpha, torso_rgb = alpha, torso_bg
    else:
        image = jnp.clip(head_image + (1.0 - weights_sum)[..., None] * bg_color, 0.0, 1.0)

    sr_image = None
    if sr_model is not None:
        H, W = image_hw
        raw = image.reshape(1, H, W, 3)
        sr_image = jnp.clip(sr_model.apply(sr_params, raw), 0.0, 1.0)[0]

    return FrameOutput(
        rgb_map=image,
        sr_rgb_map=sr_image,
        depth_map=head_out.depth_map,
        weights_sum=weights_sum,
        torso_alpha=torso_alpha,
        torso_rgb=torso_rgb,
    )
