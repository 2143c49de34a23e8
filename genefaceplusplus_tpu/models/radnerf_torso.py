"""Torso model: 2D deformable NeRF in the image plane + head compositing.

Parity: RADNeRFTorsowithSR, /root/reference/modules/radnerfs/radnerf_torso_sr.py
(and the non-SR radnerf_torso.py which conditions on head pose instead of
jaw landmarks):
  * per-pixel coords shrunk by torso_shrink (:81)
  * freq-encoded coords (multires 10) + 7 jaw landmarks of lm68 (multires 4)
    [+ head pose (multires 4) in the non-SR variant]
    + torso individual code [+ head-aware encoding of (head rgb, ws)] (:84-104)
  * deform MLP -> dx; canonical field at clamp(x+dx) -> (alpha, color) (:106-114)
  * 2D occupancy-grid culling (:196-199) -> here a multiplicative mask
    (evaluating 65k pixels through 3-layer-64 MLPs is trivial on the MXU;
    data-dependent compaction is not)
  * compositing head-over-torso-over-bg (:221-226)

TPU-native: canonical torso features default to a 2D Fourier encoder
(grid_type='fourier'); the reference 2D tiled grid is available for parity.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from genefaceplusplus_tpu.models.cond_encoder import MLP
from genefaceplusplus_tpu.models.grid_modules import GridEncoder
from genefaceplusplus_tpu.ops.fourier_encoder import FourierEncoder
from genefaceplusplus_tpu.ops.freq_encoder import freq_encode
from genefaceplusplus_tpu.ops.grid_encoder import GridSpec

# lm68 jaw points used as torso condition (radnerf_torso_sr.py:86)
JAW_LM_INDICES = (5, 6, 7, 8, 9, 10, 11)


@dataclasses.dataclass(frozen=True)
class TorsoConfig:
    torso_shrink: float = 0.8
    grid_size: int = 128
    density_thresh_torso: float = 0.01
    torso_individual_embedding_num: int = 13000
    torso_individual_embedding_dim: int = 8
    torso_head_aware: bool = True
    grid_type: str = "fourier"  # fourier | tiledgrid
    fourier_features: int = 64
    fourier_max_scale: float = 256.0
    cond_mode: str = "lm68"  # 'lm68' (SR variant) | 'pose' (non-SR variant)

    @classmethod
    def from_hparams(cls, hp) -> "TorsoConfig":
        get = hp.get
        return cls(
            torso_shrink=get("torso_shrink", 0.8),
            grid_size=get("grid_size", 128),
            density_thresh_torso=get("density_thresh_torso", 0.01),
            torso_individual_embedding_num=get("individual_embedding_num", 13000),
            torso_individual_embedding_dim=get("torso_individual_embedding_dim", 8),
            torso_head_aware=get("torso_head_aware", False),
            grid_type="fourier" if get("grid_type", "fourier") == "fourier" else "tiledgrid",
            cond_mode="lm68" if get("with_sr", True) else "pose",
        )


class TorsoOutput(NamedTuple):
    alpha: jnp.ndarray  # [N, 1]
    color: jnp.ndarray  # [N, 3]
    deform: jnp.ndarray  # [N, 2]


def sample_occupancy_2d(grid2d: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [H, H] grid at coords [N, 2] in [-1, 1]
    (align_corners=True, mirrors F.grid_sample at radnerf_torso_sr.py:198).

    Note the reference stores the torso grid with xy transposed
    (indices = y*H + x, :271) and grid_sample reads (x, y) = (coord0, coord1)
    as (col, row) — net effect: coord0 indexes rows of our [H, H] layout.
    """
    H = grid2d.shape[0]
    xy = (coords + 1.0) * 0.5 * (H - 1)  # align_corners=True mapping
    x0 = jnp.clip(jnp.floor(xy), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, H - 1)
    f = xy - x0
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    flat = grid2d.reshape(-1)

    def at(rx, ry):
        return jnp.take(flat, rx * H + ry)

    v00 = at(x0i[:, 0], x0i[:, 1])
    v01 = at(x0i[:, 0], x1i[:, 1])
    v10 = at(x1i[:, 0], x0i[:, 1])
    v11 = at(x1i[:, 0], x1i[:, 1])
    return (
        v00 * (1 - f[:, 0]) * (1 - f[:, 1])
        + v01 * (1 - f[:, 0]) * f[:, 1]
        + v10 * f[:, 0] * (1 - f[:, 1])
        + v11 * f[:, 0] * f[:, 1]
    )


class TorsoField(nn.Module):
    cfg: TorsoConfig

    def setup(self):
        c = self.cfg
        if c.torso_individual_embedding_dim > 0:
            self.torso_individual_codes = self.param(
                "torso_individual_codes",
                lambda key: 0.1
                * nn.initializers.normal(1.0)(
                    key, (c.torso_individual_embedding_num, c.torso_individual_embedding_dim)
                ),
            )
        if c.grid_type == "fourier":
            self.torso_embedder = FourierEncoder(2, c.fourier_features, max_scale=c.fourier_max_scale)
        else:
            self.torso_embedder = GridEncoder(
                GridSpec.create(
                    input_dim=2, num_levels=16, level_dim=2, base_resolution=16,
                    log2_hashmap_size=16, desired_resolution=2048, gridtype="tiled",
                )
            )
        if c.torso_head_aware:
            self.head_aware_l1 = nn.Dense(16)
            self.head_aware_l2 = nn.Dense(32)
            self.head_aware_l3 = nn.Dense(16)
        self.torso_deform_net = MLP(2, 64, 3)
        self.torso_canonicial_net = MLP(4, 32, 3)

    def get_individual_code(self, index) -> Optional[jnp.ndarray]:
        if self.cfg.torso_individual_embedding_dim <= 0:
            return None
        return self.torso_individual_codes[index]

    def __call__(
        self,
        x: jnp.ndarray,  # [N, 2] pixel coords in [-1, 1]
        cond: jnp.ndarray,  # lm68 [1, 68, 2] (cond_mode lm68) or pose [1, 6]
        ind_code: Optional[jnp.ndarray] = None,  # [ind_dim]
        head_rgb: Optional[jnp.ndarray] = None,  # [N, 3]
        head_ws: Optional[jnp.ndarray] = None,  # [N, 1]
    ) -> TorsoOutput:
        c = self.cfg
        N = x.shape[0]
        x = x * c.torso_shrink

        enc_x = freq_encode(x, degree=10)  # [N, 42]
        if c.cond_mode == "lm68":
            jaw = cond.reshape(1, 68, 2)[:, JAW_LM_INDICES, :].reshape(1, -1)  # [1, 14]
            enc_cond = freq_encode(jaw, degree=4)  # [1, 126]
        else:
            enc_cond = freq_encode(cond.reshape(1, -1), degree=4)  # pose [1, 54]

        parts = [enc_x]
        if ind_code is not None:
            parts.append(jnp.broadcast_to(ind_code.reshape(1, -1), (N, ind_code.size)))
        parts.append(jnp.broadcast_to(enc_cond, (N, enc_cond.shape[-1])))

        if c.torso_head_aware:
            if head_rgb is None:
                head_rgb = jnp.zeros((N, 3), x.dtype)
                head_ws = jnp.zeros((N, 1), x.dtype)
            ha = jnp.concatenate([head_rgb, head_ws], axis=-1)
            ha = nn.leaky_relu(self.head_aware_l1(ha), 0.02)
            ha = nn.leaky_relu(self.head_aware_l2(ha), 0.02)
            ha = self.head_aware_l3(ha)
            parts.append(ha)

        h = jnp.concatenate(parts, axis=-1)
        dx = self.torso_deform_net(h)
        x_deformed = jnp.clip(x + dx, -1.0, 1.0).astype(jnp.float32)
        feat = self.torso_embedder(x_deformed, bound=1.0)
        h = jnp.concatenate([feat, h], axis=-1)
        h = self.torso_canonicial_net(h)
        alpha = nn.sigmoid(h[..., :1])
        color = nn.sigmoid(h[..., 1:])
        return TorsoOutput(alpha=alpha, color=color, deform=dx)


def composite_head_torso(
    head_image: jnp.ndarray,  # [N, 3] pre-background head contribution
    head_weights_sum: jnp.ndarray,  # [N]
    torso_alpha: jnp.ndarray,  # [N, 1]
    torso_color: jnp.ndarray,  # [N, 3]
    bg_color,  # [N, 3] or scalar
):
    """head over torso over background (radnerf_torso_sr.py:221-226)."""
    torso_bg = torso_color * torso_alpha + bg_color * (1.0 - torso_alpha)
    image = head_image + (1.0 - head_weights_sum)[..., None] * torso_bg
    return jnp.clip(image, 0.0, 1.0), torso_bg
