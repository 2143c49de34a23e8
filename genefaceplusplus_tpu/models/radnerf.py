"""RAD-NeRF head model: dynamic grid-encoded NeRF conditioned on landmarks.

Parity: /root/reference/modules/radnerfs/radnerf.py (RADNeRF) and
radnerf_sr.py:45-210 (RADNeRFwithSR shares the identical field).

Architecture (radnerf.py:39-86):
  cond_prenet = AudioNet(cond_in=204 for lm68, out=cond_out_dim)
  optional blink embedding + 2-linear blink encoder added to the first
    eye_blink_dim channels (radnerf.py:97-103)
  cond_att_net  = AudioAttNet over smo_win_size window
  position grid = tiled/hash 3D grid (16 levels x 2ch, desired 2048*bound)
  ambient MLP   -> tanh -> ambient coord (dim 2 or 3) -> ambient grid
  sigma MLP     (pos_feat + ambient_feat -> 1 + geo_feat), trunc_exp
  color MLP     (SH(dir) + geo_feat + individual code -> rgb), sigmoid
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from genefaceplusplus_tpu.models.cond_encoder import MLP, AudioAttNet, AudioNet
from genefaceplusplus_tpu.models.grid_modules import GridEncoder
from genefaceplusplus_tpu.ops.fastmath import fast_tanh
from genefaceplusplus_tpu.ops.fourier_encoder import FourierEncoder
from genefaceplusplus_tpu.ops.grid_encoder import GridSpec
from genefaceplusplus_tpu.ops.sh_encoder import sh_encode
from genefaceplusplus_tpu.ops.trunc_exp import trunc_exp


@dataclasses.dataclass(frozen=True)
class RADNeRFConfig:
    # condition
    cond_type: str = "idexp_lm3d_normalized"
    keypoint_mode: str = "lm68"
    cond_out_dim: int = 64
    cond_win_size: int = 1
    smo_win_size: int = 3
    with_att: bool = True
    add_eye_blink_cond: bool = True
    eye_blink_dim: int = 2
    # scene
    bound: float = 1.0
    grid_size: int = 128
    min_near: float = 0.05
    density_thresh: float = 10.0
    # spatial encoder: 'fourier' (TPU-native default; MXU-only, no gathers)
    # or 'tiledgrid'/'hashgrid' (reference-parity path; gather-bound on TPU)
    grid_type: str = "fourier"
    grid_interpolation_type: str = "linear"
    log2_hashmap_size: int = 16
    desired_resolution: int = 2048
    fourier_pos_features: int = 128
    fourier_pos_max_scale: float = 128.0
    fourier_amb_features: int = 64
    fourier_amb_max_scale: float = 64.0
    # field MLPs
    num_layers_ambient: int = 3
    hidden_dim_ambient: int = 128
    ambient_coord_dim: int = 3
    num_layers_sigma: int = 3
    hidden_dim_sigma: int = 128
    geo_feat_dim: int = 128
    num_layers_color: int = 2
    hidden_dim_color: int = 128
    # per-frame individual codes
    individual_embedding_num: int = 13000
    individual_embedding_dim: int = 4
    # field activation compute dtype: 'float32' (default, bit-stable) or
    # 'bfloat16' — halves inter-matmul HBM traffic in the field MLPs (the
    # frame is bandwidth-bound: docs/DESIGN.md roofline entry), mirroring
    # the reference's fp16 AMP inference (genefacepp_infer.py:458,474).
    # Encoders, trunc_exp/tanh/sigmoid nonlinearities and all returned
    # tensors stay f32; params stay f32 in the pytree.
    field_act_dtype: str = "float32"

    @property
    def cond_in_dim(self) -> int:
        if self.cond_type in ("esperanto",):
            return 44
        if self.cond_type in ("deepspeech",):
            return 29
        n = {"lm68": 68, "lm131": 131, "lm468": 468}[self.keypoint_mode]
        return n * 3

    @classmethod
    def from_hparams(cls, hp) -> "RADNeRFConfig":
        get = hp.get
        return cls(
            cond_type=get("cond_type", "idexp_lm3d_normalized"),
            keypoint_mode=get("nerf_keypoint_mode", "lm68"),
            cond_out_dim=get("cond_out_dim", 64) // 2 * 2,
            cond_win_size=get("cond_win_size", 1),
            smo_win_size=get("smo_win_size", 3),
            with_att=get("with_att", True),
            add_eye_blink_cond=get("add_eye_blink_cond", False),
            eye_blink_dim=get("eye_blink_dim", 2),
            bound=get("bound", 1),
            grid_size=get("grid_size", 128),
            min_near=get("min_near", 0.05),
            density_thresh=get("density_thresh", 10.0),
            grid_type=get("grid_type", "fourier"),
            grid_interpolation_type=get("grid_interpolation_type", "linear"),
            log2_hashmap_size=get("log2_hashmap_size", 16),
            desired_resolution=get("desired_resolution", 2048),
            fourier_pos_features=get("fourier_pos_features", 128),
            fourier_pos_max_scale=get("fourier_pos_max_scale", 128.0),
            fourier_amb_features=get("fourier_amb_features", 64),
            fourier_amb_max_scale=get("fourier_amb_max_scale", 64.0),
            num_layers_ambient=get("num_layers_ambient", 3),
            hidden_dim_ambient=get("hidden_dim_ambient", 128),
            ambient_coord_dim=get("ambient_coord_dim", 3),
            num_layers_sigma=get("num_layers_sigma", 3),
            hidden_dim_sigma=get("hidden_dim_sigma", 128),
            geo_feat_dim=get("geo_feat_dim", 128),
            num_layers_color=get("num_layers_color", 2),
            hidden_dim_color=get("hidden_dim_color", 128),
            individual_embedding_num=get("individual_embedding_num", 13000),
            individual_embedding_dim=get("individual_embedding_dim", 4),
            field_act_dtype=get("field_act_dtype", "float32"),
        )

    def position_grid_spec(self) -> GridSpec:
        return GridSpec.create(
            input_dim=3,
            num_levels=16,
            level_dim=2,
            base_resolution=16,
            desired_resolution=self.desired_resolution * self.bound,
            log2_hashmap_size=self.log2_hashmap_size,
            gridtype="hash" if self.grid_type == "hashgrid" else "tiled",
            interpolation=self.grid_interpolation_type,
        )

    def ambient_grid_spec(self) -> GridSpec:
        return GridSpec.create(
            input_dim=self.ambient_coord_dim,
            num_levels=16,
            level_dim=2,
            base_resolution=16,
            desired_resolution=self.desired_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
            gridtype="hash" if self.grid_type == "hashgrid" else "tiled",
            interpolation=self.grid_interpolation_type,
        )


class RADNeRF(nn.Module):
    """Head field. Methods:
    - cal_cond_feat(cond, eye_area_percent) -> [1, cond_out_dim]
    - field(xyz, dirs, cond_feat, ind_code) -> (sigma, rgb, ambient_pos)
    - density(xyz, cond_feat) -> sigma (grid maintenance path)
    """

    cfg: RADNeRFConfig

    def setup(self):
        c = self.cfg
        self.cond_prenet = AudioNet(c.cond_in_dim, c.cond_out_dim, win_size=c.cond_win_size)
        if c.add_eye_blink_cond:
            self.blink_embedding = nn.Embed(1, c.cond_out_dim // 2)
            self.blink_encoder = [
                nn.Dense(c.cond_out_dim // 2),
                nn.Dense(c.eye_blink_dim),
            ]
        if c.with_att:
            self.cond_att_net = AudioAttNet(c.cond_out_dim, seq_len=c.smo_win_size)
        if c.grid_type == "fourier":
            self.position_embedder = FourierEncoder(
                3, c.fourier_pos_features, max_scale=c.fourier_pos_max_scale
            )
            self.ambient_embedder = FourierEncoder(
                c.ambient_coord_dim, c.fourier_amb_features, max_scale=c.fourier_amb_max_scale
            )
        else:
            self.position_embedder = GridEncoder(c.position_grid_spec())
            self.ambient_embedder = GridEncoder(c.ambient_grid_spec())
        dt = jnp.bfloat16 if c.field_act_dtype == "bfloat16" else None
        self.ambient_net = MLP(c.ambient_coord_dim, c.hidden_dim_ambient,
                               c.num_layers_ambient, dtype=dt)
        self.sigma_net = MLP(1 + c.geo_feat_dim, c.hidden_dim_sigma,
                             c.num_layers_sigma, dtype=dt)
        self.color_net = MLP(3, c.hidden_dim_color, c.num_layers_color, dtype=dt)
        if c.individual_embedding_dim > 0:
            self.individual_embeddings = self.param(
                "individual_embeddings",
                lambda key: 0.1
                * nn.initializers.normal(stddev=1.0)(
                    key, (c.individual_embedding_num, c.individual_embedding_dim)
                ),
            )

    @property
    def position_dim(self) -> int:
        return self.cfg.position_grid_spec().output_dim

    def cal_cond_feat(self, cond: jnp.ndarray, eye_area_percent: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """cond: [smo_win, T_win, C_in] -> [1, cond_out_dim] smoothed feature."""
        c = self.cfg
        feat = self.cond_prenet(cond)  # [smo_win, cond_out_dim]
        if c.add_eye_blink_cond:
            if eye_area_percent is None:
                eye_area_percent = jnp.zeros((1, 1), dtype=feat.dtype)
            blink = self.blink_embedding(jnp.zeros((1,), jnp.int32)).reshape(1, -1)
            blink = blink * jnp.reshape(eye_area_percent, (1, 1))
            for layer in self.blink_encoder:
                blink = layer(blink)
            feat = feat.at[..., : c.eye_blink_dim].add(
                jnp.broadcast_to(blink, feat[..., : c.eye_blink_dim].shape)
            )
        if c.with_att:
            feat = self.cond_att_net(feat).reshape(1, -1)  # [1, C]
        return feat

    def field_sigma(
        self,
        position: jnp.ndarray,  # [N, 3] in [-bound, bound]
        cond_feat: jnp.ndarray,  # [1, cond_out_dim]
    ):
        """Geometry stage: sigma + geo features (no color MLP).

        Split out so the renderer's top-K color compaction can run the
        color MLP on only the K highest-weight samples per ray."""
        c = self.cfg
        N = position.shape[0]
        # encoders compute in f32 (sin/cos of large-frequency projections
        # need the mantissa); their BOUNDED outputs cast to the activation
        # dtype so the concats and MLP matmul chain move half the bytes
        dt = jnp.bfloat16 if c.field_act_dtype == "bfloat16" else jnp.float32
        pos_feat = self.position_embedder(position, bound=c.bound).astype(dt)
        cond_tiled = jnp.broadcast_to(cond_feat.astype(dt), (N, cond_feat.shape[-1]))

        ambient_inp = jnp.concatenate([pos_feat, cond_tiled], axis=-1)
        ambient_logit = self.ambient_net(ambient_inp).astype(jnp.float32)
        ambient_pos = fast_tanh(ambient_logit)  # fast rational tanh (ops/fastmath.py)
        ambient_feat = self.ambient_embedder(ambient_pos, bound=1.0).astype(dt)

        h = jnp.concatenate([pos_feat, ambient_feat], axis=-1)
        h = self.sigma_net(h).astype(jnp.float32)
        sigma = trunc_exp(h[..., 0])
        geo_feat = h[..., 1:]
        return sigma, geo_feat, ambient_pos

    def field_color(
        self,
        geo_feat: jnp.ndarray,  # [N, geo_feat_dim]
        direction: jnp.ndarray,  # [N, 3] unit
        ind_code: Optional[jnp.ndarray] = None,  # [ind_dim]
    ) -> jnp.ndarray:
        """Appearance stage: view-dependent color from geometry features."""
        N = geo_feat.shape[0]
        dir_feat = sh_encode(direction, degree=4)
        parts = [dir_feat, geo_feat]
        if ind_code is not None:
            parts.append(jnp.broadcast_to(ind_code.reshape(1, -1), (N, ind_code.size)))
        color_logit = self.color_net(jnp.concatenate(parts, axis=-1))
        return nn.sigmoid(color_logit.astype(jnp.float32))

    def field(
        self,
        position: jnp.ndarray,  # [N, 3] in [-bound, bound]
        direction: jnp.ndarray,  # [N, 3] unit
        cond_feat: jnp.ndarray,  # [1, cond_out_dim]
        ind_code: Optional[jnp.ndarray] = None,  # [ind_dim]
    ):
        sigma, geo_feat, ambient_pos = self.field_sigma(position, cond_feat)
        color = self.field_color(geo_feat, direction, ind_code)
        return sigma, color, ambient_pos

    def density(self, position: jnp.ndarray, cond_feat: jnp.ndarray) -> jnp.ndarray:
        """sigma only (update_extra_state path, radnerf.py:143-166)."""
        c = self.cfg
        N = position.shape[0]
        pos_feat = self.position_embedder(position, bound=c.bound)
        cond_tiled = jnp.broadcast_to(cond_feat, (N, cond_feat.shape[-1]))
        ambient_inp = jnp.concatenate([pos_feat, cond_tiled], axis=-1)
        ambient_pos = fast_tanh(self.ambient_net(ambient_inp).astype(jnp.float32))
        ambient_feat = self.ambient_embedder(ambient_pos, bound=1.0)
        h = self.sigma_net(jnp.concatenate(
            [pos_feat.astype(ambient_feat.dtype), ambient_feat], axis=-1))
        return trunc_exp(h[..., 0].astype(jnp.float32))

    def get_individual_code(self, index) -> Optional[jnp.ndarray]:
        if self.cfg.individual_embedding_dim <= 0:
            return None
        return self.individual_embeddings[index]

    def __call__(self, position, direction, cond, index=0, eye_area_percent=None):
        """Convenience forward used for param init: cond window -> field."""
        cond_feat = self.cal_cond_feat(cond, eye_area_percent)
        ind = self.get_individual_code(index)
        return self.field(position, direction, cond_feat, ind)
