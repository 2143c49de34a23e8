"""Audio->motion models: HuBERT(+pitch) conditioned flow-prior VAEs.

Parity: VAEModel (/root/reference/modules/audio2motion/vae.py:272-337) and
PitchContourVAEModel (:340-454):
  * mel_encoder: Conv(k3,no-bias) -> BatchNorm -> GELU -> Conv(k3,no-bias)
  * pitch: f0 -> 2x nearest-downsample -> f0_to_coarse -> Embed(300) ->
    conv stack (pitch model only)
  * blink: Embed(2) per-frame, downsampled
  * optional mouth/eye amplitude embeddings scaled by per-clip scalars
  * cond_proj Linear -> FVAE(hidden 256, latent 16, k5, enc 8 / dec 4
    layers, flow hidden 64 x 4 blocks, stride 4)
  * audio 50 Hz -> motion 25 Hz via 2x temporal downsample
    (VAEModel: linear a.k.a. pairwise mean; Pitch model: nearest a.k.a.
    every 2nd frame — vae.py:295,385)

I/O: batch dict with 'audio' [B, 2T, C_aud], 'f0' [B, 2T], 'y_mask' [B, T],
optional 'blink' [B, 2T, 1], 'mouth_amp'/'eye_amp' [B, 1], 'y' [B, T, C_io].
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from genefaceplusplus_tpu.models.audio2motion.fvae import FVAE
from genefaceplusplus_tpu.utils.pitch import f0_to_coarse


def downsample2x_linear(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 2T, C] -> [B, T, C] pairwise mean (F.interpolate linear, sf=0.5)."""
    B, T2, C = x.shape
    return x.reshape(B, T2 // 2, 2, C).mean(axis=2)


def downsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 2T, C] -> [B, T, C] every 2nd frame (F.interpolate nearest, sf=0.5)."""
    return x[:, ::2]


class ConvStack(nn.Module):
    """Conv(k3,no-bias) -> BN -> GELU -> Conv(k3,no-bias) (vae.py:279-284)."""

    feat_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(self.feat_dim, kernel_size=(3,), padding=[(1, 1)], use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.feat_dim, kernel_size=(3,), padding=[(1, 1)], use_bias=False)(h)
        return h


class VAEModel(nn.Module):
    """Landmark-VAE conditioned on HuBERT only (vae.py:272-337)."""

    in_out_dim: int = 64
    audio_in_dim: int = 1024
    sqz_prior: bool = False
    use_prior_flow: bool = True
    hidden_channels: int = 256   # reference: 256 (vae.py:292)
    enc_n_layers: int = 8
    dec_n_layers: int = 4
    flow_hidden: int = 64
    flow_n_blocks: int = 4

    def setup(self):
        feat_dim = 64
        self.mel_encoder = ConvStack(feat_dim, name="mel_encoder")
        self.vae = FVAE(
            in_out_channels=self.in_out_dim, hidden_channels=self.hidden_channels,
            latent_size=16, kernel_size=5, enc_n_layers=self.enc_n_layers,
            dec_n_layers=self.dec_n_layers, gin_channels=feat_dim,
            strides=(4,), use_prior_flow=self.use_prior_flow, flow_hidden=self.flow_hidden,
            flow_kernel_size=3, flow_n_blocks=self.flow_n_blocks,
            sqz_prior=self.sqz_prior, name="vae",
        )

    def __call__(self, batch: Dict[str, Any], train: bool = True,
                 temperature: float = 1.0, rng: Optional[jax.Array] = None):
        mask = batch["y_mask"]
        mel = downsample2x_linear(batch["audio"])
        cond_feat = self.mel_encoder(mel, train=train)
        if not train:
            x_recon, z_p = self.vae(None, mask, cond_feat, infer=True, temperature=temperature, rng=rng)
            return x_recon * mask[..., None], {"z_p": z_p}
        x_recon, loss_kl, z_p, m_q, logs_q = self.vae(batch["y"], mask, cond_feat, infer=False, rng=rng)
        x_recon = x_recon * mask[..., None]
        return x_recon, {"loss_kl": loss_kl, "z_p": z_p, "m_q": m_q, "logs_q": logs_q}


class PitchContourVAEModel(nn.Module):
    """HuBERT + pitch-contour + blink conditioned VAE (vae.py:340-454)."""

    in_out_dim: int = 64
    audio_in_dim: int = 1024
    sqz_prior: bool = False
    use_prior_flow: bool = True
    use_mouth_amp_embed: bool = True
    use_eye_amp_embed: bool = False
    feat_dim: int = 128
    hidden_channels: int = 256   # reference: 256 (vae.py:382)
    enc_n_layers: int = 8
    dec_n_layers: int = 4
    flow_hidden: int = 64
    flow_n_blocks: int = 4

    def setup(self):
        fd = self.feat_dim
        self.blink_embed = nn.Embed(2, fd, name="blink_embed")
        self.mel_encoder = ConvStack(fd, name="mel_encoder")
        self.pitch_embed = nn.Embed(300, fd, name="pitch_embed")
        self.pitch_encoder = ConvStack(fd, name="pitch_encoder")
        if self.use_mouth_amp_embed:
            self.mouth_amp_embed = self.param("mouth_amp_embed", nn.initializers.normal(1.0), (fd,))
        if self.use_eye_amp_embed:
            self.eye_amp_embed = self.param("eye_amp_embed", nn.initializers.normal(1.0), (fd,))
        self.cond_proj = nn.Dense(fd, use_bias=True, name="cond_proj")
        self.vae = FVAE(
            in_out_channels=self.in_out_dim, hidden_channels=self.hidden_channels,
            latent_size=16, kernel_size=5, enc_n_layers=self.enc_n_layers,
            dec_n_layers=self.dec_n_layers, gin_channels=fd,
            strides=(4,), use_prior_flow=self.use_prior_flow, flow_hidden=self.flow_hidden,
            flow_kernel_size=3, flow_n_blocks=self.flow_n_blocks,
            sqz_prior=self.sqz_prior, name="vae",
        )

    def __call__(self, batch: Dict[str, Any], train: bool = True,
                 temperature: float = 1.0, rng: Optional[jax.Array] = None):
        mask = batch["y_mask"]  # [B, T] at 25 Hz
        mel = batch["audio"]  # [B, 2T, C]
        f0 = batch["f0"]  # [B, 2T]
        B = f0.shape[0]
        blink = batch.get("blink")
        if blink is None:
            blink = jnp.zeros((B, f0.shape[1], 1), jnp.int32)

        blink_feat = self.blink_embed(blink[..., 0])  # [B, 2T, fd]
        blink_feat = downsample2x_nearest(blink_feat)
        mel = downsample2x_nearest(mel)
        f0 = downsample2x_nearest(f0[..., None])[..., 0]
        pitch_emb = self.pitch_embed(f0_to_coarse(f0))

        cond_feats = [
            self.mel_encoder(mel, train=train),
            self.pitch_encoder(pitch_emb, train=train),
            blink_feat,
        ]
        T = cond_feats[0].shape[1]
        if self.use_mouth_amp_embed:
            amp = batch.get("mouth_amp", jnp.full((B, 1), 0.4))
            cond_feats.append(jnp.broadcast_to(
                (amp[:, :, None] * self.mouth_amp_embed[None, None, :]), (B, T, self.feat_dim)
            ))
        if self.use_eye_amp_embed:
            amp = batch.get("eye_amp", jnp.full((B, 1), 0.4))
            cond_feats.append(jnp.broadcast_to(
                (amp[:, :, None] * self.eye_amp_embed[None, None, :]), (B, T, self.feat_dim)
            ))
        cond_feat = self.cond_proj(jnp.concatenate(cond_feats, axis=-1))

        if not train:
            x_recon, z_p = self.vae(None, mask, cond_feat, infer=True, temperature=temperature, rng=rng)
            return x_recon * mask[..., None], {"z_p": z_p}
        x_recon, loss_kl, z_p, m_q, logs_q = self.vae(batch["y"], mask, cond_feat, infer=False, rng=rng)
        x_recon = x_recon * mask[..., None]
        return x_recon, {"loss_kl": loss_kl, "z_p": z_p, "m_q": m_q, "logs_q": logs_q}
