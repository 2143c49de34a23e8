"""Flow-prior VAE over motion sequences.

Parity: FVAEEncoder / FVAEDecoder / FVAE,
/root/reference/modules/audio2motion/vae.py:99-269 —
  encoder: strided conv (k=2s, stride s, pad s//2) -> WN -> 1x1 -> (m, logs),
    reparameterised z = m + eps*exp(logs)
  decoder: ConvTranspose (k=s, stride s) -> WN -> 1x1
  prior: mean-only residual-coupling flow; train KL = E[logq(z) - logN(z_p)]
    / mask / latent_dim; infer z_p ~ N(0, temperature) -> inverse flow ->
    decode. Optional sqz_prior style-attention pooling (vae.py:174-186,
    211-225) and the 71-channel exp+pose dual decoder.

Feature-last [B, T, C].
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.models.audio2motion.flow import ResidualCouplingBlock
from genefaceplusplus_tpu.models.audio2motion.wavenet import WN

_LOG_2PI = math.log(2.0 * math.pi)


def normal_logprob(x, mean, logs):
    return -0.5 * (_LOG_2PI + 2.0 * logs + ((x - mean) * jnp.exp(-logs)) ** 2)


class FVAEEncoder(nn.Module):
    hidden_channels: int
    latent_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, x, x_mask, g, rng) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        # x: [B, T, C_in]; x_mask: [B, T, 1]; g: [B, T_sqz, gin]
        h = x
        for s in self.strides:
            h = nn.Conv(self.hidden_channels, kernel_size=(2 * s,), strides=(s,), padding=[(s // 2, s // 2)])(h)
        stride_total = int(np.prod(self.strides))
        mask_sqz = x_mask[:, ::stride_total][:, : h.shape[1]]
        h = h * mask_sqz
        h = WN(self.hidden_channels, self.kernel_size, 1, self.n_layers, self.gin_channels, name="wn")(h, mask_sqz, g) * mask_sqz
        stats = nn.Conv(2 * self.latent_channels, kernel_size=(1,))(h)
        m, logs = stats[..., : self.latent_channels], stats[..., self.latent_channels :]
        z = m + jax.random.normal(rng, m.shape) * jnp.exp(logs)
        return z, m, logs, mask_sqz


class FVAEDecoder(nn.Module):
    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, z, x_mask, g):
        # z: [B, T_sqz, C]; x_mask: [B, T, 1] or scalar 1; g: [B, T, gin]
        h = z
        for s in self.strides:
            h = nn.ConvTranspose(self.hidden_channels, kernel_size=(s,), strides=(s,), padding="VALID")(h)
        if not isinstance(x_mask, (int, float)):
            # the encoder's strided conv may round T/stride up; crop/pad the
            # mask to the decoded length (reference requires T % 8 == 0 and
            # would crash otherwise — we are robust to any T)
            mask = x_mask[:, : h.shape[1]]
            if mask.shape[1] < h.shape[1]:
                mask = jnp.pad(mask, ((0, 0), (0, h.shape[1] - mask.shape[1]), (0, 0)))
            h = h * mask
        else:
            mask = jnp.ones_like(h[..., :1])
        g_fit = g[:, : h.shape[1]]
        if g_fit.shape[1] < h.shape[1]:
            g_fit = jnp.pad(g_fit, ((0, 0), (0, h.shape[1] - g_fit.shape[1]), (0, 0)))
        h = WN(self.hidden_channels, self.kernel_size, 1, self.n_layers, self.gin_channels, name="wn")(h, mask, g_fit) * mask
        return nn.Conv(self.out_channels, kernel_size=(1,))(h)


class FVAE(nn.Module):
    in_out_channels: int = 64
    hidden_channels: int = 256
    latent_size: int = 16
    kernel_size: int = 3
    enc_n_layers: int = 5
    dec_n_layers: int = 5
    gin_channels: int = 80
    strides: Sequence[int] = (4,)
    use_prior_flow: bool = True
    flow_hidden: int = 256
    flow_kernel_size: int = 3
    flow_n_blocks: int = 4
    sqz_prior: bool = False

    def setup(self):
        s = self.strides[0]
        self.g_pre_net = nn.Conv(
            self.gin_channels, kernel_size=(2 * s,), strides=(s,), padding=[(s // 2, s // 2)], name="g_pre_net"
        )
        self.encoder = FVAEEncoder(
            self.hidden_channels, self.latent_size, self.kernel_size, self.enc_n_layers,
            self.gin_channels, self.strides, name="encoder",
        )
        if self.use_prior_flow:
            self.prior_flow = ResidualCouplingBlock(
                self.latent_size, self.flow_hidden, self.flow_kernel_size, 1, self.flow_n_blocks,
                n_flows=4, gin_channels=self.gin_channels, name="prior_flow",
            )
        dec_in = self.hidden_channels if self.sqz_prior else self.latent_size
        if self.sqz_prior:
            self.query_proj = nn.Dense(self.latent_size, name="query_proj")
            self.key_proj = nn.Dense(self.latent_size, name="key_proj")
            self.value_proj = nn.Dense(self.hidden_channels, name="value_proj")
        if self.in_out_channels == 71:
            self.exp_decoder = FVAEDecoder(
                self.hidden_channels, 64, self.kernel_size, self.dec_n_layers,
                self.gin_channels, self.strides, name="exp_decoder",
            )
            self.pose_decoder = FVAEDecoder(
                self.hidden_channels, 7, self.kernel_size, self.dec_n_layers,
                self.gin_channels, self.strides, name="pose_decoder",
            )
            self._dec_in = dec_in
        else:
            self.decoder = FVAEDecoder(
                self.hidden_channels, self.in_out_channels, self.kernel_size, self.dec_n_layers,
                self.gin_channels, self.strides, name="decoder",
            )

    def _style_pool(self, z):
        """sqz_prior attention pooling (vae.py:211-225): one style vector
        attended from the latent sequence, broadcast over time."""
        q = self.query_proj(z.mean(axis=1, keepdims=True))  # [B, 1, L]
        k = self.key_proj(z)  # [B, T, L]
        v = self.value_proj(z)  # [B, T, H]
        attn = nn.softmax(q @ jnp.swapaxes(k, 1, 2), axis=-1)  # [B, 1, T]
        out = attn @ v  # [B, 1, H]
        return jnp.broadcast_to(out, (z.shape[0], z.shape[1], v.shape[-1]))

    def _decode(self, z, x_mask, g, out_len: int):
        if self.in_out_channels == 71:
            out = jnp.concatenate(
                [self.exp_decoder(z, x_mask, g), self.pose_decoder(z, x_mask, g)], axis=-1
            )
        else:
            out = self.decoder(z, x_mask, g)
        # fit decoded length to the requested sequence length
        if out.shape[1] > out_len:
            out = out[:, :out_len]
        elif out.shape[1] < out_len:
            out = jnp.pad(out, ((0, 0), (0, out_len - out.shape[1]), (0, 0)))
        return out

    def __call__(self, x, x_mask, g, infer: bool = False, temperature: float = 1.0,
                 rng: Optional[jax.Array] = None):
        """
        x: [B, T, C_io] (None at infer); x_mask: [B, T]; g: [B, T, C_g].
        Train -> (x_recon, loss_kl, z_p, m_q, logs_q); infer -> (x_recon, z_p).
        """
        x_mask3 = x_mask[..., None]  # [B, T, 1]
        g_sqz = self.g_pre_net(g)

        if not infer:
            assert rng is not None, "training requires a reparameterisation rng"
            z_q, m_q, logs_q, mask_sqz = self.encoder(x, x_mask3, g_sqz, rng)
            dec_in = self._style_pool(z_q) if self.sqz_prior else z_q
            x_recon = self._decode(dec_in, x_mask3, g, out_len=x_mask.shape[1])
            logqx = normal_logprob(z_q, m_q, logs_q)
            if self.use_prior_flow:
                z_p = self.prior_flow(z_q, mask_sqz, g=g_sqz, reverse=False)
                logpx = normal_logprob(z_p, 0.0, jnp.zeros_like(z_p))
                loss_kl = ((logqx - logpx) * mask_sqz).sum() / mask_sqz.sum() / self.latent_size
            else:
                # analytic KL(N(m,s) || N(0,1)) summed like the reference
                kl = 0.5 * (jnp.exp(2 * logs_q) + m_q ** 2 - 1.0) - logs_q
                loss_kl = (kl * mask_sqz).sum() / mask_sqz.sum() / self.latent_size
                z_p = z_q
            return x_recon, loss_kl, z_p, m_q, logs_q

        assert rng is not None, "inference sampling requires an rng"
        T_sqz = g_sqz.shape[1]
        z_p = jax.random.normal(rng, (g.shape[0], T_sqz, self.latent_size)) * temperature
        if self.use_prior_flow:
            z_p = self.prior_flow(z_p, None, g=g_sqz, reverse=True)
        dec_in = self._style_pool(z_p) if self.sqz_prior else z_p
        x_recon = self._decode(dec_in, 1, g, out_len=x_mask.shape[1])
        return x_recon, z_p
