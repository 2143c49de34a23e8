"""Pitch-conditioned CNN postnet: landmark refinement.

The reference imports `PitchContourCNNPostNet`
(/root/reference/inference/genefacepp_infer.py:155) but the module is
MISSING from the released repo (modules/postnet/models.py does not exist);
the postnet branch is only reachable with a --postnet_ckpt the authors never
shipped. This is a faithful-capability reconstruction from the call site:
  postnet(raw_pred_lm3d [B, T, 204], pitch [B, 2T, C]) -> refined [B, T, 204]
A residual dilated-conv refiner conditioned on 2x-downsampled pitch features.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from genefaceplusplus_tpu.models.audio2motion.vae_model import downsample2x_nearest


class PitchContourCNNPostNet(nn.Module):
    out_dim: int = 204  # 68 * 3
    hidden: int = 256
    n_layers: int = 4

    @nn.compact
    def __call__(self, lm3d: jnp.ndarray, pitch: jnp.ndarray) -> jnp.ndarray:
        """lm3d [B, T, out_dim]; pitch [B, 2T, C] -> refined [B, T, out_dim]."""
        pitch = downsample2x_nearest(pitch)[:, : lm3d.shape[1]]
        if pitch.shape[1] < lm3d.shape[1]:
            pitch = jnp.pad(pitch, ((0, 0), (0, lm3d.shape[1] - pitch.shape[1]), (0, 0)), mode="edge")
        h = jnp.concatenate([lm3d, pitch], axis=-1)
        h = nn.Conv(self.hidden, kernel_size=(3,), padding=[(1, 1)])(h)
        for i in range(self.n_layers):
            dilation = 2 ** i
            pad = dilation
            r = nn.gelu(nn.Conv(self.hidden, kernel_size=(3,), kernel_dilation=(dilation,),
                                padding=[(pad, pad)])(h))
            r = nn.Conv(self.hidden, kernel_size=(1,))(r)
            h = h + r
        delta = nn.Conv(self.out_dim, kernel_size=(1,),
                        kernel_init=nn.initializers.zeros)(h)
        return lm3d + delta  # zero-init residual: identity at init
