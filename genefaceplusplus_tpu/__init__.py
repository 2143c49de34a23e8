"""GeneFace++-TPU: a TPU-native audio-driven talking-head framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
yerfor/GeneFacePlusPlus (reference: /root/reference):

  wav (16 kHz) -> HuBERT + pitch features
              -> audio->motion flow-prior VAE      (models/audio2motion)
              -> 3DMM expression -> 68-pt landmarks (data/face3d.py)
              -> dynamic grid-encoded NeRF renderer (models/radnerf.py)
              -> StyleGAN2-style 2x super-resolution (models/superresolution.py)
              -> 512x512 @ 25 fps video

Design principles (TPU-first, not a port):
  * static shapes everywhere: ray marching is fixed-K stepping with
    occupancy masking + prefix-sum compaction, not atomic stream compaction
  * all hot math is batched bf16/f32 matmul on the MXU; grid encoders are
    vectorised gathers (Pallas kernels in ops/pallas/, jnp reference in ops/)
  * multi-chip scaling via jax.sharding.Mesh (rays axis for rendering,
    data axis for training); collectives are XLA-inserted, never hand-rolled
"""

__version__ = "0.1.0"
