"""Windowed condition-feature extraction.

Parity target: get_audio_features, /root/reference/modules/radnerfs/utils.py:71-104.
att_mode 2 (centered window, zero-padded at edges) is the live path
(tasks/radnerfs/dataset_utils.py:339-341). Implemented with static shapes:
a single gather with edge-index clamping + zero masking, vmappable over idx.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_audio_features(features: jnp.ndarray, index, smo_win_size: int = 8, att_mode: int = 2) -> jnp.ndarray:
    """Extract a [win, ...] condition window centred at ``index``.

    Args:
      features: [T, ...] per-frame condition features.
      index: scalar int (python or traced).
      smo_win_size: window length (reference ``hparams['smo_win_size']``).
    Returns:
      [smo_win_size, ...]; out-of-range rows are zeros (att_mode=2), or
      [1, ...] slice for att_mode=0.
    """
    T = features.shape[0]
    if att_mode == 0:
        return jnp.take(features, jnp.asarray([index]), axis=0)
    if att_mode == 1:
        # causal window: the smo_win frames ENDING at index (utils.py:79-88),
        # zero-padded before t=0 — the streaming-friendly variant
        offs = jnp.arange(smo_win_size) + (index - smo_win_size + 1)
        valid = offs >= 0
        gathered = jnp.take(features, jnp.clip(offs, 0, T - 1), axis=0)
        mask = valid.reshape((smo_win_size,) + (1,) * (features.ndim - 1))
        return jnp.where(mask, gathered, 0.0)
    if att_mode == 2:
        left = index - smo_win_size // 2
        offs = jnp.arange(smo_win_size) + left
        valid = (offs >= 0) & (offs < T)
        gathered = jnp.take(features, jnp.clip(offs, 0, T - 1), axis=0)
        mask = valid.reshape((smo_win_size,) + (1,) * (features.ndim - 1))
        return jnp.where(mask, gathered, 0.0)
    raise NotImplementedError(f"att_mode {att_mode}")


def get_audio_features_batch(features: jnp.ndarray, indices: jnp.ndarray, smo_win_size: int = 8) -> jnp.ndarray:
    """Vectorised att_mode=2 windows for many frame indices: [N, win, ...]."""
    T = features.shape[0]
    left = indices[:, None] - smo_win_size // 2
    offs = left + jnp.arange(smo_win_size)[None, :]
    valid = (offs >= 0) & (offs < T)
    gathered = jnp.take(features, jnp.clip(offs, 0, T - 1), axis=0)
    mask = valid.reshape(valid.shape + (1,) * (features.ndim - 1))
    return jnp.where(mask, gathered, 0.0)
