"""Windowed condition extraction (get_audio_features att modes 0/1/2)."""

import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.utils.audio_features import (
    get_audio_features,
    get_audio_features_batch,
)

FEATS = jnp.arange(10, dtype=jnp.float32)[:, None] + 1.0  # [10, 1], rows 1..10


def test_att_mode_0_single_row():
    out = get_audio_features(FEATS, 4, smo_win_size=3, att_mode=0)
    np.testing.assert_allclose(np.asarray(out), [[5.0]])


def test_att_mode_1_causal_window():
    out = get_audio_features(FEATS, 4, smo_win_size=3, att_mode=1)
    np.testing.assert_allclose(np.asarray(out)[:, 0], [3.0, 4.0, 5.0])
    # zero-padded before t=0
    out0 = get_audio_features(FEATS, 1, smo_win_size=4, att_mode=1)
    np.testing.assert_allclose(np.asarray(out0)[:, 0], [0.0, 0.0, 1.0, 2.0])


def test_att_mode_2_centered_window():
    out = get_audio_features(FEATS, 4, smo_win_size=3, att_mode=2)
    np.testing.assert_allclose(np.asarray(out)[:, 0], [4.0, 5.0, 6.0])
    # zero-padded at both edges
    lo = get_audio_features(FEATS, 0, smo_win_size=5, att_mode=2)
    np.testing.assert_allclose(np.asarray(lo)[:, 0], [0.0, 0.0, 1.0, 2.0, 3.0])
    hi = get_audio_features(FEATS, 9, smo_win_size=5, att_mode=2)
    np.testing.assert_allclose(np.asarray(hi)[:, 0], [8.0, 9.0, 10.0, 0.0, 0.0])


def test_batch_matches_single():
    idxs = jnp.asarray([0, 4, 9])
    batch = get_audio_features_batch(FEATS, idxs, smo_win_size=3)
    for j, i in enumerate([0, 4, 9]):
        single = get_audio_features(FEATS, i, smo_win_size=3, att_mode=2)
        np.testing.assert_allclose(np.asarray(batch[j]), np.asarray(single))
