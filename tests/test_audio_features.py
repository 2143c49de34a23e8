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


def test_real_speech_wav_mel_f0():
    """Real-speech regression: the reference ships one validation wav
    (data/raw/val_wavs/MacronSpeech.wav); the native Slaney-mel + ACF-F0
    extractors must produce plausible speech features from it."""
    import os

    import pytest

    path = "/root/reference/data/raw/val_wavs/MacronSpeech.wav"
    if not os.path.exists(path):
        pytest.skip("reference validation wav not present")
    from genefaceplusplus_tpu.data import audio

    wav = audio.load_wav_16k(path)
    assert wav.ndim == 1 and len(wav) > 16000  # at least a second of speech
    assert np.abs(wav).max() <= 1.0 + 1e-6
    wav_padded, mel = audio.extract_mel(wav)
    f0 = audio.extract_f0(wav, mel_len=mel.shape[0])
    assert np.isfinite(mel).all()
    # voiced frames must exist, with F0 in the human speech range
    f0 = np.asarray(f0)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.2 * len(f0)  # speech, not silence
    assert 60 <= np.median(voiced) <= 320, np.median(voiced)
    # mel frames and f0 frames must align to the same hop grid
    assert abs(mel.shape[0] - len(f0)) <= 2, (mel.shape, f0.shape)
