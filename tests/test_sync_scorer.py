"""Sync-confidence instrument: the three falsifiability controls.

An in-sync clip must score high with offset 0; the SAME video scored
against temporally shuffled audio must collapse; a frozen mouth must
carry no sync signal. These pins are what make the metric citable in
quality evals (the reference's Sync-conf analogue; README metric table)."""

import numpy as np
import pytest

from genefaceplusplus_tpu.metrics import (
    sync_confidence, train_sync_scorer,
)
from genefaceplusplus_tpu.metrics.sync_scorer import normalize_mouth_lms


def _make_clip(T=240, seed=0, audio_dim=64):
    """Articulated synthetic pair: mouth opens with a latent jaw signal,
    audio features are a (noisy, nuisance-laden) projection of the same
    signal + its derivative — the structure real hubert/speech shares."""
    rng = np.random.RandomState(seed)
    tt = np.arange(T) / 25.0
    jaw = np.clip(0.5 + 0.5 * np.sin(2 * np.pi * 2.3 * tt)
                  * np.sin(2 * np.pi * 0.37 * tt + 1.0), 0, 1)
    # lm68 layout: eyes at 36:48, nose 27:36, mouth 48:68
    base = rng.rand(68, 2) * 0.2
    base[36:42] = [0.35, 0.35] + rng.rand(6, 2) * 0.02
    base[42:48] = [0.65, 0.35] + rng.rand(6, 2) * 0.02
    base[27:36] = [0.5, 0.45] + rng.rand(9, 2) * 0.02
    base[48:68] = [0.5, 0.7] + rng.rand(20, 2) * 0.05
    lms = np.repeat(base[None], T, 0).copy()
    lms[:, 48:68, 1] += 0.08 * jaw[:, None] * np.linspace(0, 1, 20)[None]
    lms[:, 48:68, 0] += 0.03 * np.sin(2 * np.pi * 0.9 * tt)[:, None]

    jaw50 = np.interp(np.linspace(0, T - 1, 2 * T), np.arange(T), jaw)
    feats = np.stack([jaw50, np.gradient(jaw50)], -1)
    nuis = rng.randn(2 * T, 3) * 0.5
    proj = rng.randn(5, audio_dim) / np.sqrt(5)
    hubert = np.tanh(np.concatenate([feats, nuis], -1) @ proj) \
        + 0.05 * rng.randn(2 * T, audio_dim)
    return hubert.astype(np.float32), lms.astype(np.float32)


@pytest.fixture(scope="module")
def trained():
    hubert, lms = _make_clip()
    params = train_sync_scorer(hubert, lms, steps=500, batch=48, seed=0)
    return params, hubert, lms


def test_normalize_removes_pose():
    _, lms = _make_clip()
    shifted = lms + np.asarray([0.3, -0.2], np.float32)
    scaled = lms * 1.7
    np.testing.assert_allclose(normalize_mouth_lms(lms),
                               normalize_mouth_lms(shifted), atol=1e-5)
    np.testing.assert_allclose(normalize_mouth_lms(lms),
                               normalize_mouth_lms(scaled), atol=1e-4)


def test_aligned_scores_high_at_zero_offset(trained):
    params, hubert, lms = trained
    res = sync_confidence(params, hubert, lms)
    assert abs(res["offset"]) <= 1, res
    assert res["confidence"] > 0.15, res


def test_shuffled_audio_collapses(trained):
    params, hubert, lms = trained
    rng = np.random.RandomState(3)
    # block-shuffle (2-frame blocks keep 50 Hz pairs intact, destroy order)
    blocks = hubert.reshape(-1, 2, hubert.shape[-1])
    hub_shuf = blocks[rng.permutation(len(blocks))].reshape(hubert.shape)
    aligned = sync_confidence(params, hubert, lms)["confidence"]
    shuffled = sync_confidence(params, hub_shuf, lms)["confidence"]
    assert shuffled < 0.5 * aligned, (aligned, shuffled)


def test_frozen_mouth_carries_no_signal(trained):
    params, hubert, lms = trained
    frozen = np.repeat(lms[:1], len(lms), 0)
    res = sync_confidence(params, hubert, frozen)
    aligned = sync_confidence(params, hubert, lms)["confidence"]
    assert res["confidence"] < 0.5 * aligned, (aligned, res["confidence"])
