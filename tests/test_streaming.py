"""Streaming inference: chunked audio -> frames at chunk latency."""

import numpy as np
import pytest

from genefaceplusplus_tpu.config import save_config
from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer
from genefaceplusplus_tpu.inference.serving import stream_infer


@pytest.fixture(scope="module")
def infer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    a2m, head = str(tmp / "a2m"), str(tmp / "head")
    save_config({"use_pitch": True, "audio_in_dim": 64, "a2m_hidden_channels": 64,
                 "a2m_enc_layers": 2, "a2m_dec_layers": 2, "a2m_flow_hidden": 16,
                 "a2m_flow_blocks": 2}, a2m)
    save_config({"with_sr": False, "grid_size": 16, "smo_win_size": 3,
                 "hidden_dim_sigma": 32, "hidden_dim_ambient": 32,
                 "hidden_dim_color": 32, "geo_feat_dim": 16,
                 "individual_embedding_num": 32}, head)
    ds = RADNeRFDataset(synthetic(num_frames=24, H=24, W=24), split="train",
                        smo_win_size=3, with_sr=False)
    return GeneFaceInfer(audio2secc_dir=a2m, head_model_dir=head, dataset=ds)


def test_stream_infer_yields_frames(infer):
    rng = np.random.RandomState(0)
    sr = 16000
    wav = (0.3 * np.sin(2 * np.pi * 160 * np.arange(sr * 4) / sr)).astype(np.float32)
    hubert_full = rng.randn(4 * 50 + 16, 64).astype(np.float32)
    frames = []
    for frame in stream_infer(
        infer, wav, {"hubert_full": hubert_full, "blink_mode": "none", "lle_percent": 0.0},
        chunk_seconds=2.0,
    ):
        frames.append(frame)
        if len(frames) >= 50:
            break
    assert len(frames) == 50
    assert frames[0].shape == (24, 24, 3) and frames[0].dtype == np.uint8
    # frames vary over time (conds drive the render)
    assert any(not np.array_equal(frames[0], f) for f in frames[1:])


def test_stream_infer_no_audio_drift(infer):
    """The multiple-of-8 feature truncation must not desync audio and
    frames: the cursor advances by CONSUMED samples, so over a long wav the
    frame count matches the consumed audio duration at 25 fps exactly
    (regression: 4 dropped frames per 2 s chunk -> 160 ms/chunk A/V drift
    and an eventual empty-batch crash)."""
    rng = np.random.RandomState(1)
    sr = 16000
    secs = 12
    wav = (0.3 * np.sin(2 * np.pi * 160 * np.arange(sr * secs) / sr)).astype(np.float32)
    hubert_full = rng.randn(secs * 50 + 16, 64).astype(np.float32)
    n = 0
    for _ in stream_infer(
        infer, wav, {"hubert_full": hubert_full, "blink_mode": "none", "lle_percent": 0.0},
        chunk_seconds=2.0,
    ):
        n += 1
    # every chunk consumes exactly T frames of audio; the tail (<1 block) is
    # dropped, so 25*secs - n < one chunk's frame count
    assert 25 * secs - 50 <= n <= 25 * secs, n
