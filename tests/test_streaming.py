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
