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


def test_stream_infer_multichip_matches_single(infer):
    """stream_infer(mesh=...) must be live (not a dead arg): with rays
    sharded over an 8-virtual-device mesh, the streamed uint8 frames equal
    the single-device output bit-for-bit up to float reduction order
    (uint8 quantisation absorbs <1e-3 float diffs)."""
    import jax

    from genefaceplusplus_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    rng = np.random.RandomState(2)
    sr = 16000
    wav = (0.3 * np.sin(2 * np.pi * 160 * np.arange(sr * 2) / sr)).astype(np.float32)
    hubert_full = rng.randn(2 * 50 + 16, 64).astype(np.float32)
    inp = {"hubert_full": hubert_full, "blink_mode": "none", "lle_percent": 0.0,
           "temperature": 0.0}

    single = list(stream_infer(infer, wav, dict(inp), chunk_seconds=1.0))
    sharded = list(stream_infer(infer, wav, dict(inp), chunk_seconds=1.0,
                                mesh=make_mesh(8)))
    assert len(single) == len(sharded) > 0
    for a, b in zip(single, sharded):
        # identical up to +/-1 uint8 step from reduction-order float noise
        assert np.max(np.abs(a.astype(np.int16) - b.astype(np.int16))) <= 1


def test_chunk_fn_multichip_with_head_crop(infer):
    """The sharded chunk fn must also compile + match with the head-crop
    path active (dynamic_slice of the sharded ray grid under SPMD)."""
    import jax
    import jax.numpy as jnp

    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.parallel.mesh import make_mesh
    from genefaceplusplus_tpu.utils.rays import get_bg_coords

    assert jax.device_count() >= 8
    ds = infer.dataset
    H, W = ds.H, ds.W
    opts = RenderOptions(num_coarse=16, num_samples=8)
    kw = dict(head_crop=(16, 16), out_dtype="uint8")
    fn1 = infer._build_chunk_fn(opts, H, W, 2, **kw)
    fn8 = infer._build_chunk_fn(opts, H, W, 2, mesh=make_mesh(8), **kw)

    poses = jnp.asarray(np.stack([ds.frame_pose(i) for i in (0, 1)]))
    rays_o, rays_d, _ = infer._jit_rays(poses, tuple(ds.intrinsics), H, W)
    conds = jnp.asarray(np.stack([ds.frame_cond_window(i) for i in (0, 1)]))
    eye = jnp.full((2, 1, 1), 0.25)
    bg_color = jnp.asarray(ds.bg_img.reshape(-1, 3))
    bg_coords = get_bg_coords(H, W)[0]
    lm68 = jnp.zeros((2, 1, 68, 2))
    args = (infer.head_params, None, None, rays_o, rays_d, conds, eye,
            infer.occupancy, bg_color, bg_coords, lm68)
    imgs1, fits1 = fn1(*args)
    imgs8, fits8 = fn8(*args)
    assert np.array_equal(np.asarray(fits1), np.asarray(fits8))
    assert np.max(np.abs(np.asarray(imgs1).astype(np.int16)
                         - np.asarray(imgs8).astype(np.int16))) <= 1
