"""motion_type=idexp_lm3d: the 204-d direct landmark-drive a2m path.

The reference's audio2secc predicts 3DMM coefficients and reconstructs
landmarks through the BFM basis (inference/genefacepp_infer.py:300-340);
identities without a BFM-consistent basis (e.g. the synthetic production
identity) instead train the flow-VAE directly in idexp_lm3d space
(training/tasks/a2m_task.py target="idexp_lm3d") and the pipeline skips
the basis reconstruction (inference/pipeline.py 204-d branch).
"""

import os
import tempfile

import numpy as np
import pytest


@pytest.fixture(scope="module")
def infer_204():
    from genefaceplusplus_tpu.config import save_config
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer

    tmp = tempfile.mkdtemp()
    a2m = os.path.join(tmp, "a2m")
    save_config({"use_pitch": True, "audio_in_dim": 64,
                 "motion_type": "idexp_lm3d",
                 "a2m_hidden_channels": 64, "a2m_enc_layers": 2,
                 "a2m_dec_layers": 2, "a2m_flow_hidden": 16,
                 "a2m_flow_blocks": 2}, a2m)
    head = os.path.join(tmp, "head")
    save_config({"with_sr": False, "grid_size": 16, "smo_win_size": 3,
                 "hidden_dim_sigma": 32, "hidden_dim_ambient": 32,
                 "hidden_dim_color": 32, "geo_feat_dim": 16,
                 "individual_embedding_num": 32}, head)
    ds = RADNeRFDataset(synthetic(num_frames=24, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    return GeneFaceInfer(audio2secc_dir=a2m, head_model_dir=head, dataset=ds)


def test_model_built_with_204_out_dim(infer_204):
    assert infer_204.a2m_model.in_out_dim == 204


def test_forward_audio2secc_direct_drive(infer_204):
    rng = np.random.RandomState(0)
    T = 16
    batch = {
        "hubert": rng.randn(2 * T, 64).astype(np.float32),
        "f0": (np.abs(rng.randn(2 * T)) * 100 + 80).astype(np.float32),
        "T": T,
        "poses": np.stack([infer_204.dataset.frame_pose(i % 24) for i in range(T)]),
        "eulers": np.asarray(infer_204.dataset.ds["euler"])[:T],
        "transs": np.asarray(infer_204.dataset.ds["trans"])[:T],
    }
    out = infer_204.forward_audio2secc(
        batch, {"blink_mode": "none", "lle_percent": 0.2, "temperature": 0.0})
    assert out["cond"].shape == (T, 1, 204)
    assert np.all(np.isfinite(out["cond"]))
    # the direct path projects the driven landmarks for the torso condition
    assert out["lm68"].shape == (T, 68, 2)
    assert np.all(np.isfinite(out["lm68"]))
    # conds stay within the dataset's quantile clamps (normalized space,
    # using the dataset's STORED stats — the training normalisation)
    ds_lm = np.asarray(infer_204.dataset.ds["idexp_lm3d"], np.float32).reshape(-1, 68, 3)
    mean = np.asarray(infer_204.dataset.idexp_lm3d_mean).reshape(68, 3)
    std = np.asarray(infer_204.dataset.idexp_lm3d_std).reshape(68, 3)
    norm = (ds_lm - mean) / std
    lo, hi = np.quantile(norm, 0.03, axis=0), np.quantile(norm, 0.97, axis=0)
    got = out["cond"].reshape(T, 68, 3)
    assert np.all(got >= lo[None] - 1e-4) and np.all(got <= hi[None] + 1e-4)


def test_cond_normalisation_matches_training(infer_204):
    """Train/infer consistency: when the a2m 'prediction' IS the dataset's
    GT idexp_lm3d, the pipeline's condition must reproduce the dataset's
    own normalised conds (what the renderer trained on) up to the quantile
    clamps. Regression for two real bugs: the pipeline recomputing
    mean/std with a different epsilon floor than the dataset (noise on
    zero-variance dims amplified ~1000x into every frame's cond), and a
    singular unregularised LLE solve poisoning conds with NaN."""
    ds = infer_204.dataset
    T = 8
    s = 4
    gt = np.asarray(ds.ds["idexp_lm3d"], np.float32)[s:s + T]

    class _FakeJit:
        def __contains__(self, k):
            return True

        def __getitem__(self, k):
            def fn(params, batch, rng):
                import jax.numpy as jnp
                return jnp.asarray(gt)[None], None
            return fn

    orig = infer_204._a2m_jit
    infer_204._a2m_jit = _FakeJit()
    try:
        batch = {
            "hubert": np.zeros((2 * T, 64), np.float32),
            "f0": np.full((2 * T,), 120.0, np.float32),
            "T": T,
            "poses": np.stack([ds.frame_pose(i % len(ds)) for i in range(T)]),
            "eulers": np.asarray(ds.ds["euler"])[s:s + T],
            "transs": np.asarray(ds.ds["trans"])[s:s + T],
        }
        out = infer_204.forward_audio2secc(
            batch, {"blink_mode": "none", "lle_percent": 0.0, "temperature": 0.0})
    finally:
        infer_204._a2m_jit = orig
    got = out["cond"].reshape(T, 68, 3)
    mean = np.asarray(ds.idexp_lm3d_mean, np.float32).reshape(68, 3)
    std = np.asarray(ds.idexp_lm3d_std, np.float32).reshape(68, 3)
    want = (gt.reshape(T, 68, 3) - mean) / std  # dataset.py's cond convention
    # identical up to the 3%/97% quantile clamps (want is unclamped)
    norm_ds = (np.asarray(ds.ds["idexp_lm3d"], np.float32).reshape(-1, 68, 3) - mean) / std
    lo = np.quantile(norm_ds, 0.03, axis=0)
    hi = np.quantile(norm_ds, 0.97, axis=0)
    np.testing.assert_allclose(got, np.clip(want, lo, hi), atol=1e-4)


def test_calibrated_lm68_matches_stored_convention():
    """The torso conditions on the dataset's stored 2D lms at training
    time (torso_task._frame_lm68); at inference the direct-drive path
    must project driven landmarks into the SAME convention. Regression
    for the audio-driven eval rendering garbage because the BFM-camera
    projection emitted lm68 in [-356, 444] where training saw [0, 1]."""
    from genefaceplusplus_tpu.data.synthetic_face import cached_synthetic_face
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
    from genefaceplusplus_tpu.utils.lm_projection import (
        calibrate_cano_to_world, project_cano_lm3d)

    path = os.path.join(tempfile.mkdtemp(), "synth", "trainval_dataset.npy")
    cached_synthetic_face(path, num_frames=24, size=64)
    ds = RADNeRFDataset(path, split="train", smo_win_size=3, with_sr=True)
    idexp = np.asarray(ds.ds["idexp_lm3d"], np.float32).reshape(-1, 68, 3)
    fids = np.asarray(ds.frame_ids)
    key_mean = 0.3 * np.random.RandomState(0).randn(68, 3).astype(np.float32)
    cano = idexp[fids] / 10.0 + key_mean[None]  # pipeline's cano convention
    lms = np.stack([s["lms"] for s in ds.samples])
    proj, resid = calibrate_cano_to_world(
        cano, ds.poses, ds.intrinsics, lms, ds.H, ds.W)
    assert resid < 0.1, resid  # px — exact-by-construction geometry
    uv = np.asarray(project_cano_lm3d(proj, cano, ds.poses, ds.intrinsics,
                                      ds.H, ds.W))
    err = np.linalg.norm((uv - lms) * np.asarray([ds.W, ds.H]), axis=-1)
    assert err.mean() < 0.1 and err.max() < 1.0


def test_stream_infer_direct_drive_yields_frames(infer_204):
    from genefaceplusplus_tpu.inference.serving import stream_infer

    rng = np.random.RandomState(1)
    T50 = 64
    hubert = rng.randn(T50, 64).astype(np.float32)
    wav = rng.randn(T50 * 320).astype(np.float32) * 0.05
    frames = list(stream_infer(
        infer_204, wav,
        {"hubert_full": hubert, "blink_mode": "none", "lle_percent": 0.0,
         "temperature": 0.0}))
    assert len(frames) >= 8
    for f in frames:
        assert f.shape == (16, 16, 3) and f.dtype == np.uint8
