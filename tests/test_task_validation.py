"""Held-out validation for the a2m and postnet tasks (round-2 verdict:
a2m shipped with validate() -> {} and postnet validated on the training
sampler). Both now carve a last-1/11 temporal split that training windows
never touch (mirroring binarizer_nerf.py:279-282) and report split-disjoint
metrics, incl. landmark-space LMD where the target is landmark space."""

import numpy as np

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
from genefaceplusplus_tpu.training.tasks.a2m_task import A2MTask, A2MTaskConfig
from genefaceplusplus_tpu.training.tasks.postnet_task import PostnetTask, PostnetTaskConfig

SMALL = dict(hidden_channels=32, enc_n_layers=2, dec_n_layers=2,
             flow_hidden=16, flow_n_blocks=2)


def _ds(frames=48):
    return RADNeRFDataset(synthetic(num_frames=frames, H=16, W=16),
                          split="train", smo_win_size=3, with_sr=False)


def test_a2m_split_is_disjoint_and_val_nonempty():
    ds = _ds()
    task = A2MTask(ds, A2MTaskConfig(seq_len=16, batch_size=2,
                                     audio_in_dim=1024, **SMALL), seed=0)
    assert task.T_val >= 16 and task.T_train + task.T_val == task.T
    # training windows never reach the held-out region
    for _ in range(50):
        b = task.sample_train_batch()
    # (sample_train_batch caps starts at T_train - L, so every window ends
    # at most at T_train - 1 < T_train)
    state = task.create_state()
    v = task.validate(state)
    assert set(v) >= {"val_recon_mse", "val_gen_l1", "val_kl"}
    assert all(np.isfinite(x) for x in v.values())
    # deterministic: the metric must be comparable across calls
    v2 = task.validate(state)
    assert v == v2


def test_a2m_landmark_target_reports_lmd():
    ds = _ds()
    task = A2MTask(ds, A2MTaskConfig(seq_len=16, batch_size=2, in_out_dim=204,
                                     target="idexp_lm3d", audio_in_dim=1024,
                                     **SMALL), seed=0)
    state = task.create_state()
    # one step exercises the 204-d target end to end
    state, metrics = task.train_step(state, task.sample_train_batch())
    assert np.isfinite(float(metrics["total_loss"]))
    v = task.validate(state)
    assert "val_lmd" in v and np.isfinite(v["val_lmd"])


def test_a2m_target_dim_mismatch_fails_loudly():
    import pytest

    with pytest.raises(AssertionError, match="in_out_dim"):
        A2MTask(_ds(), A2MTaskConfig(seq_len=16, target="idexp_lm3d",
                                     in_out_dim=64, **SMALL))


def test_postnet_validates_on_heldout_split():
    ds = _ds(44)
    cfg = PostnetTaskConfig(out_dim=204, hidden=32, n_layers=2, seq_len=16,
                            batch_size=2, noise_scale=0.2)
    task = PostnetTask(ds, cfg, seed=0)
    assert task.T_val >= 16 and task.T_train + task.T_val == task.T
    state = task.create_state()
    v = task.validate(state)
    assert set(v) >= {"val_l1_refined", "val_l1_raw", "val_lmd"}
    # deterministic fixed-seed noise: repeatable metric
    assert v == task.validate(state)
    # train sampler stays inside the train region
    for _ in range(20):
        task.sample_train_batch()


def test_head_validate_uses_torso_composited_background():
    """Validation must render over the SAME background training uses — the
    frame's inpainted-torso composite. Regression for the round-3 finding
    where plain-bg validation charged the torso region against the head
    model (val PSNR saturated near 18 dB at any head quality)."""
    import jax
    import jax.numpy as jnp

    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig

    H = 16
    d = synthetic(num_frames=8, H=H, W=H)
    # torso covers the lower half with full alpha; gt == torso-over-bg
    for s in d["train_samples"] + d["val_samples"]:
        t = np.zeros((H, H, 4), np.float32)
        t[H // 2:, :, :3] = (0.8, 0.2, 0.1)
        t[H // 2:, :, 3] = 1.0
        s["torso_img"] = t
        bg = np.asarray(d["bg_img"], np.float32)
        bg = bg / 255.0 if bg.dtype != np.float32 or bg.max() > 1.5 else bg
        gt = bg.copy()
        gt[H // 2:] = (0.8, 0.2, 0.1)
        s["gt_img"] = gt.astype(np.float32)
    ds = RADNeRFDataset(d, split="train", smo_win_size=3, with_sr=False)
    cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=16, hidden_dim_ambient=16, hidden_dim_color=16,
        geo_feat_dim=8)
    task = HeadNeRFTask(ds, cfg, HeadTaskConfig(n_rays=64, max_steps=8,
                                                num_coarse=8, num_samples=4),
                        TaskHParams(), seed=0)
    state = task.create_state()
    # empty occupancy: the head contributes NOTHING, so the render equals
    # whatever background validate passes -> PSNR is high iff it is the
    # torso composite (== gt), low if it is the plain bg
    task.occupancy = jnp.zeros((16, 16, 16), bool)
    val = task.validate(state, max_frames=2)
    assert val["val_psnr"] > 35.0, val


def test_torso_validate_uses_heldout_split(monkeypatch):
    """When run.py attaches a val split, torso validate must render THOSE
    frames (round-2 verdict: head/SR validate held-out, torso did not)."""
    import jax

    from genefaceplusplus_tpu.config import Config
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
    from genefaceplusplus_tpu.training.tasks.torso_task import TorsoNeRFTask

    data = synthetic(num_frames=12, H=16, W=16)
    ds = RADNeRFDataset(data, split="train", smo_win_size=3, with_sr=False)
    cfg = Config({
        "torso_individual_embedding_dim": 4, "individual_embedding_num": 16,
        "torso_head_aware": True, "lr": 1e-3, "max_steps": 8,
        "lambda_weights_entropy": 1e-4, "head_model_dir": "",
    })
    mcfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32,
        geo_feat_dim=16,
    )
    task = TorsoNeRFTask(ds, mcfg, cfg)
    task.opts = task.opts.__class__(max_steps=8, num_coarse=8, num_samples=4)
    task.val_dataset = RADNeRFDataset(data, split="val", smo_win_size=3,
                                      with_sr=False)
    state = task.create_state()
    seen = []
    orig = TorsoNeRFTask.sample_frame_batch

    def spy(self, idx, ds=None):
        seen.append(ds)
        return orig(self, idx, ds)

    monkeypatch.setattr(TorsoNeRFTask, "sample_frame_batch", spy)
    metrics = task.validate(state, max_frames=1)
    assert metrics and np.isfinite(metrics["val_psnr"])
    assert seen and all(d is task.val_dataset for d in seen)


def test_head_validate_chunked_render_matches_full():
    """Tiledgrid full-frame gather graphs are XLA-hostile at scale (422 s
    compile at 128², TPU-worker crash at 256² — docs/QUALITY_PARITY.md), so
    validate() renders tiledgrid frames in training-batch-sized ray chunks.
    Rays are independent, so the chunked render must match the
    single-dispatch one exactly."""
    import jax.numpy as jnp

    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.head_task import (
        HeadNeRFTask,
        HeadTaskConfig,
    )

    ds = RADNeRFDataset(synthetic(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    cfg = RADNeRFConfig(
        grid_type="tiledgrid", grid_size=16, individual_embedding_num=16,
        smo_win_size=3, hidden_dim_sigma=16, hidden_dim_ambient=16,
        hidden_dim_color=16, geo_feat_dim=8)
    task = HeadNeRFTask(ds, cfg, HeadTaskConfig(n_rays=64, max_steps=8,
                                                num_coarse=8, num_samples=4),
                        TaskHParams(), seed=0)
    state = task.create_state()
    task.occupancy = jnp.ones((16, 16, 16), bool)

    # default for tiledgrid is chunked (16384) but the 256-ray frame fits in
    # one chunk; force 4 chunks to exercise the split + concat path
    task.val_ray_chunk = 64
    v_chunked = task.validate(state, max_frames=2)
    task.val_ray_chunk = 0
    v_full = task.validate(state, max_frames=2)
    assert np.isfinite(v_chunked["val_psnr"])
    assert abs(v_chunked["val_psnr"] - v_full["val_psnr"]) < 1e-4, (
        v_chunked, v_full)
