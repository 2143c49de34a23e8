"""End-to-end inference test: synthetic dataset + random weights -> mp4."""

import os

import numpy as np
import pytest

from genefaceplusplus_tpu.config import save_config
from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer, default_inp


@pytest.fixture(scope="module")
def infer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpts")
    a2m_dir = str(tmp / "a2m")
    head_dir = str(tmp / "head")
    save_config({"use_pitch": True, "audio_in_dim": 64, "motion_type": "exp",
                 "a2m_hidden_channels": 64, "a2m_enc_layers": 2, "a2m_dec_layers": 2,
                 "a2m_flow_hidden": 16, "a2m_flow_blocks": 2}, a2m_dir)
    save_config(
        {
            "with_sr": False,
            "grid_size": 16,
            "smo_win_size": 3,
            "cond_win_size": 1,
            "hidden_dim_sigma": 32,
            "hidden_dim_ambient": 32,
            "hidden_dim_color": 32,
            "geo_feat_dim": 16,
            "individual_embedding_num": 32,
            "add_eye_blink_cond": True,
        },
        head_dir,
    )
    ds = RADNeRFDataset(synthetic(num_frames=24, H=32, W=32), split="train",
                        smo_win_size=3, with_sr=False)
    return GeneFaceInfer(audio2secc_dir=a2m_dir, head_model_dir=head_dir, dataset=ds)


def _features(tmp_path, T50=32):
    rng = np.random.RandomState(0)
    feats = {
        "hubert": rng.randn(T50, 64).astype(np.float32),
        "f0": (np.abs(rng.randn(T50)) * 100 + 80).astype(np.float32),
    }
    path = str(tmp_path / "feats.npy")
    np.save(path, feats, allow_pickle=True)
    return path


def test_wav_to_video_end_to_end(infer, tmp_path):
    out_name = str(tmp_path / "out.mp4")
    inp = default_inp(
        drv_aud_features=_features(tmp_path),
        out_name=out_name,
        blink_mode="period",
        temperature=0.5,
        lle_percent=0.2,
        drv_pose="nearest",
    )
    out = infer.infer_once(inp)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 0


def test_debug_panel_has_secc_and_landmarks(infer, tmp_path):
    """--debug triples the frame width: render | SECC | lm68 panel
    (reference debug layout, genefacepp_infer.py:313-331, 489-495)."""
    inp = default_inp(
        drv_aud_features=_features(tmp_path, T50=16),
        out_name=str(tmp_path / "dbg.mp4"),
        debug=True,
    )
    batch = infer.prepare_batch_from_inp(inp)
    batch = infer.forward_audio2secc(batch, inp)
    # the SECC panel itself: NCC-splat fallback (no licensed BFM here),
    # non-black exactly where geometry projects
    panel = infer._secc_debug_frame(batch, 0, 32)
    assert panel.shape == (32, 32, 3) and panel.dtype == np.uint8
    assert (panel > 0).any()
    out = infer.forward_secc2video(batch, inp)
    import cv2

    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape[1] == 3 * frame.shape[0]


def test_audio2secc_stage_shapes(infer, tmp_path):
    inp = default_inp(drv_aud_features=_features(tmp_path), blink_mode="none", lle_percent=0.0)
    batch = infer.prepare_batch_from_inp(inp)
    assert batch["T"] == 16
    batch = infer.forward_audio2secc(batch, inp)
    assert batch["cond"].shape == (16, 1, 204)
    assert batch["lm68"].shape == (16, 68, 2)
    assert np.isfinite(batch["cond"]).all()
    # conditions must vary over time (driven by audio)
    assert batch["cond"].std(axis=0).max() > 0


def test_pose_schedules(infer, tmp_path):
    for drv_pose, check in [
        ("static", lambda idx: (idx == 0).all()),
        ("3", lambda idx: (idx == 3).all()),
        ("nearest", lambda idx: idx.max() > 0),
        ("2-8", lambda idx: (idx >= 2).all() and (idx <= 7).all()),
    ]:
        inp = default_inp(drv_aud_features=_features(tmp_path), drv_pose=drv_pose)
        batch = infer.prepare_batch_from_inp(inp)
        assert check(batch["pose_idx"]), drv_pose


def test_postnet_branch_refines_landmarks(infer, tmp_path):
    """With a postnet checkpoint dir, the pitch-conditioned CNN refiner runs
    before the LLE blend (reference genefacepp_infer.py:349-369; previously
    the ctor accepted postnet_dir but never used it)."""
    import jax
    import jax.numpy as jnp

    from genefaceplusplus_tpu.models.postnet.models import PitchContourCNNPostNet
    from genefaceplusplus_tpu.utils.ckpt import save_checkpoint

    pn_dir = str(tmp_path / "postnet")
    save_config({"postnet_out_dim": 204, "postnet_hidden": 32, "postnet_layers": 2}, pn_dir)
    pn = PitchContourCNNPostNet(out_dim=204, hidden=32, n_layers=2)
    params = pn.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 204)), jnp.zeros((1, 16, 1)))
    # non-zero final conv so the refiner is NOT the identity
    params = jax.tree.map(
        lambda p: p + 0.01 * np.float32(1.0) if p.ndim >= 1 else p, params
    )
    save_checkpoint(pn_dir, 1, {"state_dict": params})

    ds = infer.dataset
    infer_pn = GeneFaceInfer(postnet_dir=pn_dir, dataset=ds)
    # share the a2m weights so only the postnet differs
    infer_pn.a2m_model = infer.a2m_model
    infer_pn.a2m_params = infer.a2m_params
    infer_pn.a2m_cfg = infer.a2m_cfg

    feats = _features(tmp_path)
    inp = default_inp(drv_aud_features=feats, blink_mode="none",
                      lle_percent=0.0, temperature=0.0)
    import copy

    b1 = infer.forward_audio2secc(infer.prepare_batch_from_inp(copy.deepcopy(inp)), inp)
    infer_pn.rng = jax.random.PRNGKey(42)
    infer.rng = jax.random.PRNGKey(42)
    b2 = infer_pn.forward_audio2secc(infer_pn.prepare_batch_from_inp(copy.deepcopy(inp)), inp)
    assert infer_pn.postnet_model is not None
    assert np.isfinite(b2["cond"]).all()
    # the refiner changed the predicted conditions
    assert not np.allclose(b1["cond"], b2["cond"])


def test_checkpoint_params_actually_load(tmp_path):
    """Regression: trained checkpoints must flow into inference (a container
    mismatch once silently kept random init weights)."""
    import jax
    import jax.numpy as jnp

    from genefaceplusplus_tpu.data.dataset import synthetic as synth_ds
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig
    from genefaceplusplus_tpu.training.trainer import Trainer

    ds = RADNeRFDataset(synth_ds(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    mcfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32, geo_feat_dim=16,
    )
    work = str(tmp_path / "head_work")
    save_config({"with_sr": False, "grid_size": 16, "smo_win_size": 3,
                 "hidden_dim_sigma": 32, "hidden_dim_ambient": 32,
                 "hidden_dim_color": 32, "geo_feat_dim": 16,
                 "fourier_pos_features": 16, "fourier_amb_features": 8,
                 "individual_embedding_num": 16}, work)
    task = HeadNeRFTask(ds, mcfg, HeadTaskConfig(n_rays=64, num_coarse=8, num_samples=4, lr=1e-2),
                        TaskHParams())
    trainer = Trainer(task, work, max_updates=3, val_check_interval=3,
                      tb_log_interval=10, update_extra_interval=100,
                      num_sanity_val_steps=0)
    state = trainer.fit(resume=False)

    # a fresh pipeline must pick up the TRAINED params, not re-init
    import genefaceplusplus_tpu.models.radnerf as radnerf_mod

    infer = GeneFaceInfer(head_model_dir=work, dataset=ds)
    # fourier cfg fields aren't in RADNeRFConfig.from_hparams defaults for
    # small dims unless present in config.yaml — assert at least the trained
    # sigma-net kernel made it through
    trained = np.asarray(state.params["params"]["sigma_net"]["Dense_0"]["kernel"])
    loaded = np.asarray(infer.head_params["params"]["sigma_net"]["Dense_0"]["kernel"])
    if trained.shape == loaded.shape:
        np.testing.assert_allclose(loaded, trained, atol=1e-6)
    else:
        raise AssertionError(f"config mismatch: {trained.shape} vs {loaded.shape}")


def test_resolve_crop_rejects_garbage_strings():
    """Unknown crop-knob strings must fail loudly, not become character
    tuples used as crop dims (review finding)."""
    from genefaceplusplus_tpu.inference.pipeline import resolve_crop

    auto = (1, 2, 3, 4)
    assert resolve_crop({}, "head_crop", auto) == auto
    assert resolve_crop({"head_crop": "Auto"}, "head_crop", auto) == auto
    assert resolve_crop({"head_crop": "OFF "}, "head_crop", auto) is None
    assert resolve_crop({"head_crop": None}, "head_crop", auto) is None
    assert resolve_crop({"head_crop": [5, 6]}, "head_crop", auto) == (5, 6)
    assert resolve_crop({"head_crop": [[1, 2, 3, 4], [5, 6, 7, 8]]},
                        "head_crop", auto) == ((1, 2, 3, 4), (5, 6, 7, 8))
    with pytest.raises(ValueError, match="head_crop"):
        resolve_crop({"head_crop": "192,192"}, "head_crop", auto)


def test_pipeline_crops_lossless_end_to_end(tmp_path):
    """Pipeline-level equality: the production chunk fn with ALL static
    crops active (head/torso/SR, resolved by the pipeline itself) renders
    the same frames as crops-off, on a geometry where every crop engages."""
    import jax
    import jax.numpy as jnp

    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer
    from genefaceplusplus_tpu.models.full_renderer import (
        auto_sr_crop, auto_torso_crop)
    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.utils.audio_features import get_audio_features_batch
    from genefaceplusplus_tpu.utils.rays import get_bg_coords, pixel_rays

    a2m_dir, head_dir, torso_dir = (str(tmp_path / d) for d in ("a", "h", "t"))
    save_config({"use_pitch": True, "audio_in_dim": 64, "motion_type": "exp",
                 "a2m_hidden_channels": 64, "a2m_enc_layers": 2, "a2m_dec_layers": 2,
                 "a2m_flow_hidden": 16, "a2m_flow_blocks": 2}, a2m_dir)
    common = {"with_sr": True, "grid_size": 16, "smo_win_size": 3, "cond_win_size": 1,
              "hidden_dim_sigma": 16, "hidden_dim_ambient": 16, "hidden_dim_color": 16,
              "geo_feat_dim": 8, "individual_embedding_num": 4}
    save_config(common, head_dir)
    save_config({**common, "torso_individual_embedding_num": 4,
                 "head_model_dir": head_dir}, torso_dir)
    H = 64  # raw res (synthetic 128 halved by with_sr)
    ds = RADNeRFDataset(synthetic(num_frames=8, H=2 * H, W=2 * H), split="train",
                        smo_win_size=3, with_sr=True)
    infer = GeneFaceInfer(audio2secc_dir=a2m_dir, head_model_dir=head_dir,
                          torso_model_dir=torso_dir, dataset=ds)

    # compact occupancies so every crop engages at 64^2
    infer.occupancy = jnp.zeros((16, 16, 16), bool).at[7:9, 7:9, 7:9].set(True)
    infer.torso_occupancy_2d = jnp.zeros((16, 16)).at[11:15, 6:10].set(1.0)
    infer.head_crop = infer._auto_head_crop()
    infer.torso_crop = auto_torso_crop(infer.torso_occupancy_2d, H, H,
                                       pad_px=2, multiple=4)
    sr_crop = auto_sr_crop(infer._head_bbox, infer.torso_crop, H, H,
                           margin=8, multiple=8, max_area_frac=1.1)
    assert sr_crop is not None
    sr_bg = jax.jit(lambda p, b: jnp.clip(infer.sr_model.apply(p, b), 0, 1))(
        infer.sr_params, jnp.asarray(ds.bg_img, jnp.float32).reshape(1, H, H, 3))[0]
    infer.sr_crop, infer.sr_bg = sr_crop, sr_bg

    opts = RenderOptions(num_coarse=48, num_samples=8, T_thresh=1e-2,
                         entry_mode="probe")
    C = 2
    bg_coords = get_bg_coords(H, H)[0]
    bg_color = jnp.asarray(ds.bg_img.reshape(-1, 3))
    conds = jnp.asarray(np.random.RandomState(0).randn(C, 1, 204), jnp.float32)
    cond_windows = get_audio_features_batch(conds, jnp.arange(C), 3)
    poses = jnp.asarray(np.stack([ds.frame_pose(i) for i in range(C)]))
    rays_o, rays_d, _ = pixel_rays(poses, tuple(ds.intrinsics), H, H)
    lm68s = jnp.asarray(np.random.RandomState(1).rand(C, 1, 68, 2), jnp.float32)
    eyes = jnp.zeros((C, 1, 1))
    args = (infer.head_params, infer.torso_params, infer.sr_params,
            rays_o, rays_d, cond_windows, eyes, infer.occupancy,
            bg_color, bg_coords, lm68s)

    on = infer._build_chunk_fn(opts, H, H, C, head_crop=infer.head_crop,
                               torso_crop=infer.torso_crop, sr_crop=infer.sr_crop)
    off = infer._build_chunk_fn(opts, H, H, C)
    imgs_on, fits_on = on(*args)
    imgs_off, _ = off(*args)
    a, b = np.asarray(imgs_on), np.asarray(imgs_off)
    assert a.shape == (C, 2 * H, 2 * H, 3)
    # the auto crop is sized from the dataset poses, so they all fit
    assert np.all(np.asarray(fits_on))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_pipeline_auto_compact_lossless_end_to_end(tmp_path):
    """compact_frac='auto' measures a covering budget for the drive poses,
    so the compacted production chunk fn must equal the exact render; the
    measured budget must actually skip slots on the compact occupancy."""
    import jax.numpy as jnp

    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer
    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.utils.audio_features import get_audio_features_batch
    from genefaceplusplus_tpu.utils.rays import get_bg_coords, pixel_rays

    head_dir = str(tmp_path / "h")
    save_config({"with_sr": False, "grid_size": 16, "smo_win_size": 3,
                 "cond_win_size": 1, "hidden_dim_sigma": 16,
                 "hidden_dim_ambient": 16, "hidden_dim_color": 16,
                 "geo_feat_dim": 8, "individual_embedding_num": 4}, head_dir)
    H = 32
    ds = RADNeRFDataset(synthetic(num_frames=6, H=H, W=H), split="train",
                        smo_win_size=3, with_sr=False)
    infer = GeneFaceInfer(head_model_dir=head_dir, dataset=ds)
    infer.occupancy = jnp.zeros((16, 16, 16), bool).at[5:11, 5:11, 5:11].set(True)

    opts = RenderOptions(num_coarse=48, num_samples=8, T_thresh=1e-2,
                         entry_mode="probe")
    poses = np.stack([ds.frame_pose(i) for i in range(4)])
    frac = infer._auto_compact_frac(poses, opts, (H, H), head_crop=None)
    assert 0.0 < frac < 0.9, frac  # engaged AND actually skipping slots
    # quantised to the renderer's 512-slot budget granularity, so equal
    # budgets across calls produce identical RenderOptions (jit-cache hit
    # instead of a per-request recompile in a long-lived server)
    M = frac * (H * H * opts.num_samples)
    assert abs(M - round(M)) < 1e-4 and round(M) % 512 == 0, M
    assert infer._auto_compact_frac(poses[:3], opts, (H, H), head_crop=None) in (frac, 0.0)

    import dataclasses

    C = 2
    bg_coords = get_bg_coords(H, H)[0]
    bg_color = jnp.asarray(ds.bg_img.reshape(-1, 3))
    conds = jnp.asarray(np.random.RandomState(0).randn(C, 1, 204), jnp.float32)
    cond_windows = get_audio_features_batch(conds, jnp.arange(C), 3)
    rays_o, rays_d, _ = pixel_rays(jnp.asarray(poses[:C]), tuple(ds.intrinsics), H, H)
    lm68s = jnp.asarray(np.random.RandomState(1).rand(C, 1, 68, 2), jnp.float32)
    args = (infer.head_params, infer.torso_params, infer.sr_params,
            rays_o, rays_d, cond_windows, jnp.zeros((C, 1, 1)),
            infer.occupancy, bg_color, bg_coords, lm68s)
    exact = infer._build_chunk_fn(opts, H, H, C)
    compact = infer._build_chunk_fn(
        dataclasses.replace(opts, compact_frac=frac), H, H, C)
    a, _ = exact(*args)
    b, _ = compact(*args)
    # atol 1e-4: the compaction is algebraically lossless but the two
    # graphs reassociate float32 reductions differently, and the persistent
    # compile cache may have been AOT-compiled on a different x86 microarch
    # (cpu_aot_loader feature-mismatch warning) — observed up to ~4e-5 on
    # <0.1% of pixels; 1e-4 is still 40x below one 8-bit pixel step
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
