"""Whole data pipeline end to end: raw frames + segmaps -> segment step ->
3DMM fit -> binarize -> dataset -> head training -> inference render.

This is the run.sh-equivalent integration path (SURVEY §3.4) driven on a
synthetic identity with precomputed segmaps (mediapipe absent) and the
synthetic BFM basis.
"""

import os

import numpy as np
import pytest


@pytest.fixture()
def processed_dir(tmp_path, monkeypatch):
    import cv2
    import jax.numpy as jnp

    from genefaceplusplus_tpu.data import segmenter as S
    from genefaceplusplus_tpu.data.face3d import Face3DHelper

    helper = Face3DHelper.synthetic(keypoint_mode="lm68")
    monkeypatch.setattr(Face3DHelper, "load",
                        classmethod(lambda cls, *a, **kw: helper))

    d = str(tmp_path / "proc")
    os.makedirs(os.path.join(d, "gt_imgs"))
    os.makedirs(os.path.join(d, "segmaps"))
    rng = np.random.RandomState(0)
    T, H, W = 12, 64, 64

    # driving coefficients -> projected landmarks (what mediapipe would give)
    ids = jnp.zeros((T, 80))
    exps = jnp.asarray(rng.randn(T, 64) * 0.05, jnp.float32)
    eulers = jnp.asarray(rng.randn(T, 3) * 0.02, jnp.float32)
    transs = jnp.asarray(rng.randn(T, 3) * 0.02, jnp.float32)
    lm2d = np.asarray(helper.reconstruct_lm2d(ids, exps, eulers, transs))  # [0,1]
    np.save(os.path.join(d, "lms_2d.npy"), (lm2d * W).astype(np.float32))

    # frames with a person-ish figure + color-coded segmaps
    for t in range(T):
        col = 16 + int(16 * np.sin(t / 3))
        cat = np.zeros((H, W), np.int64)
        cat[10:28, col : col + 20] = 3   # face
        cat[28:34, col + 4 : col + 16] = 2  # neck
        cat[34:, col - 4 : col + 24] = 4  # clothes
        img = np.full((H, W, 3), 80, np.uint8)
        img[..., 2] = np.linspace(0, 255, H, dtype=np.uint8)[:, None]
        img[cat == 3] = (200, 160, 140)
        img[cat == 2] = (180, 140, 120)
        img[cat == 4] = (40, 40, 160)
        cv2.imwrite(os.path.join(d, "gt_imgs", f"{t:08d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        seg_png = S.encode_segmap_image(S.onehot_from_categories(cat))
        cv2.imwrite(os.path.join(d, "segmaps", f"{t:08d}.png"),
                    cv2.cvtColor(seg_png, cv2.COLOR_RGB2BGR))

    # audio features (hubert gated -> store mel/f0 only)
    np.save(os.path.join(d, "aud_mel_f0.npy"),
            {"mel": rng.randn(2 * T, 80).astype(np.float32),
             "f0": (np.abs(rng.randn(2 * T)) * 100 + 100).astype(np.float32)},
            allow_pickle=True)
    np.save(os.path.join(d, "aud_hubert.npy"),
            rng.randn(2 * T, 64).astype(np.float32))
    return d


def test_process_to_train_to_infer(processed_dir, tmp_path):
    from genefaceplusplus_tpu.data.process import step_fit, step_segment
    from genefaceplusplus_tpu.data.binarizer import binarize

    # 1. segmentation-guided prep (crops, KNN bg, inpainted torso, com imgs)
    step_segment(processed_dir)
    assert os.path.exists(os.path.join(processed_dir, "bg.jpg"))
    assert len(os.listdir(os.path.join(processed_dir, "inpaint_torso_imgs"))) == 12

    # 2. 3DMM fit from the (synthetic-basis) landmarks
    step_fit(processed_dir, bfm_dir="unused")
    coeff = np.load(os.path.join(processed_dir, "coeff_fit_mp.npy"),
                    allow_pickle=True).tolist()
    assert coeff["exp"].shape == (12, 64)

    # 3. binarize -> ds_dict with the reference schema
    out_npy = str(tmp_path / "trainval_dataset.npy")
    ds_dict = binarize(processed_dir, out_npy, bfm_dir="unused")
    assert os.path.exists(out_npy)
    for key in ("bg_img", "idexp_lm3d", "train_samples", "val_samples", "hubert", "f0"):
        assert key in ds_dict, key
    s0 = ds_dict["train_samples"][0]
    assert "lms" in s0 and s0["lms"].shape == (68, 2)
    assert os.path.exists(s0["gt_img_fname"])  # com imgs written by step 1
    assert os.path.exists(s0["torso_img_fname"])  # inpainted torso RGBA

    # 4. dataset + short head training on the binarized data
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig
    from genefaceplusplus_tpu.training.trainer import Trainer

    ds = RADNeRFDataset(out_npy, split="train", smo_win_size=3, with_sr=False)
    # torso-composited background must be available (segmentation ran)
    assert ds.frame_bg_torso(0) is not None
    mcfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32,
        geo_feat_dim=16,
    )
    work = str(tmp_path / "head_work")
    from genefaceplusplus_tpu.config import save_config

    save_config({"with_sr": False, "grid_size": 16, "smo_win_size": 3,
                 "hidden_dim_sigma": 32, "hidden_dim_ambient": 32,
                 "hidden_dim_color": 32, "geo_feat_dim": 16,
                 "fourier_pos_features": 16, "fourier_amb_features": 8,
                 "individual_embedding_num": 16}, work)
    task = HeadNeRFTask(ds, mcfg,
                        HeadTaskConfig(n_rays=128, num_coarse=8, num_samples=4,
                                       finetune_lips=False),
                        TaskHParams())
    trainer = Trainer(task, work, max_updates=2, val_check_interval=2,
                      update_extra_interval=1, num_sanity_val_steps=0)
    state = trainer.fit(resume=False)
    assert int(state.global_step) == 2

    # 5. inference from the trained checkpoint dir, driven by the SAME
    # binarized dataset + precomputed audio features
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer, default_inp

    feats = {"hubert": np.asarray(ds_dict["hubert"], np.float32),
             "f0": np.asarray(ds_dict["f0"], np.float32)}
    fpath = str(tmp_path / "feats.npy")
    np.save(fpath, feats, allow_pickle=True)
    a2m_dir = str(tmp_path / "a2m")
    save_config({"use_pitch": True, "audio_in_dim": 64, "a2m_hidden_channels": 32,
                 "a2m_enc_layers": 2, "a2m_dec_layers": 2, "a2m_flow_hidden": 16,
                 "a2m_flow_blocks": 2}, a2m_dir)
    infer = GeneFaceInfer(audio2secc_dir=a2m_dir, head_model_dir=work, dataset=ds)
    out = infer.infer_once(default_inp(
        drv_aud_features=fpath, out_name=str(tmp_path / "out.mp4"),
        lle_percent=0.1, temperature=0.0,
    ))
    assert os.path.exists(out) and os.path.getsize(out) > 0
