"""Multi-identity fleet launcher: stage sequencing, skip-done, head->torso."""

import os

import numpy as np


def test_fleet_trains_head_then_torso_and_skips_done(tmp_path, capsys):
    from genefaceplusplus_tpu.data.dataset import synthetic
    from genefaceplusplus_tpu.training.fleet import train_identity

    # binarized data at the expected layout
    vid = "TestId"
    bin_dir = tmp_path / "data" / "binary" / "videos" / vid
    os.makedirs(bin_dir)
    np.save(str(bin_dir / "trainval_dataset.npy"),
            synthetic(num_frames=12, H=16, W=16), allow_pickle=True)

    # tiny configs
    head_cfg = tmp_path / "head.yaml"
    head_cfg.write_text(
        "task_cls: head\n"
        "with_sr: false\n"
        "grid_size: 16\n"
        "smo_win_size: 3\n"
        "hidden_dim_sigma: 32\nhidden_dim_ambient: 32\nhidden_dim_color: 32\n"
        "geo_feat_dim: 16\nfourier_pos_features: 16\nfourier_amb_features: 8\n"
        "individual_embedding_num: 16\n"
        "n_rays: 64\nmax_steps: 8\nnum_coarse: 8\nnum_samples: 4\n"
        "finetune_lips: false\n"
        "val_check_interval: 2\nupdate_extra_interval: 2\n"
        f"binary_data_dir: {tmp_path}/data/binary/videos\n"
    )
    torso_cfg = tmp_path / "torso.yaml"
    torso_cfg.write_text(
        "task_cls: torso\n"
        "with_sr: false\n"
        "grid_size: 16\n"
        "smo_win_size: 3\n"
        "hidden_dim_sigma: 32\nhidden_dim_ambient: 32\nhidden_dim_color: 32\n"
        "geo_feat_dim: 16\nfourier_pos_features: 16\nfourier_amb_features: 8\n"
        "individual_embedding_num: 16\n"
        "torso_individual_embedding_dim: 4\n"
        "max_steps: 8\n"
        "val_check_interval: 2\nupdate_extra_interval: 2\n"
        f"binary_data_dir: {tmp_path}/data/binary/videos\n"
    )

    out = train_identity(
        vid, str(head_cfg), str(torso_cfg),
        data_dir=str(tmp_path / "data"),
        ckpt_root=str(tmp_path / "ckpts"),
        steps=["head", "torso"],
        max_updates={"head": 2, "torso": 2},
    )
    from genefaceplusplus_tpu.utils.ckpt import get_last_checkpoint

    for stage in ("head", "torso"):
        ckpt, path = get_last_checkpoint(out[stage])
        assert ckpt is not None, stage
        assert int(ckpt["global_step"]) == 2
    # torso recorded its head dir (inference resolves it from there)
    from genefaceplusplus_tpu.config import set_hparams

    tcfg = set_hparams(work_dir=out["torso"])
    assert tcfg.get("head_model_dir") == out["head"]

    # second run: both stages skip
    capsys.readouterr()
    train_identity(
        vid, str(head_cfg), str(torso_cfg),
        data_dir=str(tmp_path / "data"),
        ckpt_root=str(tmp_path / "ckpts"),
        steps=["head", "torso"],
        max_updates={"head": 2, "torso": 2},
    )
    text = capsys.readouterr().out
    assert "head: checkpoint exists, skipping" in text
    assert "torso: checkpoint exists, skipping" in text
