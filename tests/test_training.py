import os

import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.config import Config
from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig
from genefaceplusplus_tpu.training.trainer import Trainer
from genefaceplusplus_tpu.training import grid_updater


def tiny_head_task(n_rays=256):
    ds = RADNeRFDataset(synthetic(num_frames=12, H=24, W=24), split="train",
                        smo_win_size=3, with_sr=False)
    mcfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32, geo_feat_dim=16,
    )
    tcfg = HeadTaskConfig(n_rays=n_rays, num_coarse=16, num_samples=8, lr=5e-3)
    return HeadNeRFTask(ds, mcfg, tcfg, TaskHParams(ambient_ramp_total=100))


class TestGridUpdater:
    def test_update_density_grid(self):
        import jax

        H = 16

        def density_fn(pts):
            # dense blob at origin
            return jnp.where((pts ** 2).sum(-1) < 0.25, 50.0, 0.0)

        grid = jnp.zeros((H, H, H))
        grid, occ, mean_d = grid_updater.update_density_grid(
            density_fn, grid, jax.random.PRNGKey(0), density_thresh=10.0, chunk=H ** 3
        )
        occ = np.asarray(occ)
        assert occ[H // 2, H // 2, H // 2]
        assert not occ[0, 0, 0]
        assert 0 < occ.mean() < 0.5

    def test_mark_untrained(self):
        H = 8
        # camera at z=-2 looking +z: only central cells in front are seen
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -2.0
        grid = grid_updater.mark_untrained_grid(
            jnp.zeros((H, H, H)), pose[None], (32.0, 32.0, 4.0, 4.0), 1.0
        )
        g = np.asarray(grid)
        assert (g == -1).any() or (g == 0).all()  # culling applied (or everything visible)

    def test_update_torso_grid(self):
        import jax

        def alpha_fn(pts):
            return jnp.where(pts[:, 0] > 0, 0.9, 0.0)

        grid, mean_t = grid_updater.update_torso_grid(alpha_fn, jnp.zeros((16, 16)), jax.random.PRNGKey(0))
        g = np.asarray(grid)
        assert g[12, 8] > 0.5
        assert float(mean_t) > 0


def test_head_training_loop_reduces_loss(tmp_path):
    task = tiny_head_task()
    trainer = Trainer(
        task, str(tmp_path / "work"), config=Config({"demo": True}),
        max_updates=30, val_check_interval=30, tb_log_interval=10,
        update_extra_interval=10,
    )
    state = trainer.fit(resume=False)
    assert int(state.global_step) == 30
    # checkpoint written
    ckpts = [f for f in os.listdir(tmp_path / "work") if f.endswith(".ckpt")]
    assert ckpts, os.listdir(tmp_path / "work")
    # metrics logged
    lines = open(tmp_path / "work" / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) >= 3
    import json

    first, last = json.loads(lines[0]), json.loads(lines[-2] if "val_psnr" in lines[-1] else lines[-1])
    assert np.isfinite(last.get("total_loss", np.inf))


def test_training_resume(tmp_path):
    task = tiny_head_task()
    work = str(tmp_path / "work")
    t1 = Trainer(task, work, config=Config({}), max_updates=10,
                 val_check_interval=10, tb_log_interval=5, update_extra_interval=100)
    t1.fit(resume=False)
    # resume continues from step 10
    task2 = tiny_head_task()
    t2 = Trainer(task2, work, config=Config({}), max_updates=15,
                 val_check_interval=15, tb_log_interval=5, update_extra_interval=100)
    state = t2.fit(resume=True)
    assert int(state.global_step) == 15


def test_lip_finetune_stage(tmp_path):
    """After finetune_lips_start_iter, alternating iterations use the static
    lip window and the perceptual step (reference radnerf.py:123-160)."""
    from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig

    ds = RADNeRFDataset(synthetic(num_frames=8, H=24, W=24), split="train",
                        smo_win_size=3, with_sr=False)
    mcfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32, geo_feat_dim=16,
    )
    tcfg = HeadTaskConfig(n_rays=128, num_coarse=12, num_samples=6,
                          finetune_lips=True, finetune_lips_start_iter=0,
                          lip_window=16, lambda_lpips=0.01)
    task = HeadNeRFTask(ds, mcfg, tcfg, TaskHParams())
    state = task.create_state()

    # step 1 (global_step=1 > 0): flag toggles True -> lip batch
    b1 = task.sample_train_batch(global_step=1)
    assert b1["_is_lip"] is True
    assert b1["inds"].shape[0] == 16 * 16  # lip window ray indices
    state, m1 = task.train_step(state, b1)
    assert "lpips_loss" in m1 and np.isfinite(float(m1["total_loss"]))
    # next iteration flips back to full-image sampling
    b2 = task.sample_train_batch(global_step=2)
    assert b2["_is_lip"] is False
    assert b2["inds"].shape[0] == 128
    state, m2 = task.train_step(state, b2)
    assert "lpips_loss" not in m2
