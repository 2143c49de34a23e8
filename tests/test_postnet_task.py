"""Postnet training task: refiner learns to undo smooth landmark noise."""

import numpy as np

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
from genefaceplusplus_tpu.training.tasks.postnet_task import PostnetTask, PostnetTaskConfig


def test_postnet_task_trains_and_improves():
    ds = RADNeRFDataset(synthetic(num_frames=40, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    cfg = PostnetTaskConfig(out_dim=204, hidden=32, n_layers=2, seq_len=16,
                            batch_size=4, lr=2e-3, noise_scale=0.2)
    task = PostnetTask(ds, cfg, seed=0)
    state = task.create_state()

    v0 = task.validate(state)
    # zero-init residual head: identity at init -> refined == raw
    assert abs(v0["val_l1_refined"] - v0["val_l1_raw"]) < 1e-5

    for _ in range(60):
        batch = task.sample_train_batch()
        state, metrics = task.train_step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))

    v1 = task.validate(state)
    # the refiner must beat the identity baseline on fresh noise
    assert v1["val_l1_refined"] < 0.9 * v1["val_l1_raw"], (v0, v1)


def test_postnet_task_under_trainer(tmp_path):
    from genefaceplusplus_tpu.training.trainer import Trainer

    ds = RADNeRFDataset(synthetic(num_frames=24, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    cfg = PostnetTaskConfig(out_dim=204, hidden=16, n_layers=1, seq_len=8,
                            batch_size=2)
    task = PostnetTask(ds, cfg, seed=0)
    trainer = Trainer(task, str(tmp_path / "pn"), max_updates=3,
                      val_check_interval=3, num_sanity_val_steps=0)
    state = trainer.fit(resume=False)
    assert int(state.global_step) == 3
    import os

    assert any("ckpt" in f for f in os.listdir(tmp_path / "pn"))