"""Smoke tests for the torso, SR, and discriminator training components."""

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.config import Config
from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
from genefaceplusplus_tpu.data.eg3d_convention import eg3d_camera_from_euler_trans
from genefaceplusplus_tpu.models.dual_discriminator import DualDiscriminator, feature_matching_loss
from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig


def _tiny_model_cfg():
    return RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32, geo_feat_dim=16,
    )


def test_torso_task_step():
    ds = RADNeRFDataset(synthetic(num_frames=12, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    cfg = Config({
        "torso_individual_embedding_dim": 4, "individual_embedding_num": 16,
        "torso_head_aware": True, "lr": 1e-3, "max_steps": 8,
        "lambda_weights_entropy": 1e-4, "head_model_dir": "",
    })
    from genefaceplusplus_tpu.training.tasks.torso_task import TorsoNeRFTask

    task = TorsoNeRFTask(ds, _tiny_model_cfg(), cfg)
    task.opts = task.opts.__class__(max_steps=8, num_coarse=8, num_samples=4)
    task._train_step = jax.jit(task._make_step())
    state = task.create_state()
    state_head_snapshot = jax.tree.map(np.asarray, task.head_params)
    batch = task.sample_train_batch()
    state2, metrics = task.train_step(state, batch)
    assert int(state2.global_step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    # head params untouched (frozen: not part of the optimised pytree, and
    # the step must not have replaced them)
    head_before = jax.tree.leaves(state_head_snapshot)
    head_after = jax.tree.leaves(task.head_params)
    assert all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(head_before, head_after)
    )
    t_before = jax.tree.leaves(state.torso_params)
    t_after = jax.tree.leaves(state2.torso_params)
    changed = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(t_before, t_after))
    assert changed
    # torso grid refresh runs
    task.update_extra_state(state2)
    assert np.isfinite(task.mean_density_torso)


def test_sr_task_step_with_staged_losses():
    ds = RADNeRFDataset(synthetic(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.sr_task import SRHeadNeRFTask, SRTaskConfig

    tcfg = SRTaskConfig(n_rays=16 * 16, num_coarse=8, num_samples=4,
                        sr_start_iters=0, lpips_start_iters=1)
    task = SRHeadNeRFTask(ds, _tiny_model_cfg(), tcfg, TaskHParams())
    state = task.create_state()
    batch = task.sample_train_batch()
    # step 0: sr on, lpips off
    state, m0 = task.train_step(state, batch)
    assert "sr_mse_loss" in m0 and "lpips_loss" not in m0
    # step 1: lpips kicks in (incl. the SR lip-crop term, radnerf_sr.py:231-233)
    state, m1 = task.train_step(state, batch)
    assert "lpips_loss" in m1 and "sr_lpips_loss" in m1
    assert "sr_lip_lpips_loss" in m1
    assert np.isfinite(float(m1["sr_lip_lpips_loss"]))
    assert np.isfinite(float(m1["total_loss"]))


def test_sr_task_with_dual_fm_loss():
    """lambda_dual_fm > 0 wires the frozen-disc feature-matching branch
    (reference radnerf_sr.py:235-244, gated on lpips_start_iters)."""
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.sr_task import SRHeadNeRFTask, SRTaskConfig

    ds = RADNeRFDataset(synthetic(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    tcfg = SRTaskConfig(n_rays=16 * 16, num_coarse=8, num_samples=4,
                        sr_start_iters=0, lpips_start_iters=0,
                        lambda_dual_fm=0.1)
    task = SRHeadNeRFTask(ds, _tiny_model_cfg(), tcfg, TaskHParams())
    state = task.create_state()
    disc_before = jax.tree.map(np.asarray, task.disc_params)
    batch = task.sample_train_batch()
    # batch is just a frame index; the camera label lives in the
    # device-resident frame store and is gathered inside the jitted step
    assert "frame_idx" in batch
    assert task._device_frames()["camera"].shape == (len(ds), 25)
    state, m = task.train_step(state, batch)
    assert "dual_feature_matching_loss" in m
    assert np.isfinite(float(m["dual_feature_matching_loss"]))
    assert np.isfinite(float(m["total_loss"]))
    # the discriminator stays frozen
    for a, b in zip(jax.tree.leaves(disc_before), jax.tree.leaves(task.disc_params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sr_task_under_trainer_refreshes_grid(tmp_path):
    """Trainer.fit on the SR task must survive update_extra_state at step 0
    (regression: the _Shim passed to HeadNeRFTask.update_extra_state lacked
    global_step and crashed every SR run)."""
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.sr_task import SRHeadNeRFTask, SRTaskConfig
    from genefaceplusplus_tpu.training.trainer import Trainer

    ds = RADNeRFDataset(synthetic(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    tcfg = SRTaskConfig(n_rays=16 * 16, num_coarse=8, num_samples=4,
                        sr_start_iters=0, lpips_start_iters=10**9,
                        update_extra_interval=1)
    task = SRHeadNeRFTask(ds, _tiny_model_cfg(), tcfg, TaskHParams())
    trainer = Trainer(task, str(tmp_path / "sr"), max_updates=3,
                      val_check_interval=3, update_extra_interval=1,
                      num_sanity_val_steps=0)
    state = trainer.fit(resume=False)
    assert int(state.global_step) == 3
    assert np.isfinite(task.mean_density)  # grid refresh actually ran


def test_torso_task_under_trainer(tmp_path):
    from genefaceplusplus_tpu.training.tasks.torso_task import TorsoNeRFTask
    from genefaceplusplus_tpu.training.trainer import Trainer

    ds = RADNeRFDataset(synthetic(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    cfg = Config({
        "torso_individual_embedding_dim": 4, "individual_embedding_num": 16,
        "torso_head_aware": True, "lr": 1e-3, "max_steps": 8,
        "lambda_weights_entropy": 1e-4, "head_model_dir": "",
    })
    task = TorsoNeRFTask(ds, _tiny_model_cfg(), cfg)
    task.opts = task.opts.__class__(max_steps=8, num_coarse=8, num_samples=4)
    task._train_step = jax.jit(task._make_step())
    trainer = Trainer(task, str(tmp_path / "torso"), max_updates=2,
                      val_check_interval=2, update_extra_interval=1,
                      num_sanity_val_steps=0)
    state = trainer.fit(resume=False)
    assert int(state.global_step) == 2
    # torso validation reports a real PSNR now
    val = task.validate(state, max_frames=1)
    assert "val_psnr" in val and np.isfinite(val["val_psnr"])


def test_dual_discriminator_and_fm_loss():
    disc = DualDiscriminator(base_channels=8, n_down=3)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    raw = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    cam = jax.random.normal(jax.random.PRNGKey(2), (1, 25))
    params = disc.init(jax.random.PRNGKey(3), img, raw, cam)
    logits, feats = disc.apply(params, img, raw, cam)
    assert logits.shape == (1, 1)
    assert len(feats) == 3
    fm = feature_matching_loss(feats, [jnp.zeros_like(f) for f in feats])
    assert float(fm) > 0


def test_eg3d_camera_convention():
    euler = np.zeros((2, 3), np.float32)
    trans = np.zeros((2, 3), np.float32)
    cam = eg3d_camera_from_euler_trans(euler, trans)
    assert cam.shape == (2, 25)
    pose = cam[0, :16].reshape(4, 4)
    np.testing.assert_allclose(pose[3], [0, 0, 0, 1], atol=1e-6)
    K = cam[0, 16:].reshape(3, 3)
    np.testing.assert_allclose(K[0, 2], 0.5)
    np.testing.assert_allclose(K[2, 2], 1.0)
    # camera sits at ~2.7*0.27-ish radius in front of the face
    assert 0.5 < np.linalg.norm(pose[:3, 3]) < 5.0

def test_torso_load_head_from_sr_checkpoint(tmp_path):
    """head_model_dir may hold an SR-stage ckpt whose params nest as
    {"head": ..., "sr": ...} (sr_task.py create_state); the torso stage must
    restore the head subtree + occupancy, like the reference torso task
    loading the RADNeRFwithSR head ckpt (radnerf_torso_sr.py:65-73)."""
    from genefaceplusplus_tpu.training.tasks.torso_task import TorsoNeRFTask
    from genefaceplusplus_tpu.utils.ckpt import save_checkpoint

    ds = RADNeRFDataset(synthetic(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    mcfg = _tiny_model_cfg()

    # fabricate an SR-task-shaped checkpoint with recognisable head params
    from genefaceplusplus_tpu.models.radnerf import RADNeRF

    model = RADNeRF(mcfg)
    cond = jnp.zeros((mcfg.smo_win_size, mcfg.cond_win_size, mcfg.cond_in_dim))
    head_params = model.init(jax.random.PRNGKey(42), jnp.zeros((8, 3)),
                             jnp.ones((8, 3)), cond)
    head_params = jax.tree.map(lambda x: x + 0.5, head_params)
    occ = np.zeros((16, 16, 16), bool)
    occ[4:12, 4:12, 4:12] = True
    save_checkpoint(
        str(tmp_path / "head_sr"), 7,
        {"state_dict": {"params": {"head": head_params, "sr": {"w": jnp.ones(3)}}},
         "extra_state": {"occupancy": occ, "density_grid": np.ones((16,) * 3)}},
    )

    cfg = Config({
        "torso_individual_embedding_dim": 4, "individual_embedding_num": 16,
        "lr": 1e-3, "max_steps": 8,
        "head_model_dir": str(tmp_path / "head_sr"),
    })
    task = TorsoNeRFTask(ds, mcfg, cfg)
    got = jax.tree.leaves(task.head_params)
    want = jax.tree.leaves(head_params)
    assert all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(got, want))
    assert np.array_equal(np.asarray(task.occupancy), occ)
