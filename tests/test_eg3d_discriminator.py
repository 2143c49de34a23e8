"""Faithful EG3D dual-discriminator tests (VERDICT round-2 item 7).

Checks the StyleGAN2 semantics we re-derive (equalized-lr scaling, mbstd,
camera cmap projection), the torch-layout converter with a strict restore,
and that the SR task's lambda_dual_fm path runs the faithful arch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.models.eg3d_discriminator import (
    EG3DDualDiscriminator,
    EqualDense,
    feature_matching_loss,
    minibatch_std,
)
from genefaceplusplus_tpu.utils import convert_torch_ckpt as cvt
from genefaceplusplus_tpu.utils.ckpt import restore_into

RES = 32  # block resolutions 32, 16, 8 -> epilogue at 4


def _disc():
    return EG3DDualDiscriminator(img_resolution=RES, channel_base=512,
                                 channel_max=64, mapping_layers=2)


def _inputs(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.rand(b, RES, RES, 3), jnp.float32) * 2 - 1,
            jnp.asarray(rng.rand(b, RES // 2, RES // 2, 3), jnp.float32) * 2 - 1,
            jnp.asarray(rng.randn(b, 25), jnp.float32))


def test_forward_shapes_and_feature_maps():
    disc = _disc()
    img, raw, cam = _inputs()
    params = disc.init(jax.random.PRNGKey(0), img, raw, cam)
    logits, feats = disc.apply(params, img, raw, cam)
    assert logits.shape == (2, 1)
    # one feature map per block resolution (the FM-loss tensors,
    # radnerf_sr.py:235-244), each downsampled 2x from its block res
    assert [f.shape[1] for f in feats] == [16, 8, 4]
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)
    fm = feature_matching_loss(feats, [f + 1.0 for f in feats])
    np.testing.assert_allclose(float(fm), 1.0, atol=1e-5)


def test_equal_dense_matches_manual_formula():
    """Equalized lr: y = x @ (w.T * lr/sqrt(in)) + b*lr (networks_stylegan2.py:92-126)."""
    layer = EqualDense(6, activation="linear", lr_multiplier=0.01)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 4), jnp.float32)
    p = layer.init(jax.random.PRNGKey(1), x)
    w, b = np.asarray(p["params"]["weight"]), np.asarray(p["params"]["bias"])
    want = np.asarray(x) @ (w.T * (0.01 / np.sqrt(4))) + b * 0.01
    np.testing.assert_allclose(np.asarray(layer.apply(p, x)), want, atol=1e-5)


def test_minibatch_std_matches_reference_formula():
    """NHWC port of MinibatchStdLayer (networks_stylegan2.py:664-692)."""
    rng = np.random.RandomState(3)
    x = rng.randn(4, 4, 4, 8).astype(np.float32)
    out = np.asarray(minibatch_std(jnp.asarray(x), group_size=2))
    assert out.shape == (4, 4, 4, 9)
    # torch-twin computation (NCHW)
    xt = x.transpose(0, 3, 1, 2)
    y = xt.reshape(2, 2, 1, 8, 4, 4)
    y = y - y.mean(0)
    y = np.sqrt((y ** 2).mean(0) + 1e-8).mean(axis=(2, 3, 4))  # [n, F] over c,H,W
    y = np.tile(y.reshape(2), 2)  # b = g*n+i -> stat[i]
    for n in range(4):
        np.testing.assert_allclose(out[n, :, :, 8], y[n], atol=1e-5)
    np.testing.assert_allclose(out[..., :8], x, atol=0)


def test_torch_layout_conversion_strict_restore():
    """A torch-named state dict with the exact reference shapes converts and
    strict-restores into the flax module; forward output changes vs init."""
    disc = _disc()
    img, raw, cam = _inputs()
    template = disc.init(jax.random.PRNGKey(0), img, raw, cam)

    rng = np.random.RandomState(7)
    state = {}
    chans = {32: min(512 // 32, 64), 16: min(512 // 16, 64),
             8: min(512 // 8, 64), 4: min(512 // 4, 64)}

    def add_conv(name, out_c, in_c, k, bias=True):
        state[f"{name}.weight"] = rng.randn(out_c, in_c, k, k).astype(np.float32)
        if bias:
            state[f"{name}.bias"] = rng.randn(out_c).astype(np.float32) * 0.1

    def add_dense(name, out_c, in_c):
        state[f"{name}.weight"] = rng.randn(out_c, in_c).astype(np.float32)
        state[f"{name}.bias"] = rng.randn(out_c).astype(np.float32) * 0.1

    res_list = [32, 16, 8]
    for i, r in enumerate(res_list):
        t, o = chans[r], chans[r // 2]
        if i == 0:
            add_conv(f"b{r}.fromrgb", t, 6, 1)
        add_conv(f"b{r}.conv0", t, t, 3)
        add_conv(f"b{r}.conv1", o, t, 3)
        add_conv(f"b{r}.skip", o, t, 1, bias=False)
    cmap = chans[4]
    add_dense("mapping.embed", cmap, 25)
    for i in range(2):
        add_dense(f"mapping.fc{i}", cmap, cmap)
    add_conv("b4.conv", cmap, cmap + 1, 3)
    add_dense("b4.fc", cmap, cmap * 16)
    add_dense("b4.out", cmap, cmap)

    out = cvt.convert_eg3d_disc(state, img_resolution=RES)
    assert out["n_mapping_layers"] == 2
    restored = restore_into(template, {"params": out["params"]}, strict=True)
    changed = sum(int(not np.allclose(a, b)) for a, b in
                  zip(jax.tree.leaves(template), jax.tree.leaves(restored)))
    assert changed == len(jax.tree.leaves(template)), "some leaves not restored"
    logits, _ = disc.apply(restored, img, raw, cam)
    init_logits, _ = disc.apply(template, img, raw, cam)
    assert np.isfinite(np.asarray(logits)).all()
    assert not np.allclose(np.asarray(logits), np.asarray(init_logits))


def test_sr_task_uses_faithful_disc(tmp_path):
    """lambda_dual_fm > 0 with disc_arch='eg3d' builds the faithful arch and
    the FM metric appears in a step past lpips_start_iters."""
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.sr_task import SRHeadNeRFTask, SRTaskConfig

    ds = RADNeRFDataset(synthetic(num_frames=6, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=True)
    cfg = RADNeRFConfig(grid_type="fourier", grid_size=16, cond_win_size=1,
                        smo_win_size=3, individual_embedding_num=6)
    tcfg = SRTaskConfig(n_rays=256, lambda_dual_fm=0.1, disc_arch="eg3d",
                        sr_start_iters=0, lpips_start_iters=0,
                        finetune_lips=False, lip_window=8)
    task = SRHeadNeRFTask(ds, cfg, tcfg, TaskHParams(), seed=0)
    from genefaceplusplus_tpu.models.eg3d_discriminator import EG3DDualDiscriminator

    assert isinstance(task.disc_model, EG3DDualDiscriminator)
    state = task.create_state()
    state = state.replace(global_step=jnp.asarray(10, jnp.int32))
    batch = task.sample_train_batch()
    state, metrics = task.train_step(state, batch)
    assert "dual_feature_matching_loss" in metrics
    assert np.isfinite(float(metrics["dual_feature_matching_loss"]))


def test_missing_disc_ckpt_fails_loudly(tmp_path):
    """disc_model_dir set but empty must raise (reference strict=True)."""
    import pytest

    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.sr_task import SRHeadNeRFTask, SRTaskConfig

    ds = RADNeRFDataset(synthetic(num_frames=6, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=True)
    cfg = RADNeRFConfig(grid_type="fourier", grid_size=16, cond_win_size=1,
                        smo_win_size=3, individual_embedding_num=6)
    tcfg = SRTaskConfig(n_rays=256, lambda_dual_fm=0.1, disc_arch="eg3d",
                        disc_model_dir=str(tmp_path / "nope"),
                        finetune_lips=False)
    with pytest.raises(FileNotFoundError):
        SRHeadNeRFTask(ds, cfg, tcfg, TaskHParams(), seed=0)
