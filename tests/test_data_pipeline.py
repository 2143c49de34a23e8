import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.data import audio as audio_lib
from genefaceplusplus_tpu.data.face3d import Face3DHelper, split_coeff
from genefaceplusplus_tpu.data.fit_3dmm import FitConfig, fit_3dmm_for_video
from genefaceplusplus_tpu.data.landmarks import inject_blink_to_lm68, recompose_lm68_regions
from genefaceplusplus_tpu.models.postnet.models import PitchContourCNNPostNet
from genefaceplusplus_tpu.training.tasks.a2m_task import A2MTask, A2MTaskConfig
from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic


class TestAudio:
    def test_mel_shapes(self):
        wav = np.sin(np.linspace(0, 2000 * np.pi, 16000 * 2)).astype(np.float32)
        wav_p, mel = audio_lib.extract_mel(wav)
        assert mel.shape[1] == 80
        assert len(wav_p) % audio_lib.HOP_SIZE == 0
        assert np.isfinite(mel).all()

    def test_f0_on_pure_tone(self):
        # 220 Hz tone -> f0 ~220; silence -> 0
        sr = 16000
        t = np.arange(sr * 2) / sr
        wav = np.sin(2 * np.pi * 220 * t).astype(np.float32) * 0.5
        f0 = audio_lib.extract_f0(wav)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.05)
        sil = audio_lib.extract_f0(np.zeros(sr, np.float32))
        assert (sil == 0).all()

    def test_f0_mel_alignment(self):
        wav = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
        wav_p, mel = audio_lib.extract_mel(wav)
        f0 = audio_lib.extract_f0(wav_p, mel_len=len(mel))
        assert len(f0) == len(mel)

    def test_wav_io_roundtrip(self, tmp_path):
        wav = (np.random.RandomState(0).rand(16000).astype(np.float32) - 0.5) * 0.8
        p = str(tmp_path / "t.wav")
        audio_lib.save_wav_16k(wav, p)
        back = audio_lib.load_wav_16k(p)
        np.testing.assert_allclose(back, wav, atol=1e-3)


class TestFace3D:
    def test_split_coeff(self):
        c = jnp.arange(257.0)[None]
        d = split_coeff(c)
        assert d["identity"].shape == (1, 80)
        assert d["expression"].shape == (1, 64)
        assert d["euler"].shape == (1, 3)
        assert d["translation"].shape == (1, 3)
        np.testing.assert_allclose(np.asarray(d["translation"][0]), [254, 255, 256])

    def test_idexp_lm3d_linear(self):
        h = Face3DHelper.synthetic("lm68")
        id1 = jnp.ones((2, 80)) * 0.1
        exp1 = jnp.zeros((2, 64))
        a = h.reconstruct_idexp_lm3d(id1, exp1)
        b = h.reconstruct_idexp_lm3d(2 * id1, exp1)
        np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a), rtol=1e-5)
        assert a.shape == (2, 68, 3)

    def test_lm2d_nerf_flip(self):
        h = Face3DHelper.synthetic("lm68")
        id_c = jnp.zeros((1, 80))
        exp_c = jnp.zeros((1, 64))
        euler = jnp.zeros((1, 3))
        trans = jnp.asarray([[0.0, 0.0, 0.0]])
        plain = h.reconstruct_lm2d(id_c, exp_c, euler, trans, to_camera=False)
        nerf = h.reconstruct_lm2d_nerf(id_c, exp_c, euler, trans)
        np.testing.assert_allclose(np.asarray(nerf), 1.0 - np.asarray(plain), atol=1e-6)


def test_fit_3dmm_recovers_pose():
    h = Face3DHelper.synthetic("lm68")
    T = 5
    rng = np.random.RandomState(0)
    true = {
        "id": jnp.asarray(rng.randn(1, 80).astype(np.float32) * 0.3),
        "exp": jnp.asarray(rng.randn(T, 64).astype(np.float32) * 0.2),
        "euler": jnp.asarray(rng.randn(T, 3).astype(np.float32) * 0.1),
        "trans": jnp.asarray(rng.randn(T, 3).astype(np.float32) * 0.05),
    }
    target = np.asarray(h.reconstruct_lm2d(
        jnp.broadcast_to(true["id"], (T, 80)), true["exp"], true["euler"], true["trans"]
    ))
    cfg = FitConfig(iters_pose=100, iters_joint=300, lambda_lap=0.0,
                    lambda_reg_id=0.0, lambda_reg_exp=0.0)
    fit = fit_3dmm_for_video(target, h, cfg)
    assert fit["final_loss"] < fit["pose_loss"]
    assert fit["final_loss"] < 5e-4  # pure landmark recovery converges
    assert fit["exp"].shape == (T, 64)


def test_blink_injection_closes_eyes():
    rng = np.random.RandomState(0)
    T = 130
    lm = rng.rand(T, 68, 3).astype(np.float32)
    # well-separated eyelids
    lm[:, 37:39, 1] = 0.4
    lm[:, 40:42, 1] = 0.6
    out, eap = inject_blink_to_lm68(lm, 0.6, 0.15, period=100)
    assert out.shape == lm.shape
    # at blink peak (frame 75 + 3 = 78), eye area percent drops
    assert eap.min() < 0.6
    blink_frames = np.where(eap[:, 0] < 0.6)[0]
    assert len(blink_frames) > 0


def test_recompose_freezes_nonface():
    rng = np.random.RandomState(0)
    x = rng.rand(10, 68, 3).astype(np.float32)
    out = recompose_lm68_regions(x)
    # all 68 indices are covered by the driven regions (yaw+brow+nose+eye+mouth)
    np.testing.assert_allclose(out, x)


def test_postnet_identity_at_init():
    model = PitchContourCNNPostNet(out_dim=204)
    lm = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 204))
    pitch = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 128))
    params = model.init(jax.random.PRNGKey(2), lm, pitch)
    out = model.apply(params, lm, pitch)
    assert out.shape == (1, 10, 204)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lm), atol=1e-5)


def test_a2m_training_reduces_loss():
    ds = RADNeRFDataset(synthetic(num_frames=96, H=16, W=16), split="train", with_sr=False)
    task = A2MTask(ds, A2MTaskConfig(seq_len=16, batch_size=2, audio_in_dim=1024, lr=1e-3, hidden_channels=64, enc_n_layers=2, dec_n_layers=2, flow_hidden=16, flow_n_blocks=2))
    state = task.create_state()
    losses = []
    for _ in range(8):
        batch = task.sample_train_batch()
        state, metrics = task.train_step(state, batch)
        losses.append(float(metrics["mse_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # not diverging


def test_secc_splat_render():
    from genefaceplusplus_tpu.data.face3d import Face3DHelper
    from genefaceplusplus_tpu.data.secc import ncc_colors, render_secc, render_secc_from_coeffs

    h = Face3DHelper.synthetic("lm68")
    img = render_secc_from_coeffs(
        h, np.zeros((1, 80), np.float32), np.zeros((1, 64), np.float32),
        np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32),
    )
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    assert img.max() > 0  # something was splatted
    c = ncc_colors(np.asarray(h.key_mean_shape))
    assert c.min() >= 0 and c.max() <= 1
