"""Torch->flax conversion parity tests (op-level, against real torch ops)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from genefaceplusplus_tpu.utils import convert_torch_ckpt as cvt


def test_conv1d_layout_parity():
    torch.manual_seed(0)
    tconv = torch.nn.Conv1d(6, 10, 3, padding=1)
    x = torch.randn(2, 6, 12)
    ref = tconv(x).detach().numpy()  # [B, C, T]

    import flax.linen as nn

    fconv = nn.Conv(10, kernel_size=(3,), padding=[(1, 1)])
    kernel = cvt.conv1d_to_flax(tconv.weight.detach().numpy())
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    out = fconv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))  # [B, T, C]
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=1e-5)


def test_convtranspose1d_layout_parity():
    torch.manual_seed(1)
    tconv = torch.nn.ConvTranspose1d(5, 7, 4, stride=4)
    x = torch.randn(1, 5, 6)
    ref = tconv(x).detach().numpy()

    import flax.linen as nn

    fconv = nn.ConvTranspose(7, kernel_size=(4,), strides=(4,), padding="VALID")
    kernel = cvt.convtranspose1d_to_flax(tconv.weight.detach().numpy())
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    out = fconv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=1e-5)


def test_weight_norm_folding_parity():
    torch.manual_seed(2)
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3, padding=1), name="weight")
    x = torch.randn(1, 4, 10)
    ref = conv(x).detach().numpy()

    state = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = cvt.fold_weight_norm({"c.weight_g": state["weight_g"], "c.weight_v": state["weight_v"]}, "c")
    # folding must reproduce the effective torch weight
    eff = conv.weight.detach().numpy()
    np.testing.assert_allclose(folded, eff, atol=1e-6)

    import flax.linen as nn

    fconv = nn.Conv(8, kernel_size=(3,), padding=[(1, 1)])
    params = {"params": {"kernel": jnp.asarray(cvt.conv1d_to_flax(folded)), "bias": jnp.asarray(state["bias"])}}
    out = fconv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=1e-5)


def _synthetic_a2m_state(feat=128, audio_in=1024, hidden=256, latent=16,
                         enc_layers=8, dec_layers=4, flow_hidden=64):
    """torch-named state dict with the reference's exact shapes (vae.py:340-454)."""
    rng = np.random.RandomState(0)
    s = {}

    def conv(name, out, inp, k, bias=True):
        s[f"{name}.weight"] = rng.randn(out, inp, k).astype(np.float32) * 0.05
        if bias:
            s[f"{name}.bias"] = rng.randn(out).astype(np.float32) * 0.01

    def wn_conv(name, out, inp, k):
        v = rng.randn(out, inp, k).astype(np.float32) * 0.05
        s[f"{name}.weight_v"] = v
        s[f"{name}.weight_g"] = np.linalg.norm(v.reshape(out, -1), axis=1).reshape(out, 1, 1).astype(np.float32)
        s[f"{name}.bias"] = rng.randn(out).astype(np.float32) * 0.01

    def bn(name, c):
        s[f"{name}.weight"] = np.ones(c, np.float32)
        s[f"{name}.bias"] = np.zeros(c, np.float32)
        s[f"{name}.running_mean"] = np.zeros(c, np.float32)
        s[f"{name}.running_var"] = np.ones(c, np.float32)

    def wn_stack(prefix, h, gin, n, ksz):
        wn_conv(f"{prefix}.cond_layer", 2 * h * n, gin, 1)
        for i in range(n):
            wn_conv(f"{prefix}.in_layers.{i}", 2 * h, h, ksz)
            rs = 2 * h if i < n - 1 else h
            wn_conv(f"{prefix}.res_skip_layers.{i}", rs, h, 1)

    s["blink_embed.weight"] = rng.randn(2, feat).astype(np.float32)
    conv("mel_encoder.0", feat, audio_in, 3, bias=False)
    bn("mel_encoder.1", feat)
    conv("mel_encoder.3", feat, feat, 3, bias=False)
    s["pitch_embed.weight"] = rng.randn(300, feat).astype(np.float32)
    conv("pitch_encoder.0", feat, feat, 3, bias=False)
    bn("pitch_encoder.1", feat)
    conv("pitch_encoder.3", feat, feat, 3, bias=False)
    s["mouth_amp_embed"] = rng.randn(feat).astype(np.float32)
    s["cond_proj.weight"] = rng.randn(feat, 3 * feat + feat).astype(np.float32) * 0.02
    s["cond_proj.bias"] = np.zeros(feat, np.float32)

    conv("vae.g_pre_net.0", feat, feat, 8)
    conv("vae.encoder.pre_net.0", hidden, 64, 8)
    wn_stack("vae.encoder.wn", hidden, feat, enc_layers, 5)
    conv("vae.encoder.out_proj", 2 * latent, hidden, 1)
    s["vae.decoder.pre_net.0.weight"] = rng.randn(latent, hidden, 4).astype(np.float32) * 0.05
    s["vae.decoder.pre_net.0.bias"] = np.zeros(hidden, np.float32)
    wn_stack("vae.decoder.wn", hidden, feat, dec_layers, 5)
    conv("vae.decoder.out_proj", 64, hidden, 1)
    for i in range(4):
        t = f"vae.prior_flow.flows.{2 * i}"
        conv(f"{t}.pre", flow_hidden, latent // 2, 1)
        conv(f"{t}.post", latent // 2, flow_hidden, 1)
        wn_stack(f"{t}.enc", flow_hidden, feat, 4, 3)
    return s


def test_pitch_vae_conversion_loads_and_runs():
    from genefaceplusplus_tpu.models.audio2motion.vae_model import PitchContourVAEModel
    from genefaceplusplus_tpu.utils.ckpt import restore_into

    state = _synthetic_a2m_state()
    converted = cvt.convert_pitch_contour_vae(state)

    model = PitchContourVAEModel(in_out_dim=64, audio_in_dim=1024)
    T = 16
    batch = {
        "audio": jnp.zeros((1, 2 * T, 1024)),
        "f0": jnp.full((1, 2 * T), 120.0),
        "y_mask": jnp.ones((1, T)),
        "y": jnp.zeros((1, T, 64)),
    }
    template = model.init(jax.random.PRNGKey(0), batch, train=True, rng=jax.random.PRNGKey(1))
    merged = restore_into(template, converted, strict=True)

    # every converted leaf must have found a slot (no silent shape drops)
    import flax

    flat_t = flax.traverse_util.flatten_dict(template)
    flat_m = flax.traverse_util.flatten_dict(merged)
    n_changed = sum(
        1 for k in flat_t
        if flat_t[k].shape == flat_m[k].shape and not np.allclose(np.asarray(flat_t[k]), np.asarray(flat_m[k]))
    )
    assert n_changed > 100, f"only {n_changed} leaves converted"

    out, aux = model.apply(merged, batch, train=False, temperature=0.5, rng=jax.random.PRNGKey(2))
    assert out.shape == (1, T, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_radnerf_grid_conversion_buffers():
    rng = np.random.RandomState(0)
    H = 16
    import jax.numpy as jnp

    from genefaceplusplus_tpu.ops import morton

    spatial = rng.rand(1, H, H, H).astype(np.float32)
    morton_flat = np.asarray(morton.spatial_to_morton(jnp.asarray(spatial)))
    bits = np.asarray(morton.packbits(jnp.asarray(morton_flat.reshape(-1)), 0.5))
    state = {"density_grid": morton_flat, "density_bitfield": bits,
             "position_embedder.embeddings": rng.randn(64, 2).astype(np.float32),
             "ambient_embedder.embeddings": rng.randn(64, 2).astype(np.float32),
             **{f"ambient_net.net.{i}.weight": rng.randn(8, 8).astype(np.float32) for i in range(3)},
             **{f"sigma_net.net.{i}.weight": rng.randn(8, 8).astype(np.float32) for i in range(3)},
             **{f"color_net.net.{i}.weight": rng.randn(8, 8).astype(np.float32) for i in range(2)},
             **{f"cond_prenet.encoder_conv.{c}.weight": rng.randn(4, 4, 3).astype(np.float32) for c in (0, 2, 4, 6)},
             **{f"cond_prenet.encoder_conv.{c}.bias": rng.randn(4).astype(np.float32) for c in (0, 2, 4, 6)},
             "cond_prenet.encoder_fc1.0.weight": rng.randn(8, 8).astype(np.float32),
             "cond_prenet.encoder_fc1.0.bias": rng.randn(8).astype(np.float32),
             "cond_prenet.encoder_fc1.2.weight": rng.randn(8, 8).astype(np.float32),
             "cond_prenet.encoder_fc1.2.bias": rng.randn(8).astype(np.float32)}
    out = cvt.convert_radnerf_grid(state, grid_size=H)
    np.testing.assert_allclose(out["render_state"]["density_grid"][0], spatial[0], atol=1e-6)
    np.testing.assert_array_equal(out["render_state"]["occupancy"], spatial[0] > 0.5)
    assert out["params"]["sigma_net"]["Dense_0"]["kernel"].shape == (8, 8)
