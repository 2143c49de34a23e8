"""Full-size reference-checkpoint conversion: 100% key mapping, zero leftovers.

Builds fake torch `state_dict['model']` dicts with the EXACT tensor names and
shapes the reference modules produce at production config —
  * RADNeRF (tiledgrid) @ egs/datasets/May/lm3d_radnerf_sr.yaml dims
    (modules/radnerfs/radnerf.py:13-90, cond_encoder.py:98-180,
    renderer.py:81-102, encoders/gridencoder/grid.py:104-143)
  * PitchContourVAEModel @ checkpoints/audio2motion_vae dims
    (modules/audio2motion/vae.py:340-454, flow_base.py:21-117,614-703)
— and asserts the converters consume every parameter key and fill every
flax template leaf. A wrong key silently hitting the lenient-restore path
is exactly the failure mode this pins down.
"""

import numpy as np
import pytest

from genefaceplusplus_tpu.utils import convert_torch_ckpt as C


class TrackingDict(dict):
    """Records which keys the converter consumed."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.used.add(k)
        return super().get(k, default)


def _rng_fill(rng, shapes):
    out = {}
    for k, v in shapes.items():
        if not isinstance(v, tuple):
            out[k] = v
        elif k.endswith("running_var"):
            out[k] = (np.abs(rng.randn(*v)) + 0.5).astype(np.float32)
        else:
            out[k] = (rng.randn(*v) * 0.1).astype(np.float32)
    return out


def _wn_keys(prefix, hidden, kernel, n_layers, gin):
    """torch WN with weight_norm (flow_base.py:21-67)."""
    d = {}
    if gin:
        d[f"{prefix}.cond_layer.weight_g"] = (2 * hidden * n_layers, 1, 1)
        d[f"{prefix}.cond_layer.weight_v"] = (2 * hidden * n_layers, gin, 1)
        d[f"{prefix}.cond_layer.bias"] = (2 * hidden * n_layers,)
    for i in range(n_layers):
        d[f"{prefix}.in_layers.{i}.weight_g"] = (2 * hidden, 1, 1)
        d[f"{prefix}.in_layers.{i}.weight_v"] = (2 * hidden, hidden, kernel)
        d[f"{prefix}.in_layers.{i}.bias"] = (2 * hidden,)
        rs = 2 * hidden if i < n_layers - 1 else hidden
        d[f"{prefix}.res_skip_layers.{i}.weight_g"] = (rs, 1, 1)
        d[f"{prefix}.res_skip_layers.{i}.weight_v"] = (rs, hidden, 1)
        d[f"{prefix}.res_skip_layers.{i}.bias"] = (rs,)
    return d


def fake_pitch_vae_state_dict(seed=0):
    """PitchContourVAEModel(audio_in=1024, in_out=64, feat=128) exact keys."""
    fd, hid, lat, gin = 128, 256, 16, 128
    shapes = {
        "blink_embed.weight": (2, fd),
        "mel_encoder.0.weight": (fd, 1024, 3),
        "mel_encoder.1.weight": (fd,),
        "mel_encoder.1.bias": (fd,),
        "mel_encoder.1.running_mean": (fd,),
        "mel_encoder.1.running_var": (fd,),
        "mel_encoder.1.num_batches_tracked": np.asarray(100),
        "mel_encoder.3.weight": (fd, fd, 3),
        "pitch_embed.weight": (300, fd),
        "pitch_encoder.0.weight": (fd, fd, 3),
        "pitch_encoder.1.weight": (fd,),
        "pitch_encoder.1.bias": (fd,),
        "pitch_encoder.1.running_mean": (fd,),
        "pitch_encoder.1.running_var": (fd,),
        "pitch_encoder.1.num_batches_tracked": np.asarray(100),
        "pitch_encoder.3.weight": (fd, fd, 3),
        "mouth_amp_embed": (fd,),
        "cond_proj.weight": (fd, 4 * fd),
        "cond_proj.bias": (fd,),
        # FVAE (vae.py:150-269): strides [4]
        "vae.g_pre_net.0.weight": (gin, gin, 8),
        "vae.g_pre_net.0.bias": (gin,),
        "vae.encoder.pre_net.0.weight": (hid, 64, 8),
        "vae.encoder.pre_net.0.bias": (hid,),
        "vae.encoder.out_proj.weight": (2 * lat, hid, 1),
        "vae.encoder.out_proj.bias": (2 * lat,),
        "vae.decoder.pre_net.0.weight": (lat, hid, 4),
        "vae.decoder.pre_net.0.bias": (hid,),
        "vae.decoder.out_proj.weight": (64, hid, 1),
        "vae.decoder.out_proj.bias": (64,),
    }
    shapes.update(_wn_keys("vae.encoder.wn", hid, 5, 8, gin))
    shapes.update(_wn_keys("vae.decoder.wn", hid, 5, 4, gin))
    # prior flow: 4 couplings (even ModuleList slots; odd slots are Flip
    # with no params), each pre(8->64,1) + WN(64,k3,4,gin=128) + post(64->8,1)
    for i in range(4):
        p = f"vae.prior_flow.flows.{2 * i}"
        shapes[f"{p}.pre.weight"] = (64, lat // 2, 1)
        shapes[f"{p}.pre.bias"] = (64,)
        shapes[f"{p}.post.weight"] = (lat // 2, 64, 1)
        shapes[f"{p}.post.bias"] = (lat // 2,)
        shapes.update(_wn_keys(f"{p}.enc", 64, 3, 4, gin))
    return TrackingDict(_rng_fill(np.random.RandomState(seed), shapes))


def fake_radnerf_state_dict(seed=1):
    """RADNeRF (tiledgrid) @ May lm3d_radnerf_sr production dims."""
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig

    cfg = _radnerf_cfg()
    pos_rows = cfg.position_grid_spec().n_rows
    amb_rows = cfg.ambient_grid_spec().n_rows
    H = cfg.grid_size
    shapes = {
        # AudioNet win=1 (strides 1,1,1,1; cond_encoder.py:115-132)
        "cond_prenet.encoder_conv.0.weight": (32, 204, 3),
        "cond_prenet.encoder_conv.0.bias": (32,),
        "cond_prenet.encoder_conv.2.weight": (32, 32, 3),
        "cond_prenet.encoder_conv.2.bias": (32,),
        "cond_prenet.encoder_conv.4.weight": (64, 32, 3),
        "cond_prenet.encoder_conv.4.bias": (64,),
        "cond_prenet.encoder_conv.6.weight": (64, 64, 3),
        "cond_prenet.encoder_conv.6.bias": (64,),
        "cond_prenet.encoder_fc1.0.weight": (64, 64),
        "cond_prenet.encoder_fc1.0.bias": (64,),
        "cond_prenet.encoder_fc1.2.weight": (64, 64),
        "cond_prenet.encoder_fc1.2.bias": (64,),
        # blink (radnerf.py:40-47; eye_blink_dim=2)
        "blink_embedding.weight": (1, 32),
        "blink_encoder.0.weight": (32, 32),
        "blink_encoder.0.bias": (32,),
        "blink_encoder.1.weight": (2, 32),
        "blink_encoder.1.bias": (2,),
        # AudioAttNet smo_win=3 (cond_encoder.py:146-180)
        "cond_att_net.attentionConvNet.0.weight": (16, 64, 3),
        "cond_att_net.attentionConvNet.0.bias": (16,),
        "cond_att_net.attentionConvNet.2.weight": (8, 16, 3),
        "cond_att_net.attentionConvNet.2.bias": (8,),
        "cond_att_net.attentionConvNet.4.weight": (4, 8, 3),
        "cond_att_net.attentionConvNet.4.bias": (4,),
        "cond_att_net.attentionConvNet.6.weight": (2, 4, 3),
        "cond_att_net.attentionConvNet.6.bias": (2,),
        "cond_att_net.attentionConvNet.8.weight": (1, 2, 3),
        "cond_att_net.attentionConvNet.8.bias": (1,),
        "cond_att_net.attentionNet.0.weight": (3, 3),
        "cond_att_net.attentionNet.0.bias": (3,),
        # grid embeddings (row layout identical by construction)
        "position_embedder.embeddings": (pos_rows, 2),
        "ambient_embedder.embeddings": (amb_rows, 2),
        # MLPs (bias-free ModuleList Linears, cond_encoder.py:183-202);
        # pos_dim 32 + cond 64 -> 128 -> 128 -> amb 3; sigma in 64; color in
        # SH16 + geo128 + ind4 = 148
        "ambient_net.net.0.weight": (128, 96),
        "ambient_net.net.1.weight": (128, 128),
        "ambient_net.net.2.weight": (3, 128),
        "sigma_net.net.0.weight": (128, 64),
        "sigma_net.net.1.weight": (128, 128),
        "sigma_net.net.2.weight": (129, 128),
        "color_net.net.0.weight": (128, 148),
        "color_net.net.1.weight": (3, 128),
        "individual_embeddings": (13000, 4),
        # buffers (renderer.py:81-102)
        "density_grid": (1, H ** 3),
        "density_bitfield": np.random.RandomState(7).randint(
            0, 256, size=(H ** 3 // 8,), dtype=np.uint8
        ),
        "aabb_train": (6,),
        "aabb_infer": (6,),
        "step_counter": (16, 2),
        "position_embedder.offsets": np.zeros(17, np.int32),
        "ambient_embedder.offsets": np.zeros(17, np.int32),
    }
    return TrackingDict(_rng_fill(np.random.RandomState(seed), shapes))


def _radnerf_cfg():
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig

    return RADNeRFConfig(
        grid_type="tiledgrid", cond_out_dim=64, cond_win_size=1, smo_win_size=3,
        add_eye_blink_cond=True, eye_blink_dim=2, with_att=True,
        log2_hashmap_size=16, desired_resolution=2048, ambient_coord_dim=3,
        num_layers_ambient=3, hidden_dim_ambient=128,
        num_layers_sigma=3, hidden_dim_sigma=128, geo_feat_dim=128,
        num_layers_color=2, hidden_dim_color=128,
        individual_embedding_num=13000, individual_embedding_dim=4,
        grid_size=128,
    )


# known non-parameter keys the converter legitimately ignores
VESTIGIAL_A2M = {k for k in fake_pitch_vae_state_dict() if "num_batches_tracked" in k}
VESTIGIAL_RADNERF = {
    "aabb_train", "aabb_infer", "step_counter",  # derived from config
    "position_embedder.offsets", "ambient_embedder.offsets",  # recomputed
}


def _count_changed(template, restored):
    import jax

    t, r = jax.tree.leaves(template), jax.tree.leaves(restored)
    assert len(t) == len(r)
    same_shape = [np.shape(a) == np.shape(b) for a, b in zip(t, r)]
    changed = [
        s and not np.allclose(np.asarray(a), np.asarray(b))
        for a, b, s in zip(t, r, same_shape)
    ]
    return sum(changed), len(t), [i for i, c in enumerate(changed) if not c]


def test_pitch_vae_conversion_is_complete():
    import jax
    import jax.numpy as jnp

    from genefaceplusplus_tpu.models.audio2motion.vae_model import PitchContourVAEModel
    from genefaceplusplus_tpu.utils.ckpt import restore_into

    state = fake_pitch_vae_state_dict()
    converted = C.convert_pitch_contour_vae(state)

    leftovers = set(state) - state.used - VESTIGIAL_A2M
    assert not leftovers, f"unconsumed torch keys: {sorted(leftovers)}"

    model = PitchContourVAEModel(in_out_dim=64, audio_in_dim=1024)
    T = 8
    batch = {
        "audio": jnp.zeros((1, 2 * T, 1024)),
        "f0": jnp.zeros((1, 2 * T)),
        "y_mask": jnp.ones((1, T)),
        "y": jnp.zeros((1, T, 64)),
    }
    template = model.init(jax.random.PRNGKey(0), batch, train=True,
                          rng=jax.random.PRNGKey(1))
    restored = restore_into(template, converted)
    changed, total, missed = _count_changed(template, restored)
    assert changed == total, (
        f"{total - changed}/{total} flax leaves NOT restored (indices {missed})"
    )

    # and the restored model must actually run
    out, _ = model.apply(restored, batch, train=False, temperature=0.0,
                         rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out)).all()


def test_vgg19_conversion_matches_torch():
    """convert_vgg19 (torchvision layout) reproduces torch activations."""
    torch = pytest.importorskip("torch")
    import jax

    from genefaceplusplus_tpu.training.perceptual import (
        VGG19_PLAN, VGG19_RELU_X1, VGG19Features,
    )
    from genefaceplusplus_tpu.utils.convert_torch_ckpt import convert_vgg19

    # build a torch module with the exact torchvision vgg19.features layout
    layers = []
    in_ch = 3
    for width, pool_before in VGG19_PLAN:
        if pool_before:
            layers.append(torch.nn.MaxPool2d(2, 2))
        layers.append(torch.nn.Conv2d(in_ch, width, 3, padding=1))
        layers.append(torch.nn.ReLU(inplace=False))
        in_ch = width
    layers.append(torch.nn.MaxPool2d(2, 2))
    feats = torch.nn.Sequential(*layers)
    torch.manual_seed(0)
    for m in feats.modules():
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.05)
    state = {f"features.{i}.{k}": v.detach().numpy()
             for i, m in enumerate(feats)
             if isinstance(m, torch.nn.Conv2d)
             for k, v in m.state_dict().items()}

    variables = convert_vgg19(state)
    net = VGG19Features()

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    jax_feats = net.apply(variables, x)

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        torch_feats = []
        conv_i = 0
        for m in feats:
            t = m(t)
            if isinstance(m, torch.nn.ReLU):
                if conv_i in VGG19_RELU_X1:
                    torch_feats.append(t.numpy().transpose(0, 2, 3, 1))
                conv_i += 1
    assert len(jax_feats) == len(torch_feats) == 5
    for a, b in zip(jax_feats, torch_feats):
        # fp32 accumulation-order differences compound over 16 convs
        np.testing.assert_allclose(np.asarray(a), b, rtol=5e-3, atol=5e-3)


def test_perceptual_vgg19_mode_runs():
    from genefaceplusplus_tpu.training.perceptual import PerceptualLoss

    loss = PerceptualLoss(arch="vgg19", n_scale=1)
    a = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    b = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    la = float(loss(a, b))
    assert np.isfinite(la) and la > 0
    assert float(loss(a, a)) < 1e-6


def test_vggface_conversion_and_dual_tower(tmp_path):
    """convert_vggface maps the vgg_face_dag (conv_x_y) layout; the dual
    vgg19+vggface loss runs like the reference's (losses.py:136-168)."""
    import jax
    from flax import serialization

    from genefaceplusplus_tpu.training.perceptual import (
        VGG16_PLAN, PerceptualLoss, VGG16Features,
    )
    from genefaceplusplus_tpu.utils.convert_torch_ckpt import convert_vggface

    # fake vgg_face_dag-named state dict with exact conv shapes
    rng = np.random.RandomState(0)
    names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2",
             "conv3_1", "conv3_2", "conv3_3",
             "conv4_1", "conv4_2", "conv4_3",
             "conv5_1", "conv5_2", "conv5_3"]
    state = {}
    in_ch = 3
    for nm, (width, _) in zip(names, VGG16_PLAN):
        state[f"{nm}.weight"] = rng.randn(width, in_ch, 3, 3).astype(np.float32) * 0.05
        state[f"{nm}.bias"] = rng.randn(width).astype(np.float32) * 0.05
        in_ch = width
    variables = convert_vggface(state)
    net = VGG16Features()
    feats = net.apply(variables, np.zeros((1, 64, 64, 3), np.float32))
    assert len(feats) == 5
    # conversion is complete: every flax conv leaf filled
    tmpl = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    assert (jax.tree.structure(tmpl) == jax.tree.structure(variables))

    p = tmp_path / "vggface.msgpack"
    with open(p, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    loss = PerceptualLoss(arch="vgg19", n_scale=0, vggface_weights_path=str(p))
    a = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    b = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    two_tower = float(loss(a, b))
    solo = float(PerceptualLoss(arch="vgg19", n_scale=0, seed=0)(a, b))
    assert np.isfinite(two_tower) and two_tower > 0
    assert float(loss(a, a)) < 1e-6


def test_radnerf_grid_conversion_is_complete():
    import jax
    import jax.numpy as jnp

    from genefaceplusplus_tpu.models.radnerf import RADNeRF
    from genefaceplusplus_tpu.utils.ckpt import restore_into

    cfg = _radnerf_cfg()
    state = fake_radnerf_state_dict()
    converted = C.convert_radnerf_grid(state, grid_size=cfg.grid_size)

    leftovers = set(state) - state.used - VESTIGIAL_RADNERF
    assert not leftovers, f"unconsumed torch keys: {sorted(leftovers)}"

    model = RADNeRF(cfg)
    cond = jnp.zeros((cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                          jnp.ones((8, 3)), cond)
    restored = restore_into(template, {"params": converted["params"]})
    changed, total, missed = _count_changed(template, restored)
    assert changed == total, (
        f"{total - changed}/{total} flax leaves NOT restored (indices {missed})"
    )

    # render-state buffers convert to spatial order with the right shapes
    rs = converted["render_state"]
    H = cfg.grid_size
    assert rs["density_grid"].shape[-3:] == (H, H, H)
    assert rs["occupancy"].shape == (H, H, H)
    assert rs["occupancy"].dtype == bool or rs["occupancy"].dtype == np.bool_

    # the restored model runs the full field
    sig, rgb, amb = model.apply(
        restored, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond
    )
    assert np.isfinite(np.asarray(sig)).all()
