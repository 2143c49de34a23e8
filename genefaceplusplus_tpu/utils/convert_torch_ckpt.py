"""Reference (PyTorch) checkpoint -> TPU framework converter.

The reference saves `{epoch, global_step, optimizer_states, state_dict:
{model: <torch state dict>}}` with legacy torch serialization
(utils/commons/trainer.py:543-567). This module maps those tensors into our
flax pytrees:

  * Conv1d weight [out, in, k]      -> flax Conv kernel [k, in, out]
  * ConvTranspose1d [in, out, k]    -> flax ConvTranspose kernel [k, in, out]
  * Linear weight [out, in]         -> flax Dense kernel [in, out]
  * torch weight_norm (weight_g [out,1,1] + weight_v) is folded into a
    single kernel g * v / ||v||_(in,k) (the WN/coupling convs —
    flow_base.py:47-65; our modules train plain convs)
  * BatchNorm1d weight/bias/running_mean/var -> scale/bias + batch_stats
  * Embedding weight -> Embed embedding
  * GridEncoder embeddings copy verbatim (row layout identical by
    construction, ops/grid_encoder.py); density_grid / density_bitfield
    convert from morton to spatial order (ops/morton.py, native/)

Only the audio2motion family is fully mapped here (the shipped inference
models); the RADNeRF head mapping covers the grid-encoder path (the Fourier
flagship has no torch counterpart by design).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str, sub_model: str = "model") -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    if sub_model in state:
        state = state[sub_model]
    return {k: _np(v) for k, v in state.items()}


def fold_weight_norm(state: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """g * v / ||v|| with the norm over all dims but 0 (torch weight_norm)."""
    g = state[f"{prefix}.weight_g"]
    v = state[f"{prefix}.weight_v"]
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def conv1d_to_flax(w: np.ndarray) -> np.ndarray:
    """[out, in, k] -> [k, in, out]."""
    return np.transpose(w, (2, 1, 0))


def convtranspose1d_to_flax(w: np.ndarray) -> np.ndarray:
    """[in, out, k] -> [k, in, out], spatially flipped (torch ConvTranspose is
    the conv gradient — kernel reversed relative to flax's fractionally
    strided conv; verified in tests/test_convert_torch.py)."""
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])


def linear_to_flax(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return w.T


def _conv_entry(state, torch_prefix, weight_norm=False, transpose=False):
    if weight_norm:
        w = fold_weight_norm(state, torch_prefix)
    else:
        w = state[f"{torch_prefix}.weight"]
    kernel = convtranspose1d_to_flax(w) if transpose else conv1d_to_flax(w)
    out = {"kernel": kernel}
    b = state.get(f"{torch_prefix}.bias")
    if b is not None:
        out["bias"] = b
    return out


def convert_wn(state: Dict[str, np.ndarray], prefix: str, n_layers: int) -> Dict[str, Any]:
    """WN WaveNet stack (flow_base.py:21-117) -> our WN module params."""
    out: Dict[str, Any] = {}
    if f"{prefix}.cond_layer.weight_g" in state:
        out["cond_layer"] = _conv_entry(state, f"{prefix}.cond_layer", weight_norm=True)
    for i in range(n_layers):
        out[f"in_layer_{i}"] = _conv_entry(state, f"{prefix}.in_layers.{i}", weight_norm=True)
        out[f"res_skip_layer_{i}"] = _conv_entry(state, f"{prefix}.res_skip_layers.{i}", weight_norm=True)
    return out


def convert_coupling_block(state: Dict[str, np.ndarray], prefix: str,
                           n_flows: int = 4, wn_layers: int = 4) -> Dict[str, Any]:
    """ResidualCouplingBlock (torch ModuleList interleaves Flip at odd idx)."""
    out: Dict[str, Any] = {}
    for i in range(n_flows):
        t = f"{prefix}.flows.{2 * i}"
        out[f"flow_{i}"] = {
            "pre": _conv_entry(state, f"{t}.pre"),
            "post": _conv_entry(state, f"{t}.post"),
            "enc": convert_wn(state, f"{t}.enc", wn_layers),
        }
    return out


def _conv_stack(state, p0, p1, pbn):
    """ConvStack (Conv-BN-GELU-Conv): returns (params, batch_stats)."""
    params = {
        "Conv_0": {"kernel": conv1d_to_flax(state[f"{p0}.weight"])},
        "Conv_1": {"kernel": conv1d_to_flax(state[f"{p1}.weight"])},
        "BatchNorm_0": {"scale": state[f"{pbn}.weight"], "bias": state[f"{pbn}.bias"]},
    }
    stats = {
        "BatchNorm_0": {"mean": state[f"{pbn}.running_mean"], "var": state[f"{pbn}.running_var"]},
    }
    return params, stats


def convert_fvae(state: Dict[str, np.ndarray], prefix: str = "vae",
                 enc_layers: int = 8, dec_layers: int = 4) -> Dict[str, Any]:
    """FVAE (vae.py:150-269) -> our FVAE params."""
    p: Dict[str, Any] = {}
    p["g_pre_net"] = _conv_entry(state, f"{prefix}.g_pre_net.0")
    p["encoder"] = {
        "Conv_0": _conv_entry(state, f"{prefix}.encoder.pre_net.0"),
        "wn": convert_wn(state, f"{prefix}.encoder.wn", enc_layers),
        "Conv_1": _conv_entry(state, f"{prefix}.encoder.out_proj"),
    }
    if f"{prefix}.decoder.pre_net.0.weight" in state:
        p["decoder"] = {
            "ConvTranspose_0": _conv_entry(state, f"{prefix}.decoder.pre_net.0", transpose=True),
            "wn": convert_wn(state, f"{prefix}.decoder.wn", dec_layers),
            "Conv_0": _conv_entry(state, f"{prefix}.decoder.out_proj"),
        }
    if f"{prefix}.prior_flow.flows.0.pre.weight" in state:
        p["prior_flow"] = convert_coupling_block(state, f"{prefix}.prior_flow")
    return p


def convert_pitch_contour_vae(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """PitchContourVAEModel torch state dict -> flax variables dict."""
    mel_p, mel_s = _conv_stack(state, "mel_encoder.0", "mel_encoder.3", "mel_encoder.1")
    pit_p, pit_s = _conv_stack(state, "pitch_encoder.0", "pitch_encoder.3", "pitch_encoder.1")
    params: Dict[str, Any] = {
        "blink_embed": {"embedding": state["blink_embed.weight"]},
        "mel_encoder": mel_p,
        "pitch_embed": {"embedding": state["pitch_embed.weight"]},
        "pitch_encoder": pit_p,
        "cond_proj": {"kernel": linear_to_flax(state["cond_proj.weight"]),
                      "bias": state["cond_proj.bias"]},
        "vae": convert_fvae(state),
    }
    if "mouth_amp_embed" in state:
        params["mouth_amp_embed"] = state["mouth_amp_embed"]
    if "eye_amp_embed" in state:
        params["eye_amp_embed"] = state["eye_amp_embed"]
    batch_stats = {"mel_encoder": mel_s, "pitch_encoder": pit_s}
    return {"params": params, "batch_stats": batch_stats}


def conv2d_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [out, in, kh, kw] -> flax HWIO [kh, kw, in, out]."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_vgg19(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision vgg19 state dict -> VGG19Features flax variables.

    Accepts either torchvision keys (features.{idx}.weight) or the bare
    conv_x_y naming the reference's vggface loader uses
    (tasks/radnerfs/losses.py:70-111). Returns {'params': {Conv_i: ...}}
    for training/perceptual.py:VGG19Features."""
    # torchvision vgg19 conv indices within `features`
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    names = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3", "conv3_4",
        "conv4_1", "conv4_2", "conv4_3", "conv4_4",
        "conv5_1", "conv5_2", "conv5_3", "conv5_4",
    ]
    params: Dict[str, Any] = {}
    for i, (tv, nm) in enumerate(zip(tv_conv_idx, names)):
        if f"features.{tv}.weight" in state:
            w, b = state[f"features.{tv}.weight"], state[f"features.{tv}.bias"]
        else:
            w, b = state[f"{nm}.weight"], state[f"{nm}.bias"]
        params[f"Conv_{i}"] = {"kernel": conv2d_to_flax(np.asarray(w)),
                               "bias": np.asarray(b)}
    return {"params": params}


def convert_vggface(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """vgg_face_dag (VGG16, conv_x_y naming) or torchvision-vgg16 state dict
    -> VGG16Features flax variables (tasks/radnerfs/losses.py:83-111)."""
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    names = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3",
        "conv4_1", "conv4_2", "conv4_3",
        "conv5_1", "conv5_2", "conv5_3",
    ]
    params: Dict[str, Any] = {}
    for i, (tv, nm) in enumerate(zip(tv_conv_idx, names)):
        if f"{nm}.weight" in state:
            w, b = state[f"{nm}.weight"], state[f"{nm}.bias"]
        else:
            w, b = state[f"features.{tv}.weight"], state[f"features.{tv}.bias"]
        params[f"Conv_{i}"] = {"kernel": conv2d_to_flax(np.asarray(w)),
                               "bias": np.asarray(b)}
    return {"params": params}


def convert_eg3d_disc(state: Dict[str, np.ndarray],
                      img_resolution: int = 512) -> Dict[str, Any]:
    """eg3d_baseline_run2 `disc` torch state dict -> EG3DDualDiscriminator
    flax params (models/eg3d_discriminator.py).

    Torch layout (modules/eg3ds/models/{dual_discriminator,
    networks_stylegan2}.py): b{res}.{fromrgb,conv0,conv1,skip}.{weight,bias}
    with conv weights [out,in,k,k]; mapping.embed + mapping.fc{i} [out,in];
    b4.{conv,fc,out}. Our EqualDense stores [out,in] verbatim; conv kernels
    transpose to HWIO."""
    res_log2 = int(np.log2(img_resolution))
    block_res = [2 ** i for i in range(res_log2, 2, -1)]

    def conv(prefix, bias=True):
        out = {"weight": conv2d_to_flax(state[f"{prefix}.weight"])}
        if bias and f"{prefix}.bias" in state:
            out["bias"] = state[f"{prefix}.bias"]
        return out

    def dense(prefix):
        return {"weight": state[f"{prefix}.weight"],
                "bias": state[f"{prefix}.bias"]}

    params: Dict[str, Any] = {}
    for i, r in enumerate(block_res):
        blk = {
            "conv0": conv(f"b{r}.conv0"),
            "conv1": conv(f"b{r}.conv1"),
            "skip": conv(f"b{r}.skip", bias=False),
        }
        if i == 0:
            blk["fromrgb"] = conv(f"b{r}.fromrgb")
        params[f"b{r}"] = blk
    mapping: Dict[str, Any] = {"embed": dense("mapping.embed")}
    i = 0
    while f"mapping.fc{i}.weight" in state:
        mapping[f"fc{i}"] = dense(f"mapping.fc{i}")
        i += 1
    params["mapping"] = mapping
    params["b4_conv"] = conv("b4.conv")
    params["b4_fc"] = dense("b4.fc")
    params["b4_out"] = dense("b4.out")
    return {"params": params, "n_mapping_layers": i}


def convert_radnerf_grid(state: Dict[str, np.ndarray], grid_size: int = 128) -> Dict[str, Any]:
    """RADNeRF (grid path) torch state dict -> flax params + render state.

    Maps cond_prenet/cond_att_net convs+linears, grid embeddings (verbatim),
    ambient/sigma/color MLPs, individual codes, and converts density grid
    buffers from morton to spatial order.
    """
    import jax.numpy as jnp

    from genefaceplusplus_tpu.ops import morton

    def mlp(prefix, n):
        return {
            f"Dense_{i}": {"kernel": linear_to_flax(state[f"{prefix}.net.{i}.weight"])}
            for i in range(n)
        }

    def audio_net(prefix):
        out = {}
        conv_ids = [0, 2, 4, 6]
        for j, ci in enumerate(conv_ids):
            out[f"Conv_{j}"] = _conv_entry(state, f"{prefix}.encoder_conv.{ci}")
        out["Dense_0"] = {"kernel": linear_to_flax(state[f"{prefix}.encoder_fc1.0.weight"]),
                          "bias": state[f"{prefix}.encoder_fc1.0.bias"]}
        out["Dense_1"] = {"kernel": linear_to_flax(state[f"{prefix}.encoder_fc1.2.weight"]),
                          "bias": state[f"{prefix}.encoder_fc1.2.bias"]}
        return out

    def att_net(prefix):
        out = {}
        conv_ids = [0, 2, 4, 6, 8]
        for j, ci in enumerate(conv_ids):
            out[f"Conv_{j}"] = _conv_entry(state, f"{prefix}.attentionConvNet.{ci}")
        out["Dense_0"] = {"kernel": linear_to_flax(state[f"{prefix}.attentionNet.0.weight"]),
                          "bias": state[f"{prefix}.attentionNet.0.bias"]}
        return out

    params: Dict[str, Any] = {
        "cond_prenet": audio_net("cond_prenet"),
        "position_embedder": {"embeddings": state["position_embedder.embeddings"]},
        "ambient_embedder": {"embeddings": state["ambient_embedder.embeddings"]},
        "ambient_net": mlp("ambient_net", 3),
        "sigma_net": mlp("sigma_net", 3),
        "color_net": mlp("color_net", 2),
    }
    if "cond_att_net.attentionConvNet.0.weight" in state:
        params["cond_att_net"] = att_net("cond_att_net")
    if "individual_embeddings" in state:
        params["individual_embeddings"] = state["individual_embeddings"]
    if "blink_embedding.weight" in state:
        params["blink_embedding"] = {"embedding": state["blink_embedding.weight"]}
        params["blink_encoder_0"] = {"kernel": linear_to_flax(state["blink_encoder.0.weight"]),
                                     "bias": state["blink_encoder.0.bias"]}
        params["blink_encoder_1"] = {"kernel": linear_to_flax(state["blink_encoder.1.weight"]),
                                     "bias": state["blink_encoder.1.bias"]}

    render_state: Dict[str, Any] = {}
    if "density_grid" in state:
        g = np.asarray(state["density_grid"])  # [CAS, H^3] morton order
        render_state["density_grid"] = np.asarray(
            morton.morton_to_spatial(jnp.asarray(g), grid_size)
        )
    if "density_bitfield" in state:
        bits = np.asarray(state["density_bitfield"]).astype(np.uint8)
        cas = bits.size * 8 // grid_size ** 3
        render_state["occupancy"] = np.asarray(
            morton.bitfield_to_occupancy(jnp.asarray(bits), cas, grid_size)
        )[0]
    return {"params": params, "render_state": render_state}
