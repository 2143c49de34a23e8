import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.models.superresolution import (
    FullyConnectedLayer,
    Superresolution,
    modulated_conv2d,
)
from genefaceplusplus_tpu.ops.upfirdn2d import setup_filter, upfirdn2d, upsample2d


class TestUpfirdn2d:
    def test_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
        out = upfirdn2d(x, None, up=1, down=1, padding=0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)

    def test_upsample_preserves_mean(self):
        # FIR upsampling with a normalised filter and gain=up^2 preserves DC
        x = jnp.ones((1, 8, 8, 1))
        f = setup_filter([1, 3, 3, 1])
        out = upsample2d(x, f)
        assert out.shape == (1, 16, 16, 1)
        # interior pixels should be ~1.0 (away from boundary effects)
        np.testing.assert_allclose(np.asarray(out[0, 4:12, 4:12, 0]), 1.0, atol=1e-5)

    def test_downsample_shape(self):
        from genefaceplusplus_tpu.ops.upfirdn2d import downsample2d

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
        f = setup_filter([1, 3, 3, 1])
        out = downsample2d(x, f)
        assert out.shape == (2, 8, 8, 3)

    def test_zero_insertion_semantics(self):
        # up=2 with identity filter scaled by gain: output has x at even
        # positions and 0 elsewhere
        x = jnp.arange(4.0).reshape(1, 2, 2, 1) + 1.0
        out = upfirdn2d(x, np.ones((1, 1), np.float32), up=2, padding=0, gain=1.0)
        assert out.shape == (1, 4, 4, 1)
        o = np.asarray(out[0, :, :, 0])
        np.testing.assert_allclose(o[0, 0], 1.0)
        np.testing.assert_allclose(o[0, 1], 0.0)
        np.testing.assert_allclose(o[2, 2], 4.0)


class TestModulatedConv:
    def test_demodulation_normalises(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 8, 8, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8))
        styles = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (2, 4))) + 0.5
        out = modulated_conv2d(x, w, styles, padding=1)
        assert out.shape == (2, 8, 8, 8)
        # demodulated conv keeps activation scale ~input scale
        assert 0.2 < float(out.std()) < 5.0

    def test_style_scaling_equivariance_without_demod(self):
        # without demodulation, scaling styles scales output linearly
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 4, 2))
        s = jnp.ones((1, 4))
        a = modulated_conv2d(x, w, s, demodulate=False)
        b = modulated_conv2d(x, w, 2.0 * s, demodulate=False)
        np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a), rtol=1e-5)


def test_fully_connected_gain():
    fc = FullyConnectedLayer(8, bias_init=1.0)
    x = jnp.ones((2, 4))
    p = fc.init(jax.random.PRNGKey(0), x)
    out = fc.apply(p, x)
    assert out.shape == (2, 8)
    # weight_gain = 1/sqrt(in): manual check
    w = p["params"]["weight"]
    expected = x @ (w.T / np.sqrt(4)) + 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_superresolution_2x():
    model = Superresolution(channels=3, input_resolution=32)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), rgb)
    out = model.apply(variables, rgb)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    # const noise mode is deterministic
    out2 = model.apply(variables, rgb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    # random noise mode differs run to run given different rngs — but only
    # once noise_strength departs from its (faithful) zero init
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    for k in flat:
        if k[-1] == "noise_strength":
            flat[k] = jnp.asarray(0.5)
    variables2 = flax.traverse_util.unflatten_dict(flat)
    o3 = model.apply(variables2, rgb, noise_mode="random", rng=jax.random.PRNGKey(2))
    o4 = model.apply(variables2, rgb, noise_mode="random", rng=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(o3), np.asarray(o4))


def test_subpixel_upconv_matches_generic_path():
    """The fused-FIR subpixel up-conv (ops/upfirdn2d.py:_conv2d_up_subpixel)
    is bit-close to the two-pass reference formulation (upfirdn2d zero-insert
    + FIR depthwise, then VALID conv) across kernel sizes, up factors, odd
    sizes, and both weight-flip conventions."""
    import numpy as np
    import jax.numpy as jnp
    from jax import lax

    from genefaceplusplus_tpu.ops.upfirdn2d import (
        _parse_padding, conv2d_resample, setup_filter, upfirdn2d,
    )

    rng = np.random.RandomState(0)
    f = setup_filter([1, 3, 3, 1])

    def generic(x, w, f, up, padding, flip_weight):
        fw = f.shape[-1]
        fh = f.shape[-2]
        px0, px1, py0, py1 = _parse_padding(padding)
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
        z = upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1), gain=up ** 2)
        ww = jnp.flip(w, axis=(0, 1)) if not flip_weight else w
        return lax.conv_general_dilated(
            z, ww, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for (Hn, k, up, pad, flip) in [
        (16, 3, 2, 1, False), (16, 3, 2, 1, True), (16, 1, 2, 0, False),
        (17, 3, 2, 1, False), (16, 3, 4, 1, False), (8, 5, 2, 2, True),
    ]:
        x = jnp.asarray(rng.randn(2, Hn, Hn, 8), jnp.float32)
        w = jnp.asarray(rng.randn(k, k, 8, 5), jnp.float32)
        a = generic(x, w, f, up, pad, flip)
        b = conv2d_resample(x, w, f=f, up=up, padding=pad, flip_weight=flip)
        assert a.shape == b.shape, (a.shape, b.shape)
        assert float(jnp.abs(a - b).max()) < 1e-4, (Hn, k, up, pad, flip)


def test_superresolution_bf16_matches_f32():
    """bf16 SR blocks (production default; = the reference's fp16 blocks,
    radnerf_sr.py:19) share params with the f32 module and agree to high
    PSNR on image-range inputs."""
    f32 = Superresolution(channels=3, input_resolution=32)
    bf16 = Superresolution(channels=3, input_resolution=32, dtype=jnp.bfloat16)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = f32.init(jax.random.PRNGKey(1), rgb)
    a = np.asarray(f32.apply(variables, rgb))
    b = np.asarray(bf16.apply(variables, rgb))  # params interchangeable
    assert b.dtype == np.float32  # img/skip accumulation stays f32
    assert np.isfinite(b).all()
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(max(np.ptp(a), 1e-9) ** 2 / max(mse, 1e-12))
    assert psnr > 35.0, f"bf16 SR diverges from f32: PSNR={psnr:.1f} dB"
