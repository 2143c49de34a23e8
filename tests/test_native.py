import numpy as np

from genefaceplusplus_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of libgfpp_native.so failed"


def test_gather_pixels_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    idx = rng.randint(0, 64 * 64, 5000).astype(np.int64)
    out = native.gather_pixels(img, idx)
    ref = img.reshape(-1, 3)[idx].astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pack_frame():
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32)
    img[0, 0] = [-0.5, 1.5, 0.5]  # clamping
    out = native.pack_frame(img)
    assert out.dtype == np.uint8
    assert out[0, 0, 0] == 0 and out[0, 0, 1] == 255
    ref = (np.clip(img, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_bitfield_roundtrip_matches_jnp_reference():
    import jax.numpy as jnp

    from genefaceplusplus_tpu.ops import morton

    rng = np.random.RandomState(2)
    H = 16
    grid = rng.rand(H, H, H).astype(np.float32)
    bits = native.pack_bitfield_spatial(grid, 0.5)
    ref_bits = np.asarray(morton.occupancy_to_bitfield(jnp.asarray((grid > 0.5)[None])))
    np.testing.assert_array_equal(bits, ref_bits)
    occ = native.unpack_bitfield_spatial(bits, H)
    np.testing.assert_array_equal(occ, grid > 0.5)
