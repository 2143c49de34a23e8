import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genefaceplusplus_tpu.ops import (
    GridSpec,
    freq_encode,
    freq_output_dim,
    grid_encode,
    init_grid_embeddings,
    sh_encode,
    trunc_exp,
)
from genefaceplusplus_tpu.ops import composite, morton, raymarch
from genefaceplusplus_tpu.utils.pitch import coarse_to_f0, f0_to_coarse


def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.asarray([-20.0, 0.0, 2.0, 20.0])
    y = trunc_exp(x)
    np.testing.assert_allclose(y, np.exp(np.asarray(x)), rtol=1e-5)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(g, expected, rtol=1e-5)


def test_freq_encode_layout():
    x = jnp.asarray([[0.3, -0.7]])
    out = freq_encode(x, degree=2)
    assert out.shape == (1, freq_output_dim(2, 2))
    np.testing.assert_allclose(out[0, :2], [0.3, -0.7], rtol=1e-6)
    np.testing.assert_allclose(out[0, 2:4], np.sin([0.3, -0.7]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 4:6], np.cos([0.3, -0.7]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:8], np.sin([0.6, -1.4]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 8:10], np.cos([0.6, -1.4]), rtol=1e-6)


def test_sh_encode_degree4():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = sh_encode(d, degree=4)
    assert out.shape == (1, 16)
    np.testing.assert_allclose(out[0, 0], 0.28209479, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], 0.48860251, rtol=1e-6)  # z term
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-7)
    # l=2 m=0 term at z=1: 0.94617469*1 - 0.31539156
    np.testing.assert_allclose(out[0, 6], 0.94617469 - 0.31539156, rtol=1e-5)


class TestGridEncoder:
    def spec(self, **kw):
        defaults = dict(
            input_dim=3,
            num_levels=4,
            level_dim=2,
            base_resolution=4,
            desired_resolution=32,
            log2_hashmap_size=10,
            gridtype="tiled",
        )
        defaults.update(kw)
        return GridSpec.create(**defaults)

    def test_offsets_match_reference_formula(self):
        # GeneFace++ production spec: 3D tiled, 16 levels, base 16, desired 2048
        spec = GridSpec.create(
            input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
            desired_resolution=2048, log2_hashmap_size=16, gridtype="tiled",
        )
        max_params = 2 ** 16
        offset = 0
        for lvl in range(16):
            res = int(np.ceil(16 * spec.per_level_scale ** lvl))
            n = min(max_params, (res + 1) ** 3)
            n = int(np.ceil(n / 8) * 8)
            assert spec.offsets[lvl + 1] - spec.offsets[lvl] == n
            offset += n
        assert spec.n_rows == offset

    def test_interpolation_linearity_1level(self):
        # a single-level dense grid must reproduce trilinear interpolation
        spec = GridSpec.create(
            input_dim=3, num_levels=1, level_dim=2, base_resolution=4,
            per_level_scale=1.0, log2_hashmap_size=12, gridtype="tiled",
        )
        key = jax.random.PRNGKey(0)
        emb = jax.random.normal(key, (spec.n_rows, 2))
        # exactly at a grid corner the output equals that corner's embedding
        res = spec.level_resolution(0)
        scale = spec.level_scale(0)
        # choose x01 so pos = x*scale + 0.5 lands exactly on integer k=2
        x01 = (2.0 - 0.5) / scale
        x = jnp.full((1, 3), x01) * 2.0 - 1.0  # map back to [-1,1]
        out = grid_encode(x, emb, spec, bound=1.0)
        stride = res + 1
        row = 2 * 1 + 2 * stride + 2 * stride * stride
        np.testing.assert_allclose(out[0], emb[row], rtol=1e-5)

    def test_oob_inputs_give_zero(self):
        spec = self.spec()
        emb = init_grid_embeddings(jax.random.PRNGKey(0), spec) + 1.0
        x = jnp.asarray([[2.0, 0.0, 0.0]])  # outside [-1,1]
        out = grid_encode(x, emb, spec, bound=1.0)
        np.testing.assert_allclose(out, 0.0, atol=1e-7)

    def test_hash_vs_tiled_shapes_and_grad(self):
        for gridtype in ("tiled", "hash"):
            spec = self.spec(gridtype=gridtype)
            emb = init_grid_embeddings(jax.random.PRNGKey(1), spec)
            x = jax.random.uniform(jax.random.PRNGKey(2), (128, 3), minval=-1, maxval=1)
            out = grid_encode(x, emb, spec)
            assert out.shape == (128, spec.output_dim)

            def loss(e, xx):
                return grid_encode(xx, e, spec).sum()

            g_emb = jax.grad(loss)(emb, x)
            assert g_emb.shape == emb.shape
            assert float(jnp.abs(g_emb).sum()) > 0
            g_x = jax.grad(loss, argnums=1)(emb, x)
            assert np.isfinite(np.asarray(g_x)).all()

    def test_smoothstep_continuity(self):
        spec = self.spec(interpolation="smoothstep", num_levels=2)
        emb = init_grid_embeddings(jax.random.PRNGKey(3), spec)
        x = jax.random.uniform(jax.random.PRNGKey(4), (16, 3), minval=-1, maxval=1)
        out = grid_encode(x, emb, spec)
        assert np.isfinite(np.asarray(out)).all()


class TestMorton:
    def test_roundtrip(self):
        coords = jnp.asarray(np.random.RandomState(0).randint(0, 128, (100, 3)))
        codes = morton.morton3d(coords)
        back = morton.morton3d_invert(codes)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))

    def test_known_values(self):
        # morton(1,0,0)=1, morton(0,1,0)=2, morton(0,0,1)=4, morton(1,1,1)=7
        c = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
        np.testing.assert_array_equal(np.asarray(morton.morton3d(c)), [1, 2, 4, 7])

    def test_pack_unpack_roundtrip(self):
        g = jnp.asarray(np.random.RandomState(1).rand(16 * 16 * 16).astype(np.float32))
        bits = morton.packbits(g, 0.5)
        unpacked = morton.unpackbits(bits)
        np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(g) > 0.5)

    def test_spatial_morton_roundtrip(self):
        H = 16
        g = jnp.asarray(np.random.RandomState(2).rand(1, H, H, H).astype(np.float32))
        m = morton.spatial_to_morton(g)
        back = morton.morton_to_spatial(m, H)
        np.testing.assert_allclose(np.asarray(back), np.asarray(g))

    def test_bitfield_occupancy_roundtrip(self):
        H = 16
        occ = jnp.asarray(np.random.RandomState(3).rand(1, H, H, H) > 0.7)
        bits = morton.occupancy_to_bitfield(occ)
        assert bits.shape == (H * H * H // 8,)
        back = morton.bitfield_to_occupancy(bits, 1, H)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(occ))

    def test_dilate6(self):
        g = np.zeros((1, 8, 8, 8), dtype=np.float32)
        g[0, 4, 4, 4] = 1.0
        out = np.asarray(morton.dilate6(jnp.asarray(g)))
        assert out[0, 4, 4, 4] == 1.0
        assert out[0, 3, 4, 4] == 1.0 and out[0, 5, 4, 4] == 1.0
        assert out[0, 4, 3, 4] == 1.0 and out[0, 4, 4, 5] == 1.0
        assert out[0, 3, 3, 4] == 0.0  # diagonal NOT dilated (6-neighbourhood)
        assert out.sum() == 7.0


class TestRaymarch:
    def test_near_far_slab(self):
        aabb = jnp.asarray([-1.0, -0.5, -1.0, 1.0, 0.5, 1.0])
        o = jnp.asarray([[0.0, 0.0, -3.0], [5.0, 5.0, -3.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        near, far = raymarch.near_far_from_aabb(o, d, aabb, min_near=0.05)
        np.testing.assert_allclose(near[0], 2.0, rtol=1e-5)
        np.testing.assert_allclose(far[0], 4.0, rtol=1e-5)
        assert float(far[1]) <= float(near[1])  # miss

    def test_march_hits_only_occupied(self):
        H = 32
        occ = np.zeros((H, H, H), dtype=bool)
        occ[H // 2 :, :, :] = True  # occupied half-space x >= 0
        o = jnp.asarray([[-2.0, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = raymarch.near_far_from_aabb(o, d, aabb)
        res = raymarch.march_rays(
            o, d, near, far, jnp.asarray(occ), bound=1.0, dt_gamma=0.0,
            max_steps=16, num_coarse=96, num_samples=16,
        )
        assert res.xyzs.shape == (1, 16, 3)
        valid_x = np.asarray(res.xyzs[0, :, 0])[np.asarray(res.mask[0])]
        assert (valid_x >= -2.0 / H - 1e-4).all()  # only occupied voxels sampled
        assert np.asarray(res.mask).sum() > 0

    def test_march_respects_far(self):
        H = 16
        occ = np.ones((H, H, H), dtype=bool)
        o = jnp.asarray([[0.0, 0.0, -3.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = raymarch.near_far_from_aabb(o, d, aabb)
        res = raymarch.march_rays(o, d, near, far, jnp.asarray(occ), num_coarse=64, num_samples=32)
        ts = np.asarray(res.ts[0])[np.asarray(res.mask[0])]
        # all sample start times < far
        dt = raymarch.step_size(H, 1, 16)[0]
        assert (ts - dt < float(far[0]) + 1e-5).all()


class TestComposite:
    def test_opaque_sample_dominates(self):
        R, S = 2, 8
        sigmas = jnp.zeros((R, S)).at[0, 0].set(1e5)
        rgbs = jnp.zeros((R, S, 3)).at[0, 0].set(jnp.asarray([1.0, 0.5, 0.25]))
        ambient = jnp.ones((R, S))
        deltas = jnp.full((R, S), 0.1)
        ts = jnp.cumsum(deltas, axis=-1)
        mask = jnp.ones((R, S), dtype=bool)
        out = composite.composite_rays(sigmas, rgbs, ambient, deltas, ts, mask, T_thresh=1e-4)
        np.testing.assert_allclose(out.weights_sum[0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(out.image[0], [1.0, 0.5, 0.25], rtol=1e-5)
        # ray 1: all sigma 0 -> fully transparent
        np.testing.assert_allclose(out.weights_sum[1], 0.0, atol=1e-7)
        # early termination: samples after the opaque one are NOT composited
        # -> ambient_sum counts only sample 0 for ray 0, all S for ray 1
        np.testing.assert_allclose(out.ambient_sum[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(out.ambient_sum[1], S, atol=1e-5)

    def test_matches_sequential_reference(self):
        rng = np.random.RandomState(0)
        R, S = 4, 16
        sigmas = rng.rand(R, S).astype(np.float32) * 20
        rgbs = rng.rand(R, S, 3).astype(np.float32)
        amb = rng.rand(R, S).astype(np.float32)
        deltas = np.full((R, S), 0.05, np.float32)
        ts = np.cumsum(deltas, -1)
        mask = rng.rand(R, S) > 0.3
        T_thresh = 1e-2

        # sequential CUDA-style reference
        ws_ref = np.zeros(R)
        img_ref = np.zeros((R, 3))
        d_ref = np.zeros(R)
        amb_ref = np.zeros(R)
        for r in range(R):
            T = 1.0
            for s in range(S):
                sig = sigmas[r, s] if mask[r, s] else 0.0
                alpha = 1 - np.exp(-sig * deltas[r, s])
                w = alpha * T
                img_ref[r] += w * rgbs[r, s]
                d_ref[r] += w * ts[r, s]
                ws_ref[r] += w
                if mask[r, s]:
                    amb_ref[r] += amb[r, s]
                T *= 1 - alpha
                if T < T_thresh:
                    break

        out = composite.composite_rays(
            jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(amb),
            jnp.asarray(deltas), jnp.asarray(ts), jnp.asarray(mask), T_thresh,
        )
        np.testing.assert_allclose(out.weights_sum, ws_ref, rtol=1e-4)
        np.testing.assert_allclose(out.image, img_ref, rtol=1e-4)
        np.testing.assert_allclose(out.depth, d_ref, rtol=1e-4)
        np.testing.assert_allclose(out.ambient_sum, amb_ref, rtol=1e-4)

    def test_differentiable(self):
        R, S = 2, 4
        def loss(sig):
            out = composite.composite_rays(
                sig, jnp.ones((R, S, 3)) * 0.5, jnp.zeros((R, S)),
                jnp.full((R, S), 0.1), jnp.ones((R, S)), jnp.ones((R, S), bool),
            )
            return (out.image ** 2).sum()

        g = jax.grad(loss)(jnp.ones((R, S)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_f0_coarse_roundtrip():
    f0 = jnp.asarray([0.0, 100.0, 220.0, 440.0, 880.0])
    coarse = f0_to_coarse(f0)
    assert int(coarse.min()) >= 1 and int(coarse.max()) <= 255
    back = coarse_to_f0(coarse)
    # voiced bins roundtrip within quantisation error (~2%)
    np.testing.assert_allclose(np.asarray(back[1:]), np.asarray(f0[1:]), rtol=0.03)
    assert float(back[0]) == 0.0
