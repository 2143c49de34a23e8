// gfpp_native: host-side data-path kernels for the TPU training/inference
// runtime. The reference's native layer is CUDA compute kernels; on TPU the
// device compute lives in XLA/Pallas, and the native layer instead owns the
// host hot-path: per-step pixel gathers feeding the ray batch, bitfield
// (de)serialisation for reference-format checkpoints, and frame packing for
// the video writer.
//
// C ABI, loaded via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// Gather N pixels from an interleaved uint8 RGB image into float32 [N,3]
// scaled to [0,1]. indices are flattened row-major pixel ids.
void gather_pixels_u8(const uint8_t* img, const int64_t* indices, int64_t n,
                      float* out) {
    constexpr float kInv = 1.0f / 255.0f;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* p = img + indices[i] * 3;
        out[i * 3 + 0] = p[0] * kInv;
        out[i * 3 + 1] = p[1] * kInv;
        out[i * 3 + 2] = p[2] * kInv;
    }
}

// Multi-threaded variant for large ray batches (65536 rays/step).
void gather_pixels_u8_mt(const uint8_t* img, const int64_t* indices,
                         int64_t n, float* out, int n_threads) {
    if (n_threads <= 1 || n < 4096) {
        gather_pixels_u8(img, indices, n, out);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n ? lo + chunk : n;
        if (lo >= hi) break;
        ts.emplace_back([=] {
            gather_pixels_u8(img, indices + lo, hi - lo, out + lo * 3);
        });
    }
    for (auto& t : ts) t.join();
}

// Gather boolean mask values at pixel ids.
void gather_mask(const uint8_t* mask, const int64_t* indices, int64_t n,
                 uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = mask[indices[i]];
}

// float32 [H,W,3] in [0,1] -> uint8 RGB, clamped (video writer hot path).
void pack_frame_u8(const float* img, int64_t n_px, uint8_t* out) {
    for (int64_t i = 0; i < n_px * 3; ++i) {
        float v = img[i] * 255.0f + 0.5f;
        v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
        out[i] = static_cast<uint8_t>(v);
    }
}

// ---- morton / bitfield (reference checkpoint format) -------------------

static inline uint32_t expand_bits(uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
}

static inline uint32_t morton3(uint32_t x, uint32_t y, uint32_t z) {
    return expand_bits(x) | (expand_bits(y) << 1) | (expand_bits(z) << 2);
}

// spatial [H,H,H] float grid -> morton-order packed 1-bit/cell bitfield
// (raymarching.cu kernel_packbits semantics, LSB-first within bytes).
void pack_bitfield_spatial(const float* grid, int H, float thresh,
                           uint8_t* bitfield) {
    const int64_t n = static_cast<int64_t>(H) * H * H;
    std::memset(bitfield, 0, n / 8);
    for (int x = 0; x < H; ++x)
        for (int y = 0; y < H; ++y)
            for (int z = 0; z < H; ++z) {
                int64_t spatial = (static_cast<int64_t>(x) * H + y) * H + z;
                if (grid[spatial] > thresh) {
                    uint32_t m = morton3(x, y, z);
                    bitfield[m >> 3] |= static_cast<uint8_t>(1u << (m & 7));
                }
            }
}

// morton-order bitfield -> spatial [H,H,H] uint8 occupancy.
void unpack_bitfield_spatial(const uint8_t* bitfield, int H, uint8_t* occ) {
    for (int x = 0; x < H; ++x)
        for (int y = 0; y < H; ++y)
            for (int z = 0; z < H; ++z) {
                uint32_t m = morton3(x, y, z);
                int64_t spatial = (static_cast<int64_t>(x) * H + y) * H + z;
                occ[spatial] = (bitfield[m >> 3] >> (m & 7)) & 1;
            }
}

int gfpp_native_version() { return 1; }

}  // extern "C"
