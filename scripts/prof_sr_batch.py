"""Does batching the SR stage across a chunk's frames beat per-frame SR?

Per-frame SR runs convs at batch 1 inside the chunk scan; batch-1 convs can
underutilize the MXU. Compare:
  a) scan over B frames, SR inside the body (production today)
  b) ONE batched SR call on [B, oh, ow, 3]
both on the production outer-rect crop shape. Run on the TPU.
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genefaceplusplus_tpu.models.superresolution import Superresolution

B = int(os.environ.get("B", "8"))
OH, OW = 208, 256  # bench-scene SR outer rect
sr = Superresolution(channels=3, input_resolution=256, dtype=jnp.bfloat16)
params = sr.init(jax.random.PRNGKey(0), jnp.zeros((1, OH, OW, 3)))
x = jax.random.uniform(jax.random.PRNGKey(1), (B, OH, OW, 3))


@jax.jit
def per_frame(params, x):
    def body(carry, xi):
        y = sr.apply(params, xi[None], noise_offset=(48, 0))[0]
        return carry + y.sum(), ()
    tot, _ = jax.lax.scan(body, 0.0, x)
    return tot


@jax.jit
def batched(params, x):
    return sr.apply(params, x, noise_offset=(48, 0)).sum()


def timeit(fn, label, reps=5):
    float(fn(params, x))
    best = float("inf")
    for k in range(1, reps + 1):
        xk = x + 0.01 * k
        t0 = time.perf_counter()
        float(fn(params, xk))
        best = min(best, time.perf_counter() - t0 - 0.026)
    ms = best / B * 1000
    print(f"{label:28s} {ms:6.3f} ms/frame  ({best*1000:.2f} ms / {B} frames)")
    return ms


if __name__ == "__main__":
    a = timeit(per_frame, f"per-frame SR in scan (B={B})")
    b = timeit(batched, f"batched SR (B={B})")
    print(f"speedup: {a / b:.2f}x")
