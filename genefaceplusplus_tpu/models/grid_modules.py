"""flax wrappers that own grid-encoder embedding tables as params."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from genefaceplusplus_tpu.ops.grid_encoder import GridSpec, grid_encode


class GridEncoder(nn.Module):
    """Owns the [n_rows, level_dim] embedding table; init U(-1e-4, 1e-4)
    (reference grid.py:141-143)."""

    spec: GridSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
        emb = self.param(
            "embeddings",
            lambda key: jax.random.uniform(
                key, (self.spec.n_rows, self.spec.level_dim), minval=-1e-4, maxval=1e-4
            ),
        )
        return grid_encode(x, emb, self.spec, bound=bound)
