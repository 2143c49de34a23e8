"""Multi-resolution tiled/hash grid encoder (instant-NGP family) — XLA reference.

Behavioural parity with the reference CUDA gridencoder:
  * /root/reference/modules/radnerfs/encoders/gridencoder/grid.py:96-164
    (level layout, offsets, per_level_scale resolution schedule, init)
  * /root/reference/modules/radnerfs/encoders/gridencoder/src/gridencoder.cu:50-160
    (get_grid_index dense-until-overflow + fast_hash, position math
    ``pos = x*scale + 0.5`` with ``scale = exp2(level*S)*H - 1``, linear /
    smoothstep interpolation, out-of-[0,1] inputs -> zero output)

TPU-first design: all (level, corner) gathers are fused into ONE
``jnp.take`` over a [N, L*2^D] index tensor followed by a weighted reduce —
a single XLA gather, the fastest table-lookup form measured on TPU
(docs/DESIGN.md "gather-bound" table: ~7 ns/element; the hardware has no
cross-vreg vector gather, so no Pallas kernel beats it). Backward
(scatter-add to embeddings + input grads) comes from JAX autodiff of the
gather. This structural cost is why the flagship default is the Fourier
field (`grid_type: fourier`); the grid path exists for reference parity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

_PRIMES = np.array(
    [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737],
    dtype=np.uint32,
)


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static configuration of a grid encoder (one per field)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    per_level_scale: float = 2.0
    log2_hashmap_size: int = 19
    gridtype: str = "tiled"  # 'tiled' | 'hash'
    align_corners: bool = False
    interpolation: str = "linear"  # 'linear' | 'smoothstep'
    offsets: Tuple[int, ...] = ()  # L+1 row offsets into the embedding table

    @classmethod
    def create(
        cls,
        input_dim: int = 3,
        num_levels: int = 16,
        level_dim: int = 2,
        base_resolution: int = 16,
        per_level_scale: float = 2.0,
        log2_hashmap_size: int = 19,
        desired_resolution: float | None = None,
        gridtype: str = "tiled",
        align_corners: bool = False,
        interpolation: str = "linear",
    ) -> "GridSpec":
        if desired_resolution is not None:
            per_level_scale = float(
                np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
            )
        max_params = 2 ** log2_hashmap_size
        offsets = [0]
        offset = 0
        for lvl in range(num_levels):
            resolution = int(np.ceil(base_resolution * per_level_scale ** lvl))
            n = min(max_params, (resolution if align_corners else resolution + 1) ** input_dim)
            n = int(np.ceil(n / 8) * 8)  # 8-row alignment (grid.py:127)
            offset += n
            offsets.append(offset)
        return cls(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            per_level_scale=per_level_scale,
            log2_hashmap_size=log2_hashmap_size,
            gridtype=gridtype,
            align_corners=align_corners,
            interpolation=interpolation,
            offsets=tuple(offsets),
        )

    @property
    def n_rows(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_resolution(self, level: int) -> int:
        # CUDA kernel semantics: scale = exp2(level*S)*H - 1; res = ceil(scale)+1
        s = math.log2(self.per_level_scale)
        scale = math.exp2(level * s) * self.base_resolution - 1.0
        return int(math.ceil(scale)) + 1

    def level_scale(self, level: int) -> float:
        s = math.log2(self.per_level_scale)
        return math.exp2(level * s) * self.base_resolution - 1.0


def init_grid_embeddings(key, spec: GridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init (grid.py:141-143); shape [n_rows, level_dim]."""
    import jax

    return jax.random.uniform(
        key, (spec.n_rows, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_bits(num_corners: int, input_dim: int) -> np.ndarray:
    """[K, D] binary corner offsets for the 2^D interpolation cell."""
    bits = np.zeros((num_corners, input_dim), dtype=np.int32)
    for c in range(num_corners):
        for d in range(input_dim):
            bits[c, d] = (c >> d) & 1
    return bits


def grid_indices_and_weights(x01: jnp.ndarray, spec: GridSpec):
    """Compute gather indices + interpolation weights for all levels/corners.

    Args:
      x01: [N, D] coordinates in [0, 1].
    Returns:
      rows: [N, L*K] int32 rows into the [n_rows, C] embedding table.
      weights: [N, L*K] f32 interpolation weights (0 where input OOB).
    """
    N, D = x01.shape
    assert D == spec.input_dim
    K = 2 ** D
    bits = _corner_bits(K, D)  # [K, D] numpy

    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # [N]

    all_rows = []
    all_w = []
    for lvl in range(spec.num_levels):
        scale = spec.level_scale(lvl)
        res = spec.level_resolution(lvl)
        hashmap_size = spec.offsets[lvl + 1] - spec.offsets[lvl]
        stride_dim = res if spec.align_corners else res + 1

        pos = x01.astype(jnp.float32) * scale + (0.0 if spec.align_corners else 0.5)
        pg = jnp.floor(pos)
        frac = pos - pg
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pg = pg.astype(jnp.int32)

        # static decision: which dims fit the dense stride, and whether the
        # dense index overflows the table (gridencoder.cu:67-84)
        strides = []
        stride = 1
        for _ in range(D):
            strides.append(stride if stride <= hashmap_size else 0)
            stride *= stride_dim
        dense_overflow = stride > hashmap_size

        for c in range(K):
            corner = pg + bits[c][None, :]  # [N, D]
            cu = corner.astype(jnp.uint32)
            if spec.gridtype == "hash" and dense_overflow:
                idx = jnp.zeros((N,), dtype=jnp.uint32)
                for d in range(D):
                    idx = idx ^ (cu[:, d] * _PRIMES[d])
            else:
                idx = jnp.zeros((N,), dtype=jnp.uint32)
                for d in range(D):
                    if strides[d]:
                        idx = idx + cu[:, d] * jnp.uint32(strides[d])
            row = (idx % jnp.uint32(hashmap_size)).astype(jnp.int32) + spec.offsets[lvl]

            w = jnp.ones((N,), dtype=jnp.float32)
            for d in range(D):
                wd = jnp.where(bits[c, d] == 1, frac[:, d], 1.0 - frac[:, d])
                w = w * wd
            all_rows.append(row)
            all_w.append(jnp.where(oob, 0.0, w))

    rows = jnp.stack(all_rows, axis=-1)  # [N, L*K]
    weights = jnp.stack(all_w, axis=-1)  # [N, L*K]
    return rows, weights


def grid_encode(x: jnp.ndarray, embeddings: jnp.ndarray, spec: GridSpec, bound: float = 1.0) -> jnp.ndarray:
    """Encode coords in [-bound, bound]^D -> [N, L*C] features.

    Matches GridEncoder.forward (grid.py:148-164): maps to [0,1], gathers
    2^D corners per level, interpolates; feature layout is level-major.
    """
    prefix = x.shape[:-1]
    x01 = (x.reshape(-1, spec.input_dim) + bound) / (2.0 * bound)
    rows, weights = grid_indices_and_weights(x01, spec)
    K = 2 ** spec.input_dim
    gathered = jnp.take(embeddings, rows, axis=0)  # [N, L*K, C]
    w = weights.astype(embeddings.dtype)[..., None]  # [N, L*K, 1]
    feats = (gathered * w).reshape(x01.shape[0], spec.num_levels, K, spec.level_dim).sum(axis=2)
    return feats.reshape(*prefix, spec.output_dim)
