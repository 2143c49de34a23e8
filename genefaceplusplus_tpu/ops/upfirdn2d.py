"""upfirdn2d (upsample -> FIR filter -> downsample) and conv2d_resample in XLA.

Parity: /root/reference/modules/eg3ds/torch_utils/ops/upfirdn2d.py
(_upfirdn2d_ref semantics) and conv2d_resample.py:48-152 (generic fallback
path — the "fast paths" there are CUDA performance forks of the same math).

TPU-native: zero-insertion upsampling IS `lhs_dilation` of
lax.conv_general_dilated, so upfirdn2d maps to exactly ONE depthwise conv —
no custom kernel needed; XLA fuses it with neighbouring ops.

Layout: NHWC (TPU-preferred). Filters are 1D separable or 2D numpy arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
from jax import lax


def setup_filter(f: Sequence[float], normalize: bool = True, gain: float = 1.0) -> np.ndarray:
    """1D taps -> normalised 2D filter (reference setup_filter, separable)."""
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 1:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    return f * gain


def _parse_padding(padding: Union[int, Sequence[int]]):
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def upfirdn2d(
    x: jnp.ndarray,  # [N, H, W, C]
    f: Optional[np.ndarray],
    up: int = 1,
    down: int = 1,
    padding: Union[int, Sequence[int]] = 0,
    gain: float = 1.0,
    flip_filter: bool = False,
) -> jnp.ndarray:
    """Zero-insert upsample by `up`, pad, FIR filter, downsample by `down`."""
    px0, px1, py0, py1 = _parse_padding(padding)
    C = x.shape[-1]
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    if not flip_filter:
        f = f[::-1, ::-1]  # conv (reference flips when flip_filter=False)
    f = f * gain
    # depthwise filter [kh, kw, 1, C]... feature_group_count=C wants [kh,kw,1,C]
    kern = jnp.asarray(np.tile(f[:, :, None, None], (1, 1, 1, C)), dtype=x.dtype)
    # torch zero-insertion upsampling appends up-1 trailing zeros (size n*up);
    # lax lhs_dilation gives (n-1)*up+1 — fold the difference into after-pad
    return lax.conv_general_dilated(
        x,
        kern,
        window_strides=(down, down),
        padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upsample2d(x: jnp.ndarray, f: np.ndarray, up: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """2x (or `up`x) FIR upsampling (reference upsample2d)."""
    fw = f.shape[-1]
    p0 = (fw + up - 1) // 2
    p1 = (fw - up) // 2
    return upfirdn2d(x, f, up=up, padding=(p0, p1, p0, p1), gain=gain * up * up)


def downsample2d(x: jnp.ndarray, f: np.ndarray, down: int = 2, gain: float = 1.0) -> jnp.ndarray:
    fw = f.shape[-1]
    p0 = (fw - down + 1) // 2
    p1 = (fw - down) // 2
    return upfirdn2d(x, f, down=down, padding=(p0, p1, p0, p1), gain=gain)


def conv2d_resample(
    x: jnp.ndarray,  # [N, H, W, C_in]
    w: jnp.ndarray,  # [kh, kw, C_in/groups, C_out] (HWIO)
    f: Optional[np.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: Union[int, Sequence[int]] = 0,
    groups: int = 1,
    flip_weight: bool = True,
) -> jnp.ndarray:
    """Conv with optional FIR up/downsampling (generic reference path,
    conv2d_resample.py:141-148 — equivalent to every fast path)."""
    fw = f.shape[-1] if f is not None else 1
    fh = f.shape[-2] if f is not None else 1
    px0, px1, py0, py1 = _parse_padding(padding)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    x = upfirdn2d(x, f if up > 1 else None, up=up, padding=(px0, px1, py0, py1), gain=up ** 2)
    if not flip_weight and (w.shape[0] > 1 or w.shape[1] > 1):
        w = jnp.flip(w, axis=(0, 1))
    x = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if down > 1:
        x = upfirdn2d(x, f, down=down)
    return x
