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


def _phase_slices(ch: int, up: int, pad_lo: int):
    """Per-output-phase 1D slices of a combined up-conv kernel.

    For y = conv_VALID(pad(dilate_up(x), pad_lo, ...), c), output phase p
    (y index t = up*m + p) only touches kernel taps s with
    (p + s - pad_lo) % up == 0, at input index m + (p + s - pad_lo)/up.
    Returns [(taps_idx, delta)] per phase where delta is the input offset of
    the phase kernel's first tap.
    """
    out = []
    for p in range(up):
        rho = (pad_lo - p) % up
        taps = list(range(rho, ch, up))
        delta = (p + rho - pad_lo) // up
        out.append((taps, delta))
    return out


def _conv2d_up_subpixel(x, c, up, py0, py1, px0, px1):
    """Up-`up` conv with combined kernel c as ONE stride-1 conv at the INPUT
    resolution + depth-to-space (subpixel decomposition).

    XLA lowers `lhs_dilation` convs by materialising the zero-inserted
    input — up^2 x the FLOPs and a full high-res intermediate (measured
    6.2 ms vs 4.3 ms for the SR stage). The subpixel form computes the same
    values phase-by-phase: each of the up^2 output phases is a stride-1
    cross-correlation of x with a stride-`up` slice of c, so one conv with
    up^2*O output channels at the input resolution followed by a free
    reshape reproduces conv_transpose exactly (verified bit-close in
    tests/test_superresolution.py). Returns None when the geometry doesn't
    decompose (output size not a multiple of `up`), falling back to the
    generic path.
    """
    N, H, W, I = x.shape
    ch, cw, _, O = c.shape
    out_h = (H - 1) * up + 1 + py0 + py1 - ch + 1
    out_w = (W - 1) * up + 1 + px0 + px1 - cw + 1
    if out_h % up or out_w % up or out_h <= 0 or out_w <= 0:
        return None
    ph = _phase_slices(ch, up, py0)
    pw = _phase_slices(cw, up, px0)
    # common input window per axis: [delta_min, delta_min + L)
    dh_min = min(d for _, d in ph)
    Lh = max(d + len(t) for t, d in ph) - dh_min
    dw_min = min(d for _, d in pw)
    Lw = max(d + len(t) for t, d in pw) - dw_min
    mh = out_h // up - 1  # max per-phase output index
    mw = out_w // up - 1
    pad_top = -dh_min
    pad_bot = (mh + dh_min + Lh) - H
    pad_left = -dw_min
    pad_right = (mw + dw_min + Lw) - W
    if min(pad_top, pad_bot, pad_left, pad_right) < 0:
        return None  # negative padding: let the generic path crop instead
    # kernel [Lh, Lw, I, up*up*O]: phase (p, q) lives at channel (p*up+q)*O+o
    K = jnp.zeros((Lh, Lw, I, up * up * O), dtype=c.dtype)
    for p, (th, dh) in enumerate(ph):
        for q, (tw, dw) in enumerate(pw):
            sub = c[jnp.asarray(th)][:, jnp.asarray(tw)]  # [lh, lw, I, O]
            oh = dh - dh_min
            ow = dw - dw_min
            K = K.at[oh:oh + len(th), ow:ow + len(tw), :,
                     (p * up + q) * O:(p * up + q + 1) * O].set(sub)
    z = lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (pad_top, pad_bot), (pad_left, pad_right), (0, 0))),
        K,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [N, out_h/up, out_w/up, up*up*O]
    z = z.reshape(N, out_h // up, out_w // up, up, up, O)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(N, out_h, out_w, O)


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

    if up > 1 and down == 1 and f is not None and groups == 1:
        # TPU fast path: fold the depthwise FIR into the conv weights and
        # emit ONE lhs-dilated conv. Two chained cross-correlations compose
        # as x (*) a (*) b == x (*) conv_full(a, b), so the 4x4 FIR and the
        # 3x3 conv become a single 6x6 kernel — this removes the entire
        # zero-inserted 512^2 depthwise pass (measured ~1.5 ms/frame on the
        # SR stage, docs/DESIGN.md). Bit-equivalent to the generic path
        # modulo float summation order (tests/test_superresolution.py).
        a = np.asarray(f, dtype=np.float32)[::-1, ::-1] * (up ** 2)  # upfirdn flip_filter=False
        b = jnp.flip(w, axis=(0, 1)) if not flip_weight and (w.shape[0] > 1 or w.shape[1] > 1) else w
        kh, kw = b.shape[0], b.shape[1]
        fh_, fw_ = a.shape
        c = jnp.zeros((fh_ + kh - 1, fw_ + kw - 1) + b.shape[2:], dtype=jnp.float32)
        for u in range(fh_):  # static tiny loop, traced once
            for v in range(fw_):
                c = c.at[u:u + kh, v:v + kw].add(a[u, v] * b.astype(jnp.float32))
        y = _conv2d_up_subpixel(x, c.astype(x.dtype), up,
                                py0, py1 + up - 1, px0, px1 + up - 1)
        if y is not None:
            return y
        return lax.conv_general_dilated(
            x,
            c.astype(x.dtype),
            window_strides=(1, 1),
            padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
            lhs_dilation=(up, up),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

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
