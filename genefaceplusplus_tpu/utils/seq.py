"""Sequence collation / padding utilities.

Parity: collate_1d/2d and padding helpers,
/root/reference/utils/commons/dataset_utils.py:29-78 — used when batching
variable-length audio/motion clips (the a2m training path).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def collate_1d(values: List[np.ndarray], pad_value: float = 0.0,
               max_len: Optional[int] = None) -> np.ndarray:
    """List of [T_i] -> [B, max_T] padded."""
    size = max_len or max(len(v) for v in values)
    out = np.full((len(values), size), pad_value, dtype=np.asarray(values[0]).dtype)
    for i, v in enumerate(values):
        out[i, : len(v)] = v
    return out


def collate_2d(values: List[np.ndarray], pad_value: float = 0.0,
               max_len: Optional[int] = None) -> np.ndarray:
    """List of [T_i, C] -> [B, max_T, C] padded."""
    size = max_len or max(len(v) for v in values)
    C = np.asarray(values[0]).shape[1]
    out = np.full((len(values), size, C), pad_value, dtype=np.asarray(values[0]).dtype)
    for i, v in enumerate(values):
        out[i, : len(v)] = v
    return out


def sequence_mask(lengths: np.ndarray, max_len: Optional[int] = None) -> np.ndarray:
    """[B] lengths -> [B, T] bool mask."""
    size = max_len or int(np.max(lengths))
    return np.arange(size)[None, :] < np.asarray(lengths)[:, None]


def expand_by_repeat_times(x: np.ndarray, repeats: np.ndarray) -> np.ndarray:
    """Repeat each row x[i] repeats[i] times along axis 0 (seq_utils parity)."""
    return np.repeat(x, repeats, axis=0)
