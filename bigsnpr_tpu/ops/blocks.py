"""Variant-block streaming helpers.

All genotype ops stream over variant blocks: each block of packed bytes is
decoded on-device (2-bit -> standardized f32) and immediately consumed, so
the 16x-inflated dense matrix never materializes in HBM — the TPU analog of
the reference's single-pass mmap'd kernels (reference src/*.cpp, OpenMP
`parallel for` over columns, e.g. src/bed-prod-vec.cpp:29-51).
"""

from __future__ import annotations

import numpy as np


def pick_block(n: int, target_bytes: int = 256 * 1024 * 1024, lo: int = 8,
               hi: int = 16384) -> int:
    """Variant-block size so one decoded f32 block is ~target_bytes."""
    b = max(lo, min(hi, target_bytes // max(1, 4 * n)))
    # keep it a multiple of 8 for clean tiling
    return max(lo, (b // 8) * 8)


def pad_rows(arr: np.ndarray, multiple: int, fill=0):
    """Pad axis 0 to a multiple; returns (padded, original_len)."""
    import jax.numpy as jnp

    m = arr.shape[0]
    pad = (-m) % multiple
    if pad == 0:
        return arr, m
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    if isinstance(arr, np.ndarray):
        return np.pad(arr, widths, constant_values=fill), m
    return jnp.pad(arr, widths, constant_values=fill), m
