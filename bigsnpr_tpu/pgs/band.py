"""Banded device representation of the sparse LD matrix.

The reference's SFBM column access `incr_mult_col(j, dotprods, diff)`
(bigsparser, used at src/ldpred2.cpp:62 etc.) becomes a fixed-width
banded row: because snp_cor only ever links variants within a position
window (src/corr.cpp:52-53), every column's support lies in [j-W, j+W].
The samplers then update a W-padded dotprods vector with one
dynamic_update_slice per variant — a VPU-friendly AXPY.
"""

from __future__ import annotations

import numpy as np

from bigsnpr_tpu.ops.corr import SparseLD


def build_band(corr: SparseLD, dtype=np.float32):
    """SparseLD -> (band (m2, 2W+1), W). band[j, W+d] = R[j, j+d]."""
    S = corr.sym().tocoo()
    m2 = S.shape[0]
    if S.nnz == 0:
        band = np.zeros((m2, 1), dtype=dtype)
        return band, 0
    offs = S.col - S.row
    W = int(np.abs(offs).max())
    band = np.zeros((m2, 2 * W + 1), dtype=dtype)
    band[S.row, W + offs] = S.data
    return band, W
