"""Genetic relationship matrix (GRM) / tcrossprod.

Reference: bed_tcrossprodSelf (R/bed-tcrossprodSelf.R:21-52): blocked
X̃ X̃ᵀ with per-block scaling accumulated on disk. TPU: one scan over
variant blocks, each block a fused decode + rank-B GEMM update of the
(n, n) accumulator in HBM — the MXU-densest op in the framework.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bigsnpr_tpu.config as config
from bigsnpr_tpu.core.unpack import unpack_standardized
from bigsnpr_tpu.ops.blocks import pick_block, pad_rows
from bigsnpr_tpu.ops.stats import bed_scaleBinom


@partial(jax.jit, static_argnames=("n", "block", "precision"))
def _grm_blocked(packed, center, scale, n, block, precision):
    m_pad, nb = packed.shape
    nblocks = m_pad // block
    blocks = packed.reshape(nblocks, block, nb)
    c = center.reshape(nblocks, block)
    s = scale.reshape(nblocks, block)

    def body(acc, args):
        pb, cb, sb = args
        xt = unpack_standardized(pb, n, cb, sb)  # (block, n)
        acc = acc + jnp.dot(xt.T, xt, preferred_element_type=jnp.float32,
                            precision=precision)
        return acc, None

    acc, _ = jax.lax.scan(body, jnp.zeros((n, n), jnp.float32), (blocks, c, s))
    return acc


def bed_tcrossprodSelf(pack, fun_scaling=bed_scaleBinom, ind_row=None,
                       ind_col=None, block=None):
    """(n, n) GRM-style matrix X̃ X̃ᵀ; returns (K, center, scale)."""
    sub = pack
    if ind_row is not None or ind_col is not None:
        sub = pack.subset(ind_row=ind_row, ind_col=ind_col)
    sc = fun_scaling(sub)
    center = np.asarray(sc["center"], dtype=np.float64)
    scale = np.asarray(sc["scale"], dtype=np.float64)
    ok = scale > 0
    safe_scale = np.where(ok, scale, 1.0)

    n = sub.n
    block = block or pick_block(n)
    packed, _ = pad_rows(np.asarray(sub.packed), block)
    # monomorphic columns already standardize to 0 (x == center = 2*af),
    # so safe_scale=1 is enough; pad variants decode as dosage 2 -> center 2
    c, _ = pad_rows(center.astype(np.float32), block, fill=2)
    s, _ = pad_rows(safe_scale.astype(np.float32), block, fill=1)
    K = _grm_blocked(jnp.asarray(packed), jnp.asarray(c), jnp.asarray(s),
                     n, block, config.matmul_precision)
    return np.asarray(K, dtype=np.float64), center, scale


def bed_GRM(pack, **kw):
    """GRM normalized by the number of variants."""
    K, center, scale = bed_tcrossprodSelf(pack, **kw)
    return K / pack.m
