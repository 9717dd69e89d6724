"""pcadapt outlier scan + the K-regression kernel.

Reference: snp_pcadapt / bed_pcadapt (R/pcadapt.R:3-79) on top of
multLinReg (src/multLinReg.cpp:9-86): K simultaneous per-SNP univariate
regressions of PC loadings on genotype, NA-aware t-scores -> robust
Mahalanobis (dist_ogk) -> chi2_K log-p, wrapped with genomic control.

TPU design: the per-variant scalar loop becomes one blocked GEMM of the
NA-masked genotype planes against [U, U^2, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bigsnpr_tpu.config as config
from bigsnpr_tpu.core.unpack import unpack_dosage
from bigsnpr_tpu.ops.blocks import pick_block, pad_rows
from bigsnpr_tpu.assoc.mhtest import MHTest, chisq_log10_predictor, snp_gc
from bigsnpr_tpu.pca.robust import dist_ogk


@partial(jax.jit, static_argnames=("n", "block", "precision"))
def _mult_lin_reg_blocked(packed, U, n, block, precision):
    """t-scores of U_k ~ x per variant (reference src/multLinReg.cpp:9-60)."""
    m_pad, nb = packed.shape
    blocks = packed.reshape(m_pad // block, block, nb)
    Usq = U * U

    def body(pb):
        d, na = unpack_dosage(pb, n)            # (block, n), NA -> 0
        mask = (~na).astype(jnp.float32)
        nona = jnp.sum(mask, axis=1)
        xSum = jnp.sum(d, axis=1)
        xxSum = jnp.sum(d * d, axis=1)
        xy = jnp.dot(d, U, preferred_element_type=jnp.float32,
                     precision=precision)       # (block, K)
        ySum = jnp.dot(mask, U, preferred_element_type=jnp.float32,
                       precision=precision)
        yySum = jnp.dot(mask, Usq, preferred_element_type=jnp.float32,
                        precision=precision)
        num = xy - xSum[:, None] * ySum / nona[:, None]
        deno_x = xxSum - xSum**2 / nona
        deno_y = yySum - ySum**2 / nona[:, None]
        deno = deno_x[:, None] * deno_y - num * num
        bad = (deno <= 0) | (nona[:, None] < 2)
        t = num * jnp.sqrt(jnp.where(bad, 0, (nona[:, None] - 2) /
                                     jnp.where(deno == 0, 1, deno)))
        return jnp.where(bad, jnp.nan, t)

    out = jax.lax.map(body, blocks)
    return out.reshape(m_pad, -1)


def mult_lin_reg(pack, U, ind_row=None, block=None) -> np.ndarray:
    """(m, K) t-scores."""
    sub = pack if ind_row is None else pack.subset(ind_row=np.asarray(ind_row))
    n, m = sub.n, sub.m
    U = np.atleast_2d(np.asarray(U, dtype=np.float64))
    if U.shape[0] != n:
        U = U.T
    assert U.shape[0] == n
    block = block or pick_block(n)
    packed, _ = pad_rows(np.asarray(sub.packed), block)
    out = _mult_lin_reg_blocked(
        jnp.asarray(packed), jnp.asarray(U, dtype=jnp.float32), n, block,
        config.matmul_precision)
    return np.asarray(out, dtype=np.float64)[:m]


def snp_pcadapt(pack, U_row, ind_row=None, ind_col=None) -> MHTest:
    """Reference snp_pcadapt (R/pcadapt.R:3-79), GC-corrected."""
    sub = pack if ind_col is None else pack.subset(ind_col=np.asarray(ind_col))
    U = np.atleast_2d(np.asarray(U_row, dtype=np.float64))
    if U.shape[0] != (sub.n if ind_row is None else len(ind_row)):
        U = U.T
    K = U.shape[1]
    t = mult_lin_reg(sub, U, ind_row=ind_row)
    if K == 1:
        ts = t[:, 0]
        dist = (ts - np.nanmedian(ts)) ** 2
    else:
        dist = dist_ogk(np.nan_to_num(t))
    gwas = MHTest(score=dist, predict=chisq_log10_predictor(K))
    return snp_gc(gwas)


bed_pcadapt = snp_pcadapt
