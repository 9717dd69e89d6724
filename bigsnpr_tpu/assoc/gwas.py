"""Univariate GWAS regressions (the bigstatsr big_univLinReg /
big_univLogReg surface the reference builds PGS pipelines on,
e.g. reference tests/testthat/test-6-PRS.R:20, R/ldsc.R examples).

TPU design: residualize y and every genotype column against the covariate
block once (thin QR on device), then all per-SNP slopes/SEs are batched
GEMMs + elementwise math — no per-SNP loop. Logistic: per-SNP IRLS with a
fixed iteration count, vmapped over variants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy import stats as scipy_stats

import bigsnpr_tpu.config as config
from bigsnpr_tpu.core.unpack import unpack_dosage
from bigsnpr_tpu.ops.blocks import pick_block, pad_rows


@partial(jax.jit, static_argnames=("n", "precision"))
def _linreg_block_one(pb, yr, Q, n, precision):
    """Per-variant slope/SE of y ~ x for ONE block of packed variants.
    NA dosages are mean-imputed per variant (matches big_univLinReg's
    complete-data assumption on imputed FBMs). One shared program,
    dispatched host-side per block — a lax.map over blocks lowers to an
    XLA while-loop, which the tunnel-attached TPU runtime serializes
    (~0.5 s/iteration; this was 118 s of the first 50Kx100K pipeline
    run, same pathology as the round-3 snp_cor chunk scan)."""
    d, na = unpack_dosage(pb, n)                       # (block, n)
    cnt = jnp.sum(~na, axis=1)
    mean = jnp.sum(d, axis=1) / jnp.maximum(cnt, 1)
    x = jnp.where(na, mean[:, None], d)                # mean-impute
    K = Q.shape[1]
    # residualize against [1 | covar] via Q (Q includes intercept col)
    xq = jnp.dot(x, Q, preferred_element_type=jnp.float32,
                 precision=precision)                  # (block, K)
    xr = x - jnp.dot(xq, Q.T, preferred_element_type=jnp.float32,
                     precision=precision)
    sxx = jnp.sum(xr * xr, axis=1)
    sxy = jnp.dot(xr, yr, preferred_element_type=jnp.float32,
                  precision=precision)
    beta = sxy / sxx
    df = n - K - 1
    rss = jnp.sum(yr * yr) - beta * sxy
    se = jnp.sqrt(rss / df / sxx)
    return jnp.stack([beta, se])


def big_univLinReg(pack, y, covar=None, ind_row=None, block=None) -> pd.DataFrame:
    """Per-SNP linear regression y ~ x + covariates.

    Returns DataFrame(estim, std.err, score) like bigstatsr's big_univLinReg.

    TPU design: with mean-imputed NAs, per-SNP OLS after projecting out
    [1 | covar] needs only X̃ᵀ[yr | Q] (one fused decode+GEMM cprod —
    X̃ = x - mean via the operator's center) and the centered SSQ from
    colstats; no per-block decode of the dense dosage ever hits HBM.
    (The earlier per-block decode path streamed n·m f32 through HBM:
    62 s at 50Kx100K vs seconds for the cprod.)"""
    sub = pack if ind_row is None else pack.subset(ind_row=np.asarray(ind_row))
    n, m = sub.n, sub.m
    y = np.asarray(y, dtype=np.float64)
    assert len(y) == n
    C = np.ones((n, 1)) if covar is None else np.column_stack(
        [np.ones(n), np.asarray(covar)])
    Q, _ = np.linalg.qr(C)
    yr = y - Q @ (Q.T @ y)
    K = Q.shape[1]

    if hasattr(sub, "packed") and hasattr(sub, "device_packed"):
        from bigsnpr_tpu.ops.stats import snp_colstats

        st = snp_colstats(sub)
        nona = np.maximum(np.asarray(st["nona"], np.float64), 1.0)
        mean = np.asarray(st["sumX"], np.float64) / nona
        sxx_tot = np.asarray(st["denoX"], np.float64)  # sum (x - mean)^2

        if jax.default_backend() == "tpu":
            from bigsnpr_tpu.ops.pallas_kernels import PallasOperator as Op
        else:
            from bigsnpr_tpu.ops.matvec import XlaOperator as Op
        from bigsnpr_tpu.linalg.randomsvd import _cached_op

        op = _cached_op(sub, Op, mean, np.ones(m), None, None)
        V = np.column_stack([yr, Q]).astype(np.float32)    # (n, K+1)
        B = np.asarray(op.cprod(V), dtype=np.float64)      # (m, K+1)
        b_yr = B[:, 0]
        xq = B[:, 1:]                                      # Qᵀx̃ per SNP
        with np.errstate(divide="ignore", invalid="ignore"):
            sxx_r = sxx_tot - np.sum(xq * xq, axis=1)
            beta = b_yr / sxx_r
            df = n - K - 1
            rss = yr @ yr - beta * b_yr
            se = np.sqrt(rss / df / sxx_r)
    else:
        block = block or pick_block(n)
        packed, _ = pad_rows(np.asarray(sub.packed), block)
        dev = jnp.asarray(packed)
        m_pad = dev.shape[0]
        yr_d = jnp.asarray(yr, dtype=jnp.float32)
        Q_d = jnp.asarray(Q, dtype=jnp.float32)
        # host-driven block loop: dispatches queue asynchronously, one
        # device-side concat, ONE host fetch
        outs = [_linreg_block_one(dev[b0:b0 + block], yr_d, Q_d, n,
                                  config.matmul_precision)
                for b0 in range(0, m_pad, block)]
        bs = np.asarray(jnp.concatenate(outs, axis=1), dtype=np.float64)
        beta, se = bs[0, :m], bs[1, :m]
    score = beta / se
    return pd.DataFrame({"estim": beta, "std.err": se, "score": score})


@partial(jax.jit, static_argnames=("n", "niter"))
def _logreg_block_one(pb, y, C, n, niter):
    """Per-variant logistic regression y ~ x + covariates by IRLS
    (fixed niter Newton steps, vmapped over variants in one block).
    Host-dispatched per block — see _linreg_block_one for why not
    lax.map."""
    K = C.shape[1]

    def fit_one(x):
        X = jnp.concatenate([C, x[:, None]], axis=1)      # (n, K+1)

        def newton(carry, _):
            b, _ = carry
            eta = X @ b
            mu = jax.nn.sigmoid(eta)
            w = mu * (1 - mu) + 1e-12
            # Newton step: solve (X^T W X) delta = X^T (y - mu)
            H = X.T @ (X * w[:, None])
            g = X.T @ (y - mu)
            delta = jnp.linalg.solve(H, g)
            return (b + delta, H), None

        (b, H), _ = jax.lax.scan(newton, (jnp.zeros(K + 1), jnp.eye(K + 1)),
                                 None, length=niter)
        cov = jnp.linalg.inv(H)
        return b[-1], jnp.sqrt(cov[-1, -1])

    d, na = unpack_dosage(pb, n)
    cnt = jnp.sum(~na, axis=1)
    mean = jnp.sum(d, axis=1) / jnp.maximum(cnt, 1)
    x = jnp.where(na, mean[:, None], d)
    beta, se = jax.vmap(fit_one)(x)
    return jnp.stack([beta, se])


def big_univLogReg(pack, y01, covar=None, ind_row=None, block=None,
                   niter: int = 8) -> pd.DataFrame:
    """Per-SNP logistic regression (bigstatsr big_univLogReg surface)."""
    sub = pack if ind_row is None else pack.subset(ind_row=np.asarray(ind_row))
    n, m = sub.n, sub.m
    y01 = np.asarray(y01, dtype=np.float64)
    C = np.ones((n, 1)) if covar is None else np.column_stack(
        [np.ones(n), np.asarray(covar)])
    block = block or max(8, min(1024, pick_block(n) // 8))
    if hasattr(sub, "device_packed_padded"):
        dev = sub.device_packed_padded(block)
    else:
        packed, _ = pad_rows(np.asarray(sub.packed), block)
        dev = jnp.asarray(packed)
    m_pad = dev.shape[0]
    y_d = jnp.asarray(y01, dtype=jnp.float32)
    C_d = jnp.asarray(C, dtype=jnp.float32)
    outs = [_logreg_block_one(dev[b0:b0 + block], y_d, C_d, n, niter)
            for b0 in range(0, m_pad, block)]
    bs = np.asarray(jnp.concatenate(outs, axis=1), dtype=np.float64)
    beta, se = bs[0, :m], bs[1, :m]
    return pd.DataFrame({"estim": beta, "std.err": se, "score": beta / se})


def gwas_pvalues(gwas: pd.DataFrame, log10: bool = False) -> np.ndarray:
    """Two-sided p-values from z-scores (the reference's predict.mhtest)."""
    z2 = (gwas["estim"] / gwas["std.err"]) ** 2
    lp = scipy_stats.chi2.logsf(z2, df=1) / np.log(10)
    return lp if log10 else np.power(10.0, lp)
