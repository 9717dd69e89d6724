"""lassosum2: elastic-net-style coordinate descent on sparse LD.

Reference: snp_lassosum2 (R/lassosum2.R:25-81) + CD kernel
(src/lassosum2.cpp:21-70). Deterministic given (corr, df_beta, grid);
grid points vmapped on device.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from bigsnpr_tpu.ops.corr import SparseLD
from bigsnpr_tpu.pgs.gibbs import lassosum_cd
from bigsnpr_tpu.pgs.ldpred2 import _df_beta_arrays, _prep_sampler, _x64_ctx


def seq_log(a, b, n):
    """Log-spaced sequence (reference seq_log, R/SCT.R:167-171)."""
    return np.exp(np.linspace(np.log(a), np.log(b), n))


def snp_lassosum2(corr: SparseLD, df_beta, delta=(0.001, 0.01, 0.1, 1),
                  nlambda: int = 30, lambda_min_ratio: float = 0.01,
                  dfmax: float = 200e3, maxiter: int = 1000,
                  tol: float = 1e-5, ind_corr=None, blocks=None,
                  dtype="float32"):
    """Returns (beta_grid (m, n_grid), grid_param DataFrame with
    lambda/delta/num_iter/sparsity). dtype: "float32" or "float64"
    (scoped jax x64, the reference's double accumulation)."""
    beta_hat, N, scale = _df_beta_arrays(df_beta)
    dt, ctx = _x64_ctx(dtype)
    with ctx:
        return _lassosum2_impl(corr, beta_hat, N, scale, delta, nlambda,
                               lambda_min_ratio, dfmax, maxiter, tol,
                               ind_corr, blocks, dt)


def _lassosum2_impl(corr, beta_hat, N, scale, delta, nlambda,
                    lambda_min_ratio, dfmax, maxiter, tol, ind_corr,
                    blocks, dt):
    if blocks is None:
        band_sub, ind_sub, bh, nv, W, m2 = _prep_sampler(
            corr, beta_hat, N, ind_corr, dtype=dt)
    else:
        from bigsnpr_tpu.pgs.ldpred2 import _blocked_setup

        gb, bands, gidx, bb, _, _, _ = _blocked_setup(corr, blocks,
                                                      ind_corr, dt)
        m = bb.m
        assert m == len(beta_hat)

    pf = np.sqrt(np.max(N) / N)
    lambda0 = np.max(np.abs(beta_hat / pf))
    seq_lam = seq_log(lambda0, lambda_min_ratio * lambda0, nlambda + 1)[1:]
    # expand.grid order: lambda varies fastest within each delta
    del_grid, lam_grid = np.meshgrid(np.asarray(delta, dtype=np.float64),
                                     seq_lam, indexing="ij")
    lam_grid = lam_grid.ravel()
    del_grid = del_grid.ravel()

    pf_j = jnp.asarray(pf, dtype=dt)
    if blocks is None:
        run = jax.vmap(
            lambda lam, dlt: lassosum_cd(
                band_sub, ind_sub, bh,
                pf_j * lam, pf_j * dlt + 1.0,
                jnp.asarray(dfmax, dt), jnp.asarray(tol, dt),
                maxiter=maxiter, W=W, m2=m2),
            in_axes=(0, 0))
    else:
        bhj = jnp.asarray(beta_hat, dt)
        run = jax.vmap(
            lambda lam, dlt: gb.lassosum_cd_blocked(
                bands, gidx, bhj,
                pf_j * lam, pf_j * dlt + 1.0,
                jnp.asarray(dfmax, dt), jnp.asarray(tol, dt),
                maxiter=maxiter, m=len(beta_hat)),
            in_axes=(0, 0))
    betas, iters = run(jnp.asarray(lam_grid, dtype=dt),
                       jnp.asarray(del_grid, dtype=dt))
    beta_grid = np.asarray(betas, dtype=np.float64).T * scale[:, None]

    grid_param = pd.DataFrame({
        "lambda": lam_grid,
        "delta": del_grid,
        "num_iter": np.asarray(iters),
        "sparsity": np.mean(np.asarray(betas) == 0, axis=1),
    })
    return beta_grid, grid_param
