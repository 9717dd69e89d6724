"""LDpred2: infinitesimal, grid, and auto models.

Reference: R/LDpred2.R + src/ldpred2*.cpp. The scale/unscale contract:
scale = sqrt(n_eff * beta_se^2 + beta^2); the samplers operate on
beta_hat = beta / scale and results are multiplied back
(reference R/LDpred2.R:34-41, 88-90, 139, 224-226, 257).
"""

from __future__ import annotations

from contextlib import nullcontext

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from bigsnpr_tpu.ops.corr import SparseLD
from bigsnpr_tpu.ops.ldscores import ld_scores_sfbm
from bigsnpr_tpu.pgs.band import build_band
from bigsnpr_tpu.pgs import gibbs
from bigsnpr_tpu.utils.assertions import check_args


def _x64_ctx(dtype):
    """dtype="float64" runs the sampler in f64 (reference parity beyond
    Monte-Carlo tolerance: the C++ samplers accumulate in double). Uses a
    scoped jax x64 context so the session default stays f32."""
    dtype = np.dtype(dtype)
    if dtype == np.float64:
        return dtype, jax.enable_x64(True)
    if dtype != np.float32:
        raise ValueError("dtype must be float32 or float64")
    return dtype, nullcontext()


def _df_beta_arrays(df_beta):
    beta = np.asarray(df_beta["beta"], dtype=np.float64)
    beta_se = np.asarray(df_beta["beta_se"], dtype=np.float64)
    n_eff = np.asarray(df_beta["n_eff"], dtype=np.float64)
    assert np.all(beta_se > 0), "beta_se must be positive"
    scale = np.sqrt(n_eff * beta_se**2 + beta**2)
    return beta / scale, n_eff, scale


@check_args()
def snp_ldpred2_inf(corr: SparseLD, df_beta, h2: float) -> np.ndarray:
    """Infinitesimal model: solve (R + m/(h2 N) I) x = beta_hat on the
    sparse LD (reference snp_ldpred2_inf, R/LDpred2.R:27-42). Deterministic;
    exact sparse solve."""
    assert h2 > 0
    beta_hat, N, scale = _df_beta_arrays(df_beta)
    m = corr.shape[0]
    assert len(beta_hat) == m, "corr and df_beta dims must match"
    A = corr.sym().tocsc().astype(np.float64) + sp.diags(m / (h2 * N))
    beta_inf = spla.spsolve(A, beta_hat)
    return beta_inf * scale


def _blocked_setup(corr, blocks, ind_corr, dt, shard=False, mc=False,
                   force_xla=False):
    """Build the bucketed block bands for the blocked samplers.

    blocks: array of block sizes, or "auto" to derive them — exact
    independence cuts from the LD structure, oversized blocks split via
    snp_ldsplit (the reference's recommended practice of making the LD
    block-diagonal, vignettes/LDpred2.Rmd).

    With mc=True and the Pallas path active, returns the v3 device
    layout (bands, gidx, band-center strips, meta) for the multi-chain
    width-paneled kernel; bcs/meta are None on the classic layout."""
    from bigsnpr_tpu.pgs import gibbs_blocked as gb

    if isinstance(blocks, gb.BlockBands):
        # prebuilt bands: repeated calls (grid searches, validation
        # reruns) skip the build + device upload
        bb = blocks
    else:
        if isinstance(blocks, str):
            assert blocks == "auto", f"unknown blocks mode {blocks!r}"
            blocks = gb.auto_blocks(corr, ind_corr=ind_corr)
        blocks_arr = np.asarray(blocks, dtype=np.int64)
        bb = gb.build_block_bands(corr, blocks_arr, ind_corr=ind_corr,
                                  dtype=dt)
    if bb.dropped_r2_frac > 0.05:
        import warnings

        warnings.warn(
            f"block-diagonal LD approximation drops "
            f"{100 * bb.dropped_r2_frac:.1f}% of the off-diagonal r^2 mass "
            f"at block boundaries — consider ldsplit-derived blocks "
            f"(blocks='auto') or wider blocks.", RuntimeWarning,
            stacklevel=3)
    # Pallas sweep kernel: TPU + f32 + unsharded (the XLA scan twin
    # serves CPU / f64 / GSPMD-sharded runs)
    use_pallas = (jax.default_backend() == "tpu"
                  and np.dtype(dt) == np.float32 and not shard
                  and not force_xla)
    if mc and use_pallas:
        bands, bcs, gidx, meta = bb.device_put_mc()
    else:
        bands, gidx = bb.device_put(shard=shard)
        bcs = meta = None
    return gb, bands, gidx, bb, use_pallas, bcs, meta


def _prep_sampler(corr, beta_hat, N, ind_corr, dtype=np.float32):
    band, W = build_band(corr, dtype=dtype)
    m2 = corr.shape[0]
    if ind_corr is None:
        ind_corr = np.arange(m2)
    ind_corr = np.asarray(ind_corr, dtype=np.int32)
    assert len(beta_hat) == len(ind_corr)
    band_sub = jnp.asarray(band[ind_corr])
    return (band_sub, jnp.asarray(ind_corr),
            jnp.asarray(beta_hat, dtype=dtype), jnp.asarray(N, dtype=dtype),
            W, m2)


@check_args()
def snp_ldpred2_grid(corr: SparseLD, df_beta, grid_param,
                     burn_in: int = 50, num_iter: int = 100,
                     return_sampling_betas: bool = False,
                     ind_corr=None, seed: int = 1,
                     blocks=None, dtype="float32") -> np.ndarray:
    """Grid model (reference snp_ldpred2_grid, R/LDpred2.R:73-140).

    grid_param: dict/DataFrame with p, h2, sparse columns. Returns an
    (m, n_grid) matrix of effects on the allele scale (NaN on divergence),
    or the (num_iter, m)-sampling betas when return_sampling_betas.

    dtype: "float32" (TPU-native) or "float64" (the reference's double
    accumulation — runs in a scoped jax x64 context).
    """
    beta_hat, N, scale = _df_beta_arrays(df_beta)
    dt, ctx = _x64_ctx(dtype)
    with ctx:
        if blocks is not None and not return_sampling_betas:
            return _grid_blocked(corr, beta_hat, N, scale, grid_param,
                                 burn_in, num_iter, ind_corr, seed, blocks,
                                 dt)
        band_sub, ind_sub, bh, nv, W, m2 = _prep_sampler(
            corr, beta_hat, N, ind_corr, dtype=dt)
        p_grid = np.atleast_1d(np.asarray(grid_param["p"], dtype=np.float64))
        h2_grid = np.atleast_1d(np.asarray(grid_param["h2"], dtype=np.float64))
        sp_grid = np.atleast_1d(np.asarray(grid_param["sparse"], dtype=bool))
        assert np.all(h2_grid > 0)

        key = jax.random.PRNGKey(seed)

        if return_sampling_betas:
            assert len(p_grid) == 1, "only one set of parameters allowed"
            samples = gibbs.gibbs_one_sampling(
                band_sub, ind_sub, bh, nv,
                jnp.asarray(h2_grid[0], dt), jnp.asarray(p_grid[0], dt),
                bool(sp_grid[0]), key, burn_in, num_iter, W, m2)
            return np.asarray(samples).T * scale[:, None]  # (m, num_iter)

        keys = jax.random.split(key, len(p_grid))
        run = jax.vmap(
            lambda h2, p, sprs, k: gibbs.gibbs_one(
                band_sub, ind_sub, bh, nv, h2, p, sprs, k,
                burn_in=burn_in, num_iter=num_iter, W=W, m2=m2),
            in_axes=(0, 0, 0, 0))
        out = run(jnp.asarray(h2_grid, dtype=dt),
                  jnp.asarray(p_grid, dtype=dt),
                  jnp.asarray(sp_grid), keys)          # (n_grid, m)
        return np.asarray(out).T * scale[:, None]


def _grid_blocked(corr, beta_hat, N, scale, grid_param, burn_in, num_iter,
                  ind_corr, seed, blocks, dt=np.float32):
    """Block-parallel grid sampler (LD must be block-diagonal w.r.t.
    `blocks`, e.g. from snp_ldsplit): sequential depth = max block size."""
    gb, bands, gidx, bb, use_pallas, bcs, meta = _blocked_setup(
        corr, blocks, ind_corr, dt, mc=True)
    m = bb.m
    assert m == len(beta_hat)

    p_grid = np.atleast_1d(np.asarray(grid_param["p"], dtype=np.float64))
    h2_grid = np.atleast_1d(np.asarray(grid_param["h2"], dtype=np.float64))
    sp_grid = np.atleast_1d(np.asarray(grid_param["sparse"], dtype=bool))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(p_grid))
    # all grid cells advance together through one chain-batched sweep
    # program (the reference's %dopar% process grid over 21 models,
    # R/LDpred2.R:100-114, collapsed onto one chip: cells share the band
    # tiles, so batching them into the kernel's chain axis is near-free)
    out = gb.gibbs_multi_blocked(
        bands, gidx,
        jnp.asarray(beta_hat, dt), jnp.asarray(N, dt),
        jnp.asarray(h2_grid, dt), jnp.asarray(p_grid, dt),
        jnp.asarray(sp_grid), keys,
        burn_in=burn_in, num_iter=num_iter, m=m,
        use_pallas=use_pallas, bcs=bcs, meta=meta)
    return np.asarray(out).T * scale[:, None]


@check_args()
def snp_ldpred2_auto(corr: SparseLD, df_beta, h2_init: float,
                     vec_p_init=0.1, burn_in: int = 500, num_iter: int = 200,
                     sparse: bool = False, report_step: int | None = None,
                     allow_jump_sign: bool = True, shrink_corr: float = 1.0,
                     use_MLE: bool = True, p_bounds=(1e-5, 1.0),
                     alpha_bounds=(-1.5, 0.5), ind_corr=None,
                     seed: int = 1, blocks=None,
                     shard_blocks: bool = False,
                     shard_chains: bool = False,
                     dtype="float32") -> list[dict]:
    """Auto model (reference snp_ldpred2_auto, R/LDpred2.R:203-286).

    Returns a list (over vec_p_init) of dicts with beta_est, postp_est,
    corr_est, sample_beta, path_{p,h2,alpha}_est, {h2,p,alpha}_est,
    h2_init, p_init (and beta_est_sparse when sparse=True).

    dtype: "float32" (TPU-native) or "float64" (the reference's double
    accumulation — runs in a scoped jax x64 context).

    shard_chains: partition the (embarrassingly parallel) chain axis of
    the chain-batched sampler over all available devices (requires
    blocks=, len(vec_p_init) divisible by the device count; agrees with
    the single-device chain-batched run to f32 round-off).
    """
    assert h2_init > 0
    beta_hat, N, scale = _df_beta_arrays(df_beta)
    sd = 1.0 / scale
    log_var = 2.0 * np.log(sd)
    dt, ctx = _x64_ctx(dtype)
    with ctx:
        return _ldpred2_auto_impl(
            corr, beta_hat, N, sd, log_var, h2_init, vec_p_init, burn_in,
            num_iter, sparse, report_step, allow_jump_sign, shrink_corr,
            use_MLE, p_bounds, alpha_bounds, ind_corr, seed, blocks,
            shard_blocks, dt, shard_chains=shard_chains)


def _ldpred2_auto_impl(corr, beta_hat, N, sd, log_var, h2_init, vec_p_init,
                       burn_in, num_iter, sparse, report_step,
                       allow_jump_sign, shrink_corr, use_MLE, p_bounds,
                       alpha_bounds, ind_corr, seed, blocks, shard_blocks,
                       dt, shard_chains=False):
    assert not (shard_chains and blocks is None), \
        "shard_chains requires blocks= (the chain-batched sampler)"
    if blocks is None:
        band_sub, ind_sub, bh, nv, W, m2 = _prep_sampler(
            corr, beta_hat, N, ind_corr, dtype=dt)
        lv = jnp.asarray(log_var, dtype=dt)
    if ind_corr is None:
        ind_corr_np = np.arange(corr.shape[0])
    else:
        ind_corr_np = np.asarray(ind_corr)
    # the host ld-score pass is O(nnz) (~0.7 s at 100K per call) —
    # cache per (corr, subset) so repeated auto calls pay it once
    import hashlib

    ml_key = hashlib.md5(
        np.ascontiguousarray(ind_corr_np).tobytes()).hexdigest()
    cache = getattr(corr, "_mean_ld_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(corr, "_mean_ld_cache", cache)
        except AttributeError:
            pass
    if ml_key in cache:
        mean_ld = cache[ml_key]
    else:
        mean_ld = float(np.mean(ld_scores_sfbm(corr, ind_sub=ind_corr_np)))
        cache[ml_key] = mean_ld

    if report_step is None:
        report_step = num_iter + 1

    vec_p_init = np.atleast_1d(np.asarray(vec_p_init, dtype=np.float64))
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, len(vec_p_init))

    if blocks is not None:
        chain_mesh = None
        if shard_chains:
            from jax.sharding import Mesh

            assert not shard_blocks, \
                "shard_chains and shard_blocks are mutually exclusive"
            chain_mesh = Mesh(np.asarray(jax.devices()), axis_names=("c",))
        gb, bands, gidx, bb, use_pallas, bcs, meta = _blocked_setup(
            corr, blocks, ind_corr, dt, shard=shard_blocks, mc=True,
            force_xla=shard_chains)  # the XLA twin serves GSPMD runs
        m = bb.m
        assert m == len(beta_hat)
        # all chains advance together through one chain-batched sweep
        # program (the reference's 30-process chain grid,
        # R/LDpred2.R:233-236: chains share the band tiles, so batching
        # them into the kernel's chain axis is near-free throughput)
        outs = gb.gibbs_auto_blocked_multi(
            bands, gidx,
            jnp.asarray(beta_hat, dt), jnp.asarray(N, dt),
            jnp.asarray(log_var, dt),
            jnp.asarray(vec_p_init, dt), jnp.asarray(h2_init, dt), keys,
            jnp.asarray(shrink_corr, dt),
            jnp.asarray(p_bounds, dtype=dt),
            jnp.asarray(np.asarray(alpha_bounds) + 1, dtype=dt),
            jnp.asarray(mean_ld, dt),
            burn_in=burn_in, num_iter=num_iter, m=m,
            report_step=report_step, use_mle=use_MLE,
            no_jump_sign=not allow_jump_sign,
            use_pallas=use_pallas, bcs=bcs, meta=meta,
            chain_mesh=chain_mesh)
        # one host transfer per key (per-chain np.asarray(v[c]) would be
        # 7 x n_chains separate tunnel round-trips); sample_beta is
        # all-zeros when no reports were requested — synthesize it
        # host-side instead of pulling (NC, 1, m) through the ~30 MB/s
        # downlink (the fetch, not the sweeps, dominated short runs —
        # round-5 bisection)
        no_reports = report_step > num_iter
        outs_np = {k2: (np.zeros(v.shape, np.float64)
                        if k2 == "sample_beta" and no_reports
                        else np.asarray(v, dtype=np.float64))
                   for k2, v in outs.items()}
        results = []
        for c in range(len(vec_p_init)):
            res = {k2: v[c] for k2, v in outs_np.items()}
            res["beta_est"] = res["beta_est"] / sd
            res["h2_est"] = float(np.mean(res["path_h2_est"][-num_iter:]))
            res["p_est"] = float(np.mean(res["path_p_est"][-num_iter:]))
            res["alpha_est"] = float(np.mean(res["path_alpha_est"][-num_iter:]))
            res["h2_init"] = h2_init
            res["p_init"] = float(vec_p_init[c])
            res["dropped_r2_frac"] = bb.dropped_r2_frac
            results.append(res)
        if sparse:
            # post-hoc sparse solutions, same contract as the unblocked
            # branch (reference R/LDpred2.R:266-279) — batched over the
            # chains whose h2 estimate is finite
            live = [c for c in range(len(results))
                    if np.isfinite(results[c]["h2_est"])]
            if live:
                bg = gb.gibbs_multi_blocked(
                    bands, gidx,
                    jnp.asarray(beta_hat, dt), jnp.asarray(N, dt),
                    jnp.asarray([results[c]["h2_est"] for c in live], dt),
                    jnp.asarray([results[c]["p_est"] for c in live], dt),
                    jnp.ones(len(live), bool),
                    jnp.stack([jax.random.fold_in(keys[c], 12345)
                               for c in live]),
                    burn_in=50, num_iter=100, m=m,
                    use_pallas=use_pallas, bcs=bcs, meta=meta)
                for i, c in enumerate(live):
                    results[c]["beta_est_sparse"] = \
                        np.asarray(bg[i], np.float64) / sd
        return results

    run = jax.vmap(
        lambda p0, k: gibbs.gibbs_auto(
            band_sub, ind_sub, bh, nv, lv,
            p0, jnp.asarray(h2_init, dt), k,
            jnp.asarray(shrink_corr, dt),
            jnp.asarray(p_bounds, dtype=dt),
            jnp.asarray(np.asarray(alpha_bounds) + 1, dtype=dt),
            jnp.asarray(mean_ld, dt),
            burn_in=burn_in, num_iter=num_iter, report_step=report_step,
            W=W, m2=m2, use_mle=use_MLE,
            no_jump_sign=not allow_jump_sign),
        in_axes=(0, 0))
    outs = run(jnp.asarray(vec_p_init, dtype=dt), keys)

    results = []
    for c in range(len(vec_p_init)):
        res = {k: np.asarray(v[c], dtype=np.float64) for k, v in outs.items()}
        res["beta_est"] = res["beta_est"] / sd
        res["h2_est"] = float(np.mean(res["path_h2_est"][-num_iter:]))
        res["p_est"] = float(np.mean(res["path_p_est"][-num_iter:]))
        res["alpha_est"] = float(np.mean(res["path_alpha_est"][-num_iter:]))
        res["h2_init"] = h2_init
        res["p_init"] = float(vec_p_init[c])
        if sparse and np.isfinite(res["h2_est"]):
            bg = gibbs.gibbs_one(
                band_sub, ind_sub, bh, nv,
                jnp.asarray(res["h2_est"], dt), jnp.asarray(res["p_est"], dt),
                True, jax.random.fold_in(keys[c], 12345),
                burn_in=50, num_iter=100, W=W, m2=m2)
            res["beta_est_sparse"] = np.asarray(bg, dtype=np.float64) / sd
        results.append(res)
    return results


def ldpred2_auto_chain_qc(multi_auto, quantile: float = 0.95):
    """Vignette chain-QC rule (reference vignettes/LDpred2.Rmd:421-431):
    keep chains whose corr_est range exceeds 0.95 * the `quantile`-th
    quantile of ranges. Returns (keep_mask, beta_auto = mean over kept).

    Calibrated for ~30 chains (the vignette's vec_p_init length); with
    only a handful of chains the quantile rule is aggressive."""
    ranges = np.array([
        (np.nanmax(r["corr_est"]) - np.nanmin(r["corr_est"]))
        if np.isfinite(r["corr_est"]).any() else np.nan
        for r in multi_auto
    ])
    thr = 0.95 * np.nanquantile(ranges, quantile)
    keep = ranges > thr
    if keep.any():
        beta_auto = np.mean([multi_auto[i]["beta_est"]
                             for i in np.nonzero(keep)[0]], axis=0)
    else:
        beta_auto = np.full_like(multi_auto[0]["beta_est"], np.nan)
    return keep, beta_auto
