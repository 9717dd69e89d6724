"""Chain-batched samplers == per-chain loops (round-4 verdict #1).

The reference runs 30 auto chains / 21 grid models as concurrent
processes (R/LDpred2.R:100-114,233-236). The chain-batched kernels run
them through one sweep program with a leading chain axis; the RNG
stream per chain is unchanged, so results must match the per-chain
loop bit-for-bit (XLA) / to f32 round-off (Pallas interpret).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from bigsnpr_tpu.ops.corr import SparseLD
from bigsnpr_tpu.pgs import gibbs_blocked as gb
from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_auto, snp_ldpred2_grid


@pytest.fixture(scope="module")
def blockdiag():
    """Block-diagonal LD (moderate, AR-like) + consistent sumstats
    (beta_hat = R beta + noise/sqrt(n)) so chains stay well-behaved
    across many RNG streams."""
    rng = np.random.default_rng(8)
    sizes = [40, 25, 60, 35]
    m = sum(sizes)
    mats = []
    for sz in sizes:
        A = rng.normal(size=(sz, 4 * sz))
        A = 0.6 * A + 0.4 * np.roll(A, 1, axis=0)   # moderate local LD
        mats.append(np.corrcoef(A))
    full = sp.block_diag(mats).tocsc()
    corr = SparseLD(upper=sp.triu(full).tocsc())
    n = 10000.0
    beta_true = rng.normal(0, 0.02, m) * (rng.uniform(size=m) < 0.2)
    bhat = full.toarray() @ beta_true + rng.normal(0, 1 / np.sqrt(n), m)
    se = np.full(m, 1 / np.sqrt(n))
    df_beta = {"beta": bhat, "beta_se": se, "n_eff": np.full(m, n)}
    return corr, df_beta, np.asarray(sizes)


@pytest.fixture(scope="module")
def device_bands(blockdiag):
    corr, df_beta, sizes = blockdiag
    bb = gb.build_block_bands(corr, sizes)
    bands, gidx = bb.device_put()
    m = bb.m
    beta = np.asarray(df_beta["beta"])
    se = np.asarray(df_beta["beta_se"])
    n = np.asarray(df_beta["n_eff"])
    scale = np.sqrt(n * se**2 + beta**2)
    bh = jnp.asarray(beta / scale, jnp.float32)
    nv = jnp.asarray(n, jnp.float32)
    return bands, gidx, bh, nv, m


def test_multi_grid_matches_per_cell_loop(device_bands):
    """gibbs_multi_blocked (XLA + Pallas interpret) == per-cell
    gibbs_one_blocked loop, including NaN divergence rows."""
    bands, gidx, bh, nv, m = device_bands
    NC = 3
    keys = jax.random.split(jax.random.PRNGKey(7), NC)
    h2v = jnp.asarray([0.2, 0.3, 0.3], jnp.float32)
    pv = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    spv = jnp.asarray([False, True, False])

    ref = np.stack([np.asarray(gb.gibbs_one_blocked(
        bands, gidx, bh, nv, h2v[c], pv[c], spv[c], keys[c],
        burn_in=20, num_iter=30, m=m)) for c in range(NC)])
    assert np.isfinite(ref).all(axis=1).any(), "all cells diverged"

    mc = np.asarray(gb.gibbs_multi_blocked(
        bands, gidx, bh, nv, h2v, pv, spv, keys,
        burn_in=20, num_iter=30, m=m, use_pallas=False))
    np.testing.assert_allclose(mc, ref, rtol=1e-6, atol=1e-8)

    mcp = np.asarray(gb.gibbs_multi_blocked(
        bands, gidx, bh, nv, h2v, pv, spv, keys,
        burn_in=20, num_iter=30, m=m, use_pallas=True))
    np.testing.assert_allclose(mcp, ref, rtol=1e-4, atol=1e-6)


def test_multi_auto_matches_per_chain_loop(device_bands):
    """gibbs_auto_blocked_multi == per-chain gibbs_auto_blocked loop
    (paths, averages, posterior means) for 3 chains."""
    bands, gidx, bh, nv, m = device_bands
    NC = 3
    keys = jax.random.split(jax.random.PRNGKey(3), NC)
    p_inits = jnp.asarray([0.05, 0.2, 0.5], jnp.float32)
    kw = dict(burn_in=30, num_iter=30, m=m, use_mle=True,
              no_jump_sign=False, report_step=10)
    lv = jnp.zeros(m, jnp.float32)
    sc = jnp.float32(0.95)
    pb = jnp.asarray([1e-5, 1.0], jnp.float32)
    ab = jnp.asarray([-0.5, 1.5], jnp.float32)
    mld = jnp.float32(3.0)

    refs = [gb.gibbs_auto_blocked(
        bands, gidx, bh, nv, lv, p_inits[c], jnp.float32(0.3), keys[c],
        sc, pb, ab, mld, **kw) for c in range(NC)]
    multi = gb.gibbs_auto_blocked_multi(
        bands, gidx, bh, nv, lv, p_inits, jnp.float32(0.3), keys,
        sc, pb, ab, mld, **kw)

    for c in range(NC):
        for k2 in ("beta_est", "postp_est", "corr_est", "path_p_est",
                   "path_h2_est", "path_alpha_est", "sample_beta"):
            np.testing.assert_allclose(
                np.asarray(multi[k2][c]), np.asarray(refs[c][k2]),
                rtol=1e-5, atol=1e-7, err_msg=f"chain {c} key {k2}")


def test_multi_auto_pallas_interpret_matches_xla(device_bands):
    """The Pallas multi-chain kernel (interpret mode) == XLA vmap twin
    on a full auto run."""
    bands, gidx, bh, nv, m = device_bands
    NC = 2
    keys = jax.random.split(jax.random.PRNGKey(5), NC)
    p_inits = jnp.asarray([0.1, 0.3], jnp.float32)
    kw = dict(burn_in=10, num_iter=10, m=m, use_mle=False,
              no_jump_sign=True)
    lv = jnp.zeros(m, jnp.float32)
    sc = jnp.float32(1.0)
    pb = jnp.asarray([1e-5, 1.0], jnp.float32)
    ab = jnp.asarray([-0.5, 1.5], jnp.float32)
    mld = jnp.float32(3.0)

    r_x = gb.gibbs_auto_blocked_multi(
        bands, gidx, bh, nv, lv, p_inits, jnp.float32(0.3), keys,
        sc, pb, ab, mld, use_pallas=False, **kw)
    r_p = gb.gibbs_auto_blocked_multi(
        bands, gidx, bh, nv, lv, p_inits, jnp.float32(0.3), keys,
        sc, pb, ab, mld, use_pallas=True, **kw)
    for k2 in ("beta_est", "path_p_est", "path_h2_est"):
        np.testing.assert_allclose(
            np.asarray(r_p[k2]), np.asarray(r_x[k2]),
            rtol=2e-4, atol=1e-6, err_msg=k2)


def test_ldpred2_auto_multichain_end_to_end(blockdiag):
    """snp_ldpred2_auto with several chains routes through the batched
    sampler and matches per-chain statistics + sparse output."""
    corr, df_beta, sizes = blockdiag
    res = snp_ldpred2_auto(corr, df_beta, h2_init=0.2,
                           vec_p_init=[0.05, 0.2, 0.5],
                           burn_in=100, num_iter=100, use_MLE=False,
                           sparse=True, blocks=sizes)
    assert len(res) == 3
    seq = snp_ldpred2_auto(corr, df_beta, h2_init=0.2, vec_p_init=[0.2],
                           burn_in=100, num_iter=100, use_MLE=False,
                           sparse=True)[0]
    for c, r in enumerate(res):
        assert np.isfinite(r["beta_est"]).all()
        assert r["p_init"] == [0.05, 0.2, 0.5][c]
        assert "beta_est_sparse" in r
        cor = np.corrcoef(r["beta_est"], seq["beta_est"])[0, 1]
        assert cor > 0.9, (c, cor)


def test_ldpred2_grid_multicell_end_to_end(blockdiag):
    """snp_ldpred2_grid with blocks= batches all cells and matches the
    sequential (unblocked) sampler per cell."""
    corr, df_beta, sizes = blockdiag
    grid = {"p": [0.2, 1.0, 0.05], "h2": [0.3, 0.3, 0.1],
            "sparse": [False, False, True]}
    out_seq = snp_ldpred2_grid(corr, df_beta, grid, burn_in=30, num_iter=50)
    out_blk = snp_ldpred2_grid(corr, df_beta, grid, burn_in=30, num_iter=50,
                               blocks=sizes)
    np.testing.assert_allclose(out_blk, out_seq, rtol=2e-3, atol=1e-7)


def test_v3_layout_matches_xla(device_bands, blockdiag):
    """The v3 width-paneled kernel (interpret mode, via device_put_mc)
    matches the XLA twin on the classic layout."""
    corr, df_beta, sizes = blockdiag
    bands, gidx, bh, nv, m = device_bands
    bb = gb.build_block_bands(corr, sizes)
    b3, bcs, g3, meta = bb.device_put_mc()
    assert all(b.shape[1] % wp == 0 and ck == b.shape[1] // 2
               for b, (ck, wp) in zip(b3, meta))
    NC = 3
    keys = jax.random.split(jax.random.PRNGKey(7), NC)
    h2v = jnp.asarray([0.2, 0.3, 0.3], jnp.float32)
    pv = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    spv = jnp.asarray([False, True, False])
    ref = np.asarray(gb.gibbs_multi_blocked(
        bands, gidx, bh, nv, h2v, pv, spv, keys,
        burn_in=20, num_iter=30, m=m, use_pallas=False))
    v3 = np.asarray(gb.gibbs_multi_blocked(
        b3, g3, bh, nv, h2v, pv, spv, keys,
        burn_in=20, num_iter=30, m=m, use_pallas=True, bcs=bcs, meta=meta))
    assert np.array_equal(np.isnan(ref), np.isnan(v3))
    np.testing.assert_allclose(np.nan_to_num(v3), np.nan_to_num(ref),
                               rtol=1e-4, atol=1e-6)


def test_plan_mc_fits_vmem():
    """The tile planner never exceeds the VMEM budget and covers the
    bucket exactly (round-3 verdict weak #3: clamp, don't compile-OOM)."""
    from bigsnpr_tpu.pgs.gibbs_pallas import plan_mc, NIN, NOUT

    budget = 12 * 2**20
    for (mbk, wk8, Bk, NC) in [(2048, 264, 64, 30), (4096, 520, 256, 30),
                               (128, 24, 8, 21), (8, 16, 8, 1)]:
        L = mbk + wk8
        LT, RG, NCT = plan_mc(mbk, wk8, Bk, L, NC, itemsize=4,
                              budget=budget)
        assert Bk % LT == 0 and mbk % RG == 0 and RG % 8 == 0
        assert 1 <= NCT <= NC
        ltp = -(-LT // 128) * 128       # physical (Mosaic-padded) lanes
        used = (2 * RG * wk8 * ltp + NCT * (L * ltp + 2 * RG *
                (NIN + NOUT) * ltp + 8 * ltp)) * 4
        assert used <= budget, (mbk, wk8, Bk, NC, used)
    # infeasible buckets signal None (callers use the XLA twin):
    # a giant monolithic bucket whose dp can't fit even one chain, and
    # a wide band whose double-buffered row-group exceeds the budget
    assert plan_mc(131072, 520, 64, 131592, 4, itemsize=4,
                   budget=budget) is None
    assert plan_mc(4096, 2056, 256, 6152, 30, itemsize=4,
                   budget=budget) is None
