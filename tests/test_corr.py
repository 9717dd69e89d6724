"""Windowed correlation + LD scores: naive oracle + PLINK fixture parity."""

import os

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu.ops.corr import snp_cor, cor_thresholds
from bigsnpr_tpu.ops.ldscores import snp_ld_scores, ld_scores_sfbm


def naive_pair_r(x, y):
    """Pairwise-complete Pearson r, reference formula (src/corr.cpp:52-80)."""
    both = ~np.isnan(x) & ~np.isnan(y)
    nona = both.sum()
    xs, ys = x[both], y[both]
    with np.errstate(invalid="ignore", divide="ignore"):
        num = (xs * ys).sum() - xs.sum() * ys.sum() / nona
        dx = (xs**2).sum() - xs.sum() ** 2 / nona
        dy = (ys**2).sum() - ys.sum() ** 2 / nona
        return num / np.sqrt(dx * dy), nona


def naive_cor(X, size_snps, alpha, thr_r2):
    n, m = X.shape
    THR = cor_thresholds(n, alpha)
    out = np.zeros((m, m))
    for j0 in range(m):
        for j in range(max(0, j0 - size_snps), j0):
            r, nona = naive_pair_r(X[:, j0], X[:, j])
            thr = max(THR[nona - 1], np.sqrt(thr_r2)) if nona >= 1 else np.nan
            if np.isnan(r) or (not np.isnan(thr) and abs(r) > thr):
                out[j, j0] = np.clip(r, -1, 1)
    return out


def test_cor_vs_naive():
    pack = snp_fake(80, 60, seed=5, na_prob=0.1)
    X = pack.to_dosage()
    oracle = naive_cor(X, size_snps=10, alpha=0.05, thr_r2=0.01)
    got = snp_cor(pack, size=10, alpha=0.05, thr_r2=0.01,
                  fill_diag=False, block=16)
    dense = np.asarray(got.upper.todense())
    # same sparsity pattern and values
    np.testing.assert_array_equal(dense != 0, oracle != 0)
    np.testing.assert_allclose(dense, oracle, rtol=1e-10, atol=1e-12)


def test_cor_complete_data_alpha1():
    pack = snp_fake(100, 40, seed=6)
    X = pack.to_dosage()
    got = snp_cor(pack, size=40, fill_diag=True, block=8)
    dense = np.asarray(got.sym().todense())
    oracle = np.corrcoef(X.T)
    # every |r| > 0 within window kept; compare nonzero entries
    nz = dense != 0
    np.testing.assert_allclose(dense[nz], oracle[nz], rtol=1e-9, atol=1e-10)
    assert np.allclose(np.diag(dense), 1.0)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/tests/testthat/testdata/example.ld"),
    reason="PLINK fixture not available")
def test_cor_plink_parity(example_pack):
    """r^2 parity vs PLINK --r2 fixture (reference test-2-corr.R:41-58)."""
    import pandas as pd

    size = 100
    true = pd.read_csv("/root/reference/tests/testthat/testdata/example.ld",
                       sep=r"\s+")
    names = [f"SNP{k}" for k in range(example_pack.m)]
    idx = {s: k for k, s in enumerate(names)}
    ia = true["SNP_A"].map(idx).to_numpy()
    ib = true["SNP_B"].map(idx).to_numpy()
    keep = (ib - ia) <= size
    ia, ib, r2_true = ia[keep], ib[keep], true["R2"].to_numpy()[keep]

    got = snp_cor(example_pack, size=size, thr_r2=0.2, alpha=1.0,
                  fill_diag=False)
    g = got.upper.tocoo()
    ours = {(i, j): v**2 for i, j, v in zip(g.row, g.col, g.data)}
    assert len(ours) == len(ia), (len(ours), len(ia))
    for i, j, v in zip(ia, ib, r2_true):
        assert (i, j) in ours
        assert abs(ours[(i, j)] - v) < 1e-6, (i, j, ours[(i, j)], v)


def test_ld_scores_vs_naive():
    pack = snp_fake(70, 50, seed=8, na_prob=0.08)
    X = pack.to_dosage()
    size = 12
    oracle = np.ones(50)
    for j0 in range(50):
        for j in range(max(0, j0 - size), j0):
            r, _ = naive_pair_r(X[:, j0], X[:, j])
            if not np.isnan(r):
                oracle[j0] += r * r
                oracle[j] += r * r
    got = snp_ld_scores(pack, size=size, block=16)
    np.testing.assert_allclose(got, oracle, rtol=1e-10)


def test_ld_scores_sfbm_consistency():
    pack = snp_fake(90, 45, seed=9)
    size = 45
    corr = snp_cor(pack, size=size, fill_diag=True)
    np.testing.assert_allclose(
        ld_scores_sfbm(corr), snp_ld_scores(pack, size=size), rtol=1e-9)
    # sub-index restriction
    ind = np.arange(0, 45, 2)
    sub_ld = ld_scores_sfbm(corr, ind_sub=ind)
    dense = corr.to_dense()[np.ix_(ind, ind)]
    np.testing.assert_allclose(sub_ld, (dense**2).sum(0), rtol=1e-9)


def test_device_finalize_matches_host():
    """Device-finalized r (error-free f32 transforms) == host f64 finalize
    to ~1e-7, identical sparsity pattern."""
    pack = snp_fake(300, 150, seed=78, na_prob=0.08)
    h = snp_cor(pack, size=30, alpha=0.05, thr_r2=0.01, fill_diag=False)
    d = snp_cor(pack, size=30, alpha=0.05, thr_r2=0.01, fill_diag=False,
                finalize="device")
    H, D = h.to_dense(), d.to_dense()
    np.testing.assert_array_equal(H != 0, D != 0)
    both = H != 0
    np.testing.assert_allclose(D[both], H[both], atol=3e-7, rtol=0)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/tests/testthat/testdata/example.ld"),
    reason="PLINK fixture not available")
def test_device_finalize_plink_parity(example_pack):
    """PLINK parity holds through the device-finalize path too."""
    import pandas as pd

    size = 100
    true = pd.read_csv("/root/reference/tests/testthat/testdata/example.ld",
                       sep=r"\s+")
    names = [f"SNP{k}" for k in range(example_pack.m)]
    idx = {s: k for k, s in enumerate(names)}
    ia = true["SNP_A"].map(idx).to_numpy()
    ib = true["SNP_B"].map(idx).to_numpy()
    keep = (ib - ia) <= size
    ia, ib, r2_true = ia[keep], ib[keep], true["R2"].to_numpy()[keep]

    got = snp_cor(example_pack, size=size, thr_r2=0.2, alpha=1.0,
                  fill_diag=False, finalize="device")
    g = got.upper.tocoo()
    ours = {(i, j): v**2 for i, j, v in zip(g.row, g.col, g.data)}
    assert len(ours) == len(ia)
    for i, j, v in zip(ia, ib, r2_true):
        assert abs(ours[(i, j)] - v) < 1e-6


def test_ld_scores_match_cor_subsets():
    """10 random (ind_row, ind_col, size): ld_scores == colSums(corr^2)
    (reference test-2-ld-scores.R:15-30)."""
    pack = snp_fake(120, 80, seed=31, na_prob=0.05)
    rng = np.random.default_rng(0)
    for _ in range(10):
        ind_row = np.sort(rng.choice(120, 60, replace=False))
        ind_col = np.sort(rng.choice(80, 40, replace=False))
        size = int(rng.integers(10, 20))
        corr = snp_cor(pack, ind_row=ind_row, ind_col=ind_col, size=size,
                       fill_diag=True)
        ld = snp_ld_scores(pack, ind_row=ind_row, ind_col=ind_col, size=size)
        assert len(ld) == 40
        np.testing.assert_allclose(ld, corr.col_sums_sq(), rtol=1e-9)


def test_device_compaction_cap_regrow():
    """Dense-LD case whose kept count exceeds the initial device
    compaction cap (2^14): the grow-and-retry path must return exactly
    the host-finalized matrix."""
    pack = snp_fake(150, 260, seed=77, na_prob=0.02)
    host = snp_cor(pack, size=260, alpha=1.0, fill_diag=False,
                   finalize="host")
    dev = snp_cor(pack, size=260, alpha=1.0, fill_diag=False,
                  finalize="device")
    h = host.upper.tocoo()
    d = dev.upper.tocoo()
    assert d.nnz == h.nnz and d.nnz > (1 << 14)
    hd = {(i, j): v for i, j, v in zip(h.row, h.col, h.data)}
    for i, j, v in zip(d.row, d.col, d.data):
        assert abs(hd[(i, j)] - v) < 5e-7


@pytest.mark.parametrize("with_na", [False, True])
def test_kept_pairs_band_chunking_parity(with_na):
    """Band-chunked device-compact kept pairs == the host sum-plane path
    (wide SCT windows OOMed HBM before chunking; round-5 fix). The
    NA-free case exercises the 1-plane nona GEMM; the NA case the 3x3
    Gram."""
    import bigsnpr_tpu.ops.corr as corr
    from bigsnpr_tpu.core import unpack as up
    from bigsnpr_tpu.core.genotypes import GenoPack
    from bigsnpr_tpu.ops.corr import (_iter_band_blocks,
                                      _iter_kept_pairs_device, _pair_r,
                                      _window_geometry, cor_thresholds)

    rng = np.random.default_rng(7)
    n, m = 501, 400
    codes = rng.choice([0, 2, 3], size=(m, n), p=[.5, .3, .2]).astype(
        np.uint8)
    for j in range(1, m):
        mask = rng.uniform(size=n) < 0.7
        codes[j, mask] = codes[j - 1, mask]
    if with_na:
        codes[rng.uniform(size=codes.shape) < 0.02] = 1
    pad = (-n) % 4
    if pad:
        codes = np.concatenate([codes, np.ones((m, pad), np.uint8)],
                               axis=1)
    pack = GenoPack(packed=up.np_pack_codes(codes), n=n)
    assert corr._pack_is_nona(pack, pack.packed, n) == (not with_na)
    pos = np.arange(m) * 1000.0
    left_start = _window_geometry(pos, 50_000.0)

    # host reference: dense sum planes -> f64 r^2, floored at 0.01
    hset = {}
    for t0, t1, b0, sums in _iter_band_blocks(pack.packed, n, m,
                                              left_start, 96, pack=pack):
        r, _ = _pair_r(sums)
        jj0 = np.arange(t0, t1)[:, None]
        jj = np.arange(b0, t1)[None, :]
        ok = (jj < jj0) & (jj >= left_start[jj0])
        with np.errstate(invalid="ignore"):
            ok &= np.nan_to_num(r * r) > 0.01
        a, b = np.nonzero(ok)
        for aa, bb in zip(a, b):
            hset[(jj[0, bb], jj0[aa, 0])] = (r * r)[aa, bb]

    THR = cor_thresholds(n, 1.0)
    try:
        corr._BAND_CHUNK_OVERRIDE = 64          # force multiple chunks
        cset = {}
        for jj, ii, vals in _iter_kept_pairs_device(
                pack.packed, n, m, left_start, THR, np.sqrt(0.01), 96,
                pack=pack):
            v2 = vals.astype(np.float64) ** 2
            keep = np.isfinite(vals) & (v2 > 0.01)
            for i, j, v in zip(ii[keep], jj[keep], v2[keep]):
                cset[(i, j)] = v
    finally:
        corr._BAND_CHUNK_OVERRIDE = None
    assert set(hset) == set(cset)
    assert max(abs(hset[k] - cset[k]) for k in hset) < 2e-6
