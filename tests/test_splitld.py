"""split-LD DP: exact replication of the reference's hand-computed tests
(tests/testthat/test-4-split-LD.R:7-115)."""

import numpy as np
import pytest
import scipy.sparse as sp

from bigsnpr_tpu.ops.splitld import _get_L, _get_C, _get_perc, snp_ldsplit, block_num


@pytest.fixture()
def toy():
    corr = np.add.outer(np.arange(1, 5) / 10, np.arange(1, 5) / 10)
    np.fill_diagonal(corr, 1.0)
    return corr


def lower_csc(corr):
    low = sp.tril(sp.csc_matrix(corr)).tocsc()
    low.sort_indices()
    return low


def test_get_L(toy):
    L = _get_L(lower_csc(toy), thr_r2=0, max_r2=1).toarray()
    expect = np.zeros((4, 5))
    expect[0, 1] = (toy[0, 1:] ** 2).sum()
    expect[0, 2] = (toy[0, 2:] ** 2).sum()
    expect[0, 3] = (toy[0, 3:] ** 2).sum()
    expect[1, 2] = (toy[1, 2:] ** 2).sum()
    expect[1, 3] = (toy[1, 3:] ** 2).sum()
    expect[2, 3] = (toy[2, 3:] ** 2).sum()
    np.testing.assert_allclose(L, expect, rtol=1e-12)


def test_get_C_case1(toy):
    L = _get_L(lower_csc(toy), 0, 1)
    C, best = _get_C(L, min_size=1, max_size=4, max_K=5, max_cost=np.inf,
                     pos_scaled=np.zeros(4))
    np.testing.assert_array_equal(best[:, 0], [4, 4, 4, 4])
    np.testing.assert_array_equal(C[:, 0], [0, 0, 0, 0])
    np.testing.assert_array_equal(best[:, 1], [1, 2, 3, -1])
    np.testing.assert_allclose(C[:, 1], [0.5, 0.61, 0.49, np.inf])
    np.testing.assert_array_equal(best[:, 2], [1, 2, -1, -1])
    np.testing.assert_allclose(C[:, 2], [1.11, 1.1, np.inf, np.inf], rtol=1e-6)
    np.testing.assert_array_equal(best[:, 3], [1, -1, -1, -1])
    np.testing.assert_allclose(C[:, 3], [1.6, np.inf, np.inf, np.inf])
    np.testing.assert_array_equal(best[:, 4], [-1] * 4)
    assert np.isinf(C[:, 4]).all()


def test_get_C_case2(toy):
    L = _get_L(lower_csc(toy), 0, 1)
    C, best = _get_C(L, min_size=2, max_size=2, max_K=3, max_cost=np.inf,
                     pos_scaled=np.ones(4))
    np.testing.assert_array_equal(best[:, 0], [-1, -1, 4, -1])
    np.testing.assert_array_equal(C[:, 0], [np.inf, np.inf, 0, np.inf])
    np.testing.assert_array_equal(best[:, 1], [2, -1, -1, -1])
    np.testing.assert_allclose(C[0, 1], 1.02, rtol=1e-6)
    np.testing.assert_array_equal(best[:, 2], [-1] * 4)


def test_get_C_pos_scaled(toy):
    L = _get_L(lower_csc(toy), 0, 1)
    C, best = _get_C(L, min_size=1, max_size=3, max_K=3, max_cost=np.inf,
                     pos_scaled=np.linspace(0, 1, 4))
    np.testing.assert_array_equal(best[:, 0], [-1, 4, 4, 4])
    np.testing.assert_array_equal(C[:, 0], [np.inf, 0, 0, 0])
    np.testing.assert_array_equal(best[:, 1], [1, 2, 3, -1])
    np.testing.assert_allclose(C[:, 1], [0.5, 0.61, 0.49, np.inf])
    np.testing.assert_array_equal(best[:, 2], [1, 2, -1, -1])
    np.testing.assert_allclose(C[:2, 2], [1.11, 1.10], rtol=1e-6)


def test_get_C_strict_positions(toy):
    """pos_scaled forcing singleton blocks (test-4-split-LD.R:88-115)."""
    L = _get_L(lower_csc(toy), 0, 1)
    pos = np.arange(1, 5) * 2.0
    C, best = _get_C(L, 1, 3, 4, np.inf, pos)
    np.testing.assert_array_equal(best[:, 0], [-1, -1, -1, 4])
    err = toy[2, 3] ** 2
    np.testing.assert_array_equal(best[:, 1], [-1, -1, 3, -1])
    np.testing.assert_allclose(C[2, 1], err)
    err += (toy[1, 2:] ** 2).sum()
    np.testing.assert_array_equal(best[:, 2], [-1, 2, -1, -1])
    np.testing.assert_allclose(C[1, 2], err, rtol=1e-6)
    err += (toy[0, 1:] ** 2).sum()
    np.testing.assert_array_equal(best[:, 3], [1, -1, -1, -1])
    np.testing.assert_allclose(C[0, 3], err, rtol=1e-6)

    # snp_ldsplit with these positions: only the all-singleton split
    res = snp_ldsplit(sp.csc_matrix(toy), thr_r2=0, min_size=1, max_size=3,
                      max_K=4, max_r2=1, max_cost=np.inf, pos_scaled=pos)
    assert len(res) == 1
    assert res.iloc[0]["n_block"] == 4
    # and with max_K=3 no valid splitting
    res2 = snp_ldsplit(sp.csc_matrix(toy), thr_r2=0, min_size=1, max_size=3,
                       max_K=3, max_r2=1, max_cost=np.inf, pos_scaled=pos)
    assert res2 is None


def test_perc_kept_exact():
    """perc_kept is exact (test-4-split-LD.R second block)."""
    rng = np.random.default_rng(0)
    m = 40
    A = rng.normal(size=(m, m)) * (rng.random((m, m)) < 0.2)
    corr = A @ A.T / 10 + np.eye(m)
    corr[np.abs(corr) < 0.05] = 0
    np.fill_diagonal(corr, 1.0)
    res = snp_ldsplit(sp.csc_matrix(corr), thr_r2=0, min_size=5, max_size=20,
                      max_K=8, max_r2=np.inf, max_cost=np.inf)
    assert res is not None
    S = sp.csc_matrix(corr)
    for _, row in res.iterrows():
        blocks = block_num(row["all_size"])
        coo = sp.tril(S).tocoo()
        within = blocks[coo.row] == blocks[coo.col]
        nnz_all = 2 * coo.nnz - m
        nnz_within = nnz_all - 2 * (~within).sum()
        np.testing.assert_allclose(row["perc_kept"], nnz_within / nnz_all,
                                   rtol=1e-12)


def test_ldsplit_cost_is_exact():
    """cost == sum of squared correlations outside blocks."""
    rng = np.random.default_rng(3)
    m = 30
    corr = np.zeros((m, m))
    for j in range(m):
        for i in range(max(0, j - 6), j):
            if rng.random() < 0.6:
                corr[i, j] = corr[j, i] = rng.uniform(-0.7, 0.7)
    np.fill_diagonal(corr, 1.0)
    res = snp_ldsplit(sp.csc_matrix(corr), thr_r2=0, min_size=3, max_size=15,
                      max_K=10, max_r2=np.inf, max_cost=np.inf)
    assert res is not None
    for _, row in res.iterrows():
        blocks = block_num(row["all_size"])
        outside = np.not_equal.outer(blocks, blocks)
        cost_direct = (corr**2 * outside).sum() / 2  # each pair once
        np.testing.assert_allclose(row["cost"], cost_direct, rtol=1e-5)


def test_ldsplit_native_matches_python_fallback(monkeypatch):
    """The C++ tables (native/ldsplit_native.cpp) must agree with the
    numpy/jax fallback exactly — same costs, same block boundaries."""
    from bigsnpr_tpu import native

    if native.get_lib() is None or not hasattr(native.get_lib(),
                                               "ldsplit_dp"):
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(11)
    m, W = 400, 25
    corr = np.eye(m)
    for j in range(m):
        for i in range(max(0, j - W), j):
            if rng.random() < 0.4:
                corr[i, j] = corr[j, i] = rng.uniform(-0.8, 0.8)
    S = sp.csc_matrix(corr)
    pos = np.cumsum(rng.random(m)) / 100
    kwargs = dict(thr_r2=0.02, min_size=5, max_size=(60, 120), max_K=40,
                  max_r2=0.95, max_cost=np.inf, pos_scaled=pos)

    res_native = snp_ldsplit(S, **kwargs)
    monkeypatch.setattr(native, "ldsplit_suffix", lambda *a, **k: None)
    res_py = snp_ldsplit(S, **kwargs)

    assert res_native is not None and res_py is not None
    assert len(res_native) == len(res_py)
    for (_, a), (_, b) in zip(res_native.iterrows(), res_py.iterrows()):
        assert a["n_block"] == b["n_block"]
        # fallback DP accumulates via jax segment ops in f32; the C++
        # tables are f64 -> tiny cost drift is expected
        np.testing.assert_allclose(a["cost"], b["cost"], rtol=1e-5)
        np.testing.assert_array_equal(a["all_last"], b["all_last"])
        np.testing.assert_allclose(a["perc_kept"], b["perc_kept"],
                                   rtol=1e-12)
