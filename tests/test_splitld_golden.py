"""split-LD golden parity vs the reference's spMat/split_before fixtures
(reference test-4-split-LD.R:140-201)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

TESTDATA = "/root/reference/tests/testthat/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference fixtures not available")


@pytest.fixture(scope="module")
def sp_corr():
    from bigsnpr_tpu.utils.rds import read_rds, s4_sparse_to_scipy

    return s4_sparse_to_scipy(read_rds(f"{TESTDATA}/spMat.rds"))


def compute_cost(block_num, corr, thr_r2):
    low = sp.tril(corr, k=-1).tocoo()
    out = block_num[low.row] != block_num[low.col]
    x2 = low.data**2
    x2 = np.where(x2 >= thr_r2, x2, 0.0)
    return x2[out].sum()


def test_golden_costs(sp_corr):
    from bigsnpr_tpu import snp_ldsplit
    from bigsnpr_tpu.ops.splitld import block_num
    from bigsnpr_tpu.utils.rds import read_rds, to_frame

    res1 = snp_ldsplit(sp_corr, thr_r2=0.02, min_size=10, max_size=30,
                       max_K=50, max_r2=1.0, max_cost=np.inf)
    np.testing.assert_array_equal(res1["n_block"], np.arange(14, 41))

    # costs equal the direct sum of out-of-block squared correlations
    for _, row in res1.iterrows():
        bn = block_num(row["all_size"])
        np.testing.assert_allclose(
            row["cost"], compute_cost(bn, sp_corr, 0.02), rtol=1e-5)

    # golden: costs equal the reference's stored pre-v1.10.1 results
    prev = to_frame(read_rds(f"{TESTDATA}/split_before.rds"))
    np.testing.assert_allclose(res1["cost"], np.asarray(prev["cost"]),
                               rtol=1e-6)


def test_max_cost_and_k(sp_corr):
    from bigsnpr_tpu import snp_ldsplit

    res2 = snp_ldsplit(sp_corr, thr_r2=0.1, min_size=20, max_size=40,
                       max_K=50, max_r2=1.0, max_cost=np.inf)
    np.testing.assert_array_equal(res2["n_block"], np.arange(11, 21))
    res3 = snp_ldsplit(sp_corr, thr_r2=0.1, min_size=20, max_size=40,
                       max_K=15, max_r2=1.0, max_cost=np.inf)
    np.testing.assert_array_equal(res3["n_block"], np.arange(11, 16))

    res1 = snp_ldsplit(sp_corr, thr_r2=0.02, min_size=10, max_size=30,
                       max_K=50, max_r2=1.0, max_cost=np.inf)
    max_cost = float(np.quantile(res1["cost"], 0.5))
    res4 = snp_ldsplit(sp_corr, thr_r2=0.02, min_size=10, max_size=30,
                       max_K=50, max_r2=1.0, max_cost=max_cost)
    assert (res4["cost"] <= max_cost).all()
    bad = res1[~res1["n_block"].isin(res4["n_block"])]
    assert (bad["cost"] > max_cost).all()


def test_max_r2(sp_corr):
    from bigsnpr_tpu import snp_ldsplit
    from bigsnpr_tpu.ops.splitld import block_num

    max_r2 = 0.25
    res5 = snp_ldsplit(sp_corr, thr_r2=0.02, min_size=10, max_size=50,
                       max_K=100, max_r2=max_r2, max_cost=np.inf)
    low = sp.tril(sp_corr, k=-1).tocoo()
    for _, row in res5.iterrows():
        bn = block_num(row["all_size"])
        out = bn[low.row] != bn[low.col]
        if out.any():
            assert (low.data[out] ** 2).max() <= max_r2


def test_multiple_max_size(sp_corr):
    from bigsnpr_tpu import snp_ldsplit
    import pandas as pd

    kw = dict(thr_r2=0.02, min_size=10, max_K=50, max_r2=0.5,
              max_cost=np.inf)
    res6 = snp_ldsplit(sp_corr, max_size=30, **kw)
    res7 = snp_ldsplit(sp_corr, max_size=40, **kw)
    res67 = snp_ldsplit(sp_corr, max_size=[40, 30], **kw)
    both = pd.concat([res6, res7], ignore_index=True)
    both = both.drop_duplicates(subset=["n_block", "cost"])
    merged = res67.drop(columns=["max_size"])
    # the dedupe keeps, per n_block, the strictly-improving costs
    for _, row in merged.iterrows():
        match = both[(both["n_block"] == row["n_block"]) &
                     (np.isclose(both["cost"], row["cost"]))]
        assert len(match) >= 1
