"""Clumping: fixed-point result == sequential greedy oracle (exact)."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu.ops.clumping import snp_clumping, bed_clumping, snp_indLRLDR, LD_WIKI34


def sequential_clumping(X, S, pos, size, thr_r2):
    """Reference algorithm, literally sequential (src/clumping.cpp:33-91)."""
    m = X.shape[1]
    ord_ = np.argsort(-S, kind="stable")
    keep = np.zeros(m, dtype=bool)
    decided = np.zeros(m, dtype=bool)
    for j0 in ord_:
        ok = True
        for j in range(m):
            if j == j0 or not keep[j]:
                continue
            if abs(pos[j] - pos[j0]) > size:
                continue
            # pairwise-complete r^2
            both = ~np.isnan(X[:, j]) & ~np.isnan(X[:, j0])
            x, y = X[both, j0], X[both, j]
            n = both.sum()
            num = (x * y).sum() - x.sum() * y.sum() / n
            dx = (x**2).sum() - x.sum() ** 2 / n
            dy = (y**2).sum() - y.sum() ** 2 / n
            r2 = num**2 / (dx * dy)
            if r2 > thr_r2:
                ok = False
                break
        keep[j0] = ok
        decided[j0] = True
    return np.nonzero(keep)[0]


@pytest.mark.parametrize("seed,thr", [(1, 0.2), (2, 0.05), (3, 0.5)])
def test_clumping_vs_sequential(seed, thr):
    rng = np.random.default_rng(seed)
    n, m = 60, 80
    # correlated genotypes: duplicate neighboring columns with noise
    base = rng.binomial(2, 0.3, size=(n, m)).astype(float)
    for j in range(1, m):
        if rng.random() < 0.5:
            copy_from = j - rng.integers(1, min(j, 6) + 1)
            mask = rng.random(n) < 0.8
            base[mask, j] = base[mask, copy_from]
    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack

    pack = GenoPack(packed=unpack.np_pack_codes(
        unpack.np_dosage_to_codes(base.T)), n=n)
    X = pack.to_dosage()
    S = rng.random(m)
    pos = np.sort(rng.integers(0, 60000, m)).astype(float)

    oracle = sequential_clumping(X, S, pos, size=10 * 1000, thr_r2=thr)
    got = snp_clumping(pack, infos_chr=np.ones(m, dtype=int), S=S,
                       thr_r2=thr, size=10, infos_pos=pos, block=16)
    np.testing.assert_array_equal(got, oracle)


def test_clumping_size_in_snps():
    pack = snp_fake(50, 40, seed=4)
    X = pack.to_dosage()
    S = np.random.default_rng(0).random(40)
    oracle = sequential_clumping(X, S, np.arange(1, 41, dtype=float),
                                 size=5, thr_r2=0.1)
    got = snp_clumping(pack, infos_chr=np.ones(40, dtype=int), S=S,
                       thr_r2=0.1, size=5, block=8)
    np.testing.assert_array_equal(got, oracle)


def test_clumping_multichrom_exclude():
    pack = snp_fake(40, 30, seed=5)
    chrs = np.r_[np.ones(15), 2 * np.ones(15)].astype(int)
    got = snp_clumping(pack, infos_chr=chrs, thr_r2=0.99, exclude=[0, 1, 29])
    assert 0 not in got and 1 not in got and 29 not in got
    # high threshold, random data: nearly everything kept
    assert len(got) >= 25


def test_clumping_example_maf(example_pack):
    """Default MAF clumping keeps most variants in low-LD simulated data
    (reference R/clumping.R example: 'keep most of them')."""
    got = snp_clumping(
        example_pack,
        infos_chr=example_pack.map["chromosome"].to_numpy(),
        infos_pos=example_pack.map["physical.pos"].to_numpy(),
        thr_r2=0.1,
    )
    assert len(got) / example_pack.m > 0.5
    got2 = bed_clumping(example_pack, thr_r2=0.1,
                        infos_pos=example_pack.map["physical.pos"].to_numpy())
    assert len(got2) / example_pack.m > 0.5


def test_lrldr():
    chrs = np.array([1, 1, 2, 6, 6, 8])
    pos = np.array([48060567, 1000, 90000000, 26000000, 5000, 9000000])
    ind = snp_indLRLDR(chrs, pos)
    np.testing.assert_array_equal(np.sort(ind), [0, 2, 3, 5])
    assert LD_WIKI34.shape == (34, 3)
