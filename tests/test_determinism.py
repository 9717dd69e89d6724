"""Determinism: repeated runs are bit-identical (the analog of the
reference's ncores=2 repeat-20x suite, tests/testthat/test-7-OpenMP.R)."""

import numpy as np

from bigsnpr_tpu import snp_fake, bed_scaleBinom
from bigsnpr_tpu.ops.corr import snp_cor
from bigsnpr_tpu.ops.clumping import snp_clumping
from bigsnpr_tpu.ops.matvec import snp_cprodVec, snp_prodVec
from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_grid
from bigsnpr_tpu.assoc.gwas import big_univLinReg


def test_kernels_bit_repeatable():
    pack = snp_fake(150, 120, seed=91, na_prob=0.05)
    sc = bed_scaleBinom(pack)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(pack.n)
    u = rng.standard_normal(pack.m)

    base_cp = np.asarray(snp_cprodVec(pack, v, sc["center"], sc["scale"]))
    base_p = np.asarray(snp_prodVec(pack, u, sc["center"], sc["scale"]))
    base_cor = snp_cor(pack, size=30).upper.toarray()
    base_clump = snp_clumping(pack, infos_chr=np.ones(120, dtype=int),
                              thr_r2=0.1)
    base_gwas = big_univLinReg(pack, v)["estim"].to_numpy()

    for _ in range(5):
        np.testing.assert_array_equal(
            np.asarray(snp_cprodVec(pack, v, sc["center"], sc["scale"])),
            base_cp)
        np.testing.assert_array_equal(
            np.asarray(snp_prodVec(pack, u, sc["center"], sc["scale"])),
            base_p)
        np.testing.assert_array_equal(
            snp_cor(pack, size=30).upper.toarray(), base_cor)
        np.testing.assert_array_equal(
            snp_clumping(pack, infos_chr=np.ones(120, dtype=int), thr_r2=0.1),
            base_clump)
        np.testing.assert_array_equal(
            big_univLinReg(pack, v)["estim"].to_numpy(), base_gwas)


def test_sampler_seeded_repeatable():
    """Seeded Gibbs: identical across calls (reference doRNG analog,
    test-8-LDpred2.R:140-168)."""
    pack = snp_fake(300, 80, seed=92)
    from bigsnpr_tpu.assoc.simu import snp_simuPheno

    simu = snp_simuPheno(pack, h2=0.5, M=10, seed=1)
    gwas = big_univLinReg(pack, simu["pheno"])
    df = {"beta": gwas["estim"].to_numpy(),
          "beta_se": gwas["std.err"].to_numpy(),
          "n_eff": np.full(80, 300.0)}
    corr = snp_cor(pack, size=30)
    grid = {"p": [0.2], "h2": [0.4], "sparse": [False]}
    base = snp_ldpred2_grid(corr, df, grid, burn_in=20, num_iter=30, seed=7)
    for _ in range(3):
        again = snp_ldpred2_grid(corr, df, grid, burn_in=20, num_iter=30,
                                 seed=7)
        np.testing.assert_array_equal(again, base)
    # different seed -> different draws
    other = snp_ldpred2_grid(corr, df, grid, burn_in=20, num_iter=30, seed=8)
    assert not np.array_equal(other, base)
