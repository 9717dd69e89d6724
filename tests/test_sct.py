"""C+T / SCT tests (reference test-6-PRS.R / test-6-SCT.R analogs)."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu.ops.clumping import snp_clumping
from bigsnpr_tpu.assoc.gwas import big_univLinReg, gwas_pvalues
from bigsnpr_tpu.assoc.simu import snp_simuPheno
from bigsnpr_tpu.pgs.prs import snp_PRS, snp_thr_correct
from bigsnpr_tpu.pgs.sct import snp_grid_clumping, snp_grid_PRS, snp_grid_stacking


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    n, m = 800, 200
    p = rng.uniform(0.1, 0.5, m)
    hap = np.empty((2 * n, m), dtype=np.int8)
    hap[:, 0] = rng.random(2 * n) < p[0]
    for j in range(1, m):
        copy = rng.random(2 * n) < 0.7
        hap[:, j] = np.where(copy, hap[:, j - 1], rng.random(2 * n) < p[j])
    X = (hap[:n] + hap[n:]).astype(float)
    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack

    pack = GenoPack(packed=unpack.np_pack_codes(unpack.np_dosage_to_codes(X.T)), n=n)
    simu = snp_simuPheno(pack, h2=0.4, M=25, seed=3)
    gwas = big_univLinReg(pack, simu["pheno"])
    lpS = -gwas_pvalues(gwas, log10=True)
    chrs = np.ones(m, dtype=int)
    pos = np.arange(1, m + 1) * 1000.0
    return dict(pack=pack, X=X, y=simu["pheno"], gwas=gwas, lpS=lpS,
                chrs=chrs, pos=pos)


def test_prs_incremental(setup):
    pack, X, gwas, lpS = setup["pack"], setup["X"], setup["gwas"], setup["lpS"]
    betas = gwas["estim"].to_numpy()
    thrs = np.arange(0, 5.5, 0.5)
    prs = snp_PRS(pack, betas, lpS_keep=lpS, thr_list=thrs)
    assert prs.shape == (pack.n, len(thrs))
    # oracle: masked matmul per threshold
    for i, t in enumerate(thrs):
        mask = lpS > t
        oracle = X[:, mask] @ betas[mask]
        np.testing.assert_allclose(prs[:, i], oracle, rtol=1e-4, atol=1e-3)
    # unordered thresholds give same results reordered
    perm = np.random.default_rng(0).permutation(len(thrs))
    prs2 = snp_PRS(pack, betas, lpS_keep=lpS, thr_list=thrs[perm])
    np.testing.assert_allclose(prs2[:, np.argsort(perm)], prs, rtol=1e-6)


def test_prs_allele_reversal(setup):
    pack, X = setup["pack"], setup["X"]
    rng = np.random.default_rng(1)
    betas = rng.normal(size=pack.m)
    same = rng.random(pack.m) > 0.3
    prs = snp_PRS(pack, betas, same_keep=same, lpS_keep=None, thr_list=0)
    # reversal oracle: x' = 2 - x
    Xrev = np.where(same[None, :], X, 2 - X)
    np.testing.assert_allclose(prs[:, 0], Xrev @ betas, rtol=1e-4, atol=1e-3)


def test_thr_correct_properties():
    """Reference test-6-PRS.R:73-98 semantics."""
    rng = np.random.default_rng(2)
    beta = rng.normal(size=1000)
    beta_se = rng.uniform(0.3, 0.5, 1000)
    lpval = -np.log10(np.maximum(
        __import__("scipy.stats", fromlist=["chi2"]).chi2.sf(
            (beta / beta_se) ** 2, df=1), 1e-300))
    THR = 1.2
    nb1 = snp_thr_correct(beta, beta_se=beta_se, thr_lpS=THR)
    nb2 = snp_thr_correct(beta, lpS=lpval, thr_lpS=THR)
    np.testing.assert_allclose(nb1, nb2, rtol=1e-6, atol=1e-12)
    sig = lpval >= THR
    assert np.all(nb2[sig] != 0) and np.all(nb2[~sig] == 0)
    high = lpval > 10
    if high.any():
        np.testing.assert_allclose(nb2[high], beta[high], rtol=1e-3)
    assert np.all(np.sign(nb1[sig]) == np.sign(beta[sig]))
    assert np.all(np.abs(nb1 / beta_se) <= np.abs(beta / beta_se) + 1e-12)
    np.testing.assert_array_equal(snp_thr_correct(beta, beta_se=beta_se,
                                                  thr_lpS=0), beta)
    with pytest.raises(ValueError):
        snp_thr_correct(beta, thr_lpS=1.0)


def test_grid_clumping_matches_single(setup):
    pack, lpS, chrs, pos = (setup["pack"], setup["lpS"], setup["chrs"],
                            setup["pos"])
    all_keep, grid = snp_grid_clumping(
        pack, chrs, pos, lpS, grid_thr_r2=(0.2,), grid_base_size=(50,))
    assert len(grid) == 1
    single = snp_clumping(pack, infos_chr=chrs, S=lpS, thr_r2=0.2,
                          size=50 / 0.2, infos_pos=pos)
    np.testing.assert_array_equal(np.sort(all_keep[1][0]), single)


def test_grid_clumping_grid_shape(setup):
    pack, lpS, chrs, pos = (setup["pack"], setup["lpS"], setup["chrs"],
                            setup["pos"])
    all_keep, grid = snp_grid_clumping(
        pack, chrs, pos, lpS, grid_thr_r2=(0.05, 0.2, 0.8),
        grid_base_size=(50, 200))
    assert len(grid) == 6
    assert len(all_keep[1]) == 6
    # tighter r2 threshold prunes more
    sizes = {(r["thr.r2"], r["size"]): len(all_keep[1][i])
             for i, (_, r) in enumerate(grid.iterrows())}
    assert sizes[(0.05, 1000)] <= sizes[(0.8, 62)]


def test_sct_end_to_end(setup):
    pack, X, y, gwas, lpS, chrs, pos = (
        setup["pack"], setup["X"], setup["y"], setup["gwas"], setup["lpS"],
        setup["chrs"], setup["pos"])
    betas = gwas["estim"].to_numpy()
    all_keep, grid = snp_grid_clumping(
        pack, chrs, pos, lpS, grid_thr_r2=(0.1, 0.5), grid_base_size=(100,))
    multi = snp_grid_PRS(pack, all_keep, betas, lpS, n_thr_lpS=10)
    assert multi.scores.shape == (pack.n, 2 * 10)

    res = snp_grid_stacking(multi, y, alphas=(1.0, 0.01), K=5, nlambda=50)
    pred = X @ res["beta.G"] + res["intercept"]
    r_sct = np.corrcoef(pred, y)[0, 1]
    assert r_sct > 0.5, f"SCT r={r_sct}"
    # unrolled per-variant effects reproduce the stacked model's prediction
    pred_scores = multi.scores @ res["mod"].beta + res["mod"].intercept
    np.testing.assert_allclose(np.corrcoef(pred, pred_scores)[0, 1], 1.0,
                               atol=1e-6)


def test_grid_clumping_info_threshold(setup):
    """INFO-score grid dimension (Q3): higher thr.imp restricts the
    candidate set like the reference's info.chr >= thr.imp filter."""
    pack, lpS, chrs, pos = (setup["pack"], setup["lpS"], setup["chrs"],
                            setup["pos"])
    rng = np.random.default_rng(9)
    infos_imp = rng.uniform(0.2, 1.0, pack.m)
    all_keep, grid = snp_grid_clumping(
        pack, chrs, pos, lpS, grid_thr_r2=(0.2,), grid_base_size=(100,),
        infos_imp=infos_imp, grid_thr_imp=(0.3, 0.9))
    assert len(grid) == 2
    k_low, k_high = all_keep[1][0], all_keep[1][1]
    # high-INFO cell only contains high-INFO variants
    assert np.all(infos_imp[k_high] >= 0.9)
    assert len(k_high) <= len(k_low)
    # grid rows ordered thr.imp-major (reference expand.grid order)
    np.testing.assert_allclose(grid["thr.imp"], [0.3, 0.9])


def test_grid_prs_on_disk_store(setup, tmp_path):
    """backingfile= writes the score FBM analog to disk chunk-by-chunk
    (reference R/SCT.R:244); identical values to the in-RAM path, and
    save/load re-attaches the memmap with relocatable fix-up."""
    pack, y, gwas, lpS, chrs, pos = (
        setup["pack"], setup["y"], setup["gwas"], setup["lpS"],
        setup["chrs"], setup["pos"])
    betas = gwas["estim"].to_numpy()
    all_keep, grid = snp_grid_clumping(
        pack, chrs, pos, lpS, grid_thr_r2=(0.1, 0.5), grid_base_size=(100,))

    ram = snp_grid_PRS(pack, all_keep, betas, lpS, n_thr_lpS=10)
    bf = tmp_path / "multi_prs"
    disk = snp_grid_PRS(pack, all_keep, betas, lpS, n_thr_lpS=10,
                        backingfile=bf)
    assert disk.backingfile.endswith(".npy")
    assert isinstance(disk.scores, np.memmap)
    np.testing.assert_array_equal(np.asarray(disk.scores), ram.scores)

    # refusing to overwrite an existing store
    with pytest.raises(FileExistsError):
        snp_grid_PRS(pack, all_keep, betas, lpS, n_thr_lpS=10,
                     backingfile=bf)

    meta = disk.save(tmp_path / "multi_prs")
    back = type(disk).load(meta)
    np.testing.assert_array_equal(np.asarray(back.scores), ram.scores)
    np.testing.assert_array_equal(back.grid_lpS_thr, disk.grid_lpS_thr)
    assert sorted(back.all_keep) == sorted(disk.all_keep)
    for c in disk.all_keep:
        for a, b in zip(back.all_keep[c], disk.all_keep[c]):
            np.testing.assert_array_equal(a, b)

    # stacking works unchanged on the memmapped store
    res = snp_grid_stacking(back, y, alphas=(1.0,), K=5, nlambda=30)
    assert np.isfinite(res["beta.G"]).all()

    # relocatable: move both files to a new dir, load by meta path
    import shutil

    newdir = tmp_path / "moved"
    newdir.mkdir()
    shutil.move(str(disk.backingfile), newdir / "multi_prs.npy")
    shutil.move(meta, newdir / "multi_prs.meta.npz")
    again = type(disk).load(newdir / "multi_prs.meta.npz")
    np.testing.assert_array_equal(np.asarray(again.scores), ram.scores)

    # read-only attach by default: works on a chmod-ed read-only store
    # and cannot mutate it (writable=True opts back into 'r+')
    import os

    os.chmod(newdir / "multi_prs.npy", 0o444)
    ro = type(disk).load(newdir / "multi_prs.meta.npz")
    np.testing.assert_array_equal(np.asarray(ro.scores), ram.scores)
    with pytest.raises(ValueError):
        ro.scores[0, 0] = 1.0


def test_grid_prs_string_chromosome_keys(setup, tmp_path):
    """save/load round-trips non-integer chromosome labels ('X', 'MT')
    coming through infos_chr (round-2 advisor finding)."""
    pack, gwas, lpS = setup["pack"], setup["gwas"], setup["lpS"]
    betas = gwas["estim"].to_numpy()
    chrs = np.where(np.arange(pack.m) < pack.m // 2, "X", "MT")
    pos = np.arange(pack.m) * 100
    all_keep, grid = snp_grid_clumping(
        pack, chrs, pos, lpS, grid_thr_r2=(0.5,), grid_base_size=(100,))
    disk = snp_grid_PRS(pack, all_keep, betas, lpS, n_thr_lpS=5,
                        backingfile=tmp_path / "xmt")
    meta = disk.save(tmp_path / "xmt")
    back = type(disk).load(meta)
    assert sorted(back.all_keep) == sorted(all_keep) == ["MT", "X"]
    for c in all_keep:
        for a, b in zip(back.all_keep[c], all_keep[c]):
            np.testing.assert_array_equal(a, b)
