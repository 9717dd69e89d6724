"""pcadapt / MAX3 / Fst / GC / match — oracles + reference test cases."""

import numpy as np
import pandas as pd
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu.assoc.mhtest import MHTest, get_lambda_gc, snp_gc, chisq_log10_predictor
from bigsnpr_tpu.assoc.pcadapt import mult_lin_reg, snp_pcadapt
from bigsnpr_tpu.assoc.max3 import snp_MAX3, zcatt
from bigsnpr_tpu.assoc.fst import snp_fst
from bigsnpr_tpu.utils.match import snp_match, same_ref, snp_asGeneticPos


def test_mult_lin_reg_oracle():
    pack = snp_fake(120, 50, seed=31, na_prob=0.05)
    X = pack.to_dosage()
    rng = np.random.default_rng(0)
    U = rng.standard_normal((120, 3))
    t = mult_lin_reg(pack, U)
    # oracle: per-variant univariate regression t-stats (slope of y~x)
    from scipy import stats as ss

    for j in range(0, 50, 7):
        ok = ~np.isnan(X[:, j])
        for k in range(3):
            res = ss.linregress(X[ok, j], U[ok, k])
            t_oracle = res.slope / res.stderr
            np.testing.assert_allclose(t[j, k], t_oracle, rtol=1e-4)


def test_pcadapt_runs_and_calibrates():
    pack = snp_fake(300, 400, seed=32)
    rng = np.random.default_rng(1)
    U = np.linalg.qr(rng.standard_normal((300, 3)))[0]
    res = snp_pcadapt(pack, U)
    lp = res.lpval()
    assert lp.shape == (400,)
    # GC-corrected: lambda ~ 1
    assert abs(get_lambda_gc(res) - 1.0) < 0.05
    # null data: p-values roughly uniform
    assert (res.pval() < 0.05).mean() < 0.12


def test_max3_null_and_signal():
    pack = snp_fake(400, 200, seed=33)
    rng = np.random.default_rng(2)
    X = pack.to_dosage()
    # case status driven by variant 0 (dominant-ish)
    logits = (X[:, 0] >= 1) * 1.5 - 0.5
    y01 = (rng.random(400) < 1 / (1 + np.exp(-logits))).astype(int)
    res = snp_MAX3(pack, y01)
    assert res.score.shape == (200,)
    assert res.score[0] > np.quantile(res.score[1:], 0.99)
    # Armitage trend test = single val
    res2 = snp_MAX3(pack, y01, val=(0.5,))
    assert np.all(res2.score <= res.score + 1e-12)


def test_fst_oracle():
    """Weir-Cockerham on 2 populations with known divergence."""
    rng = np.random.default_rng(3)
    m = 500
    p_anc = rng.uniform(0.2, 0.8, m)
    # two populations drifted from ancestral
    fst_true = 0.1
    a = p_anc * (1 - fst_true) / fst_true
    b = (1 - p_anc) * (1 - fst_true) / fst_true
    p1 = rng.beta(a, b)
    p2 = rng.beta(a, b)
    N = 400
    af1 = rng.binomial(2 * N, p1) / (2 * N)
    af2 = rng.binomial(2 * N, p2) / (2 * N)
    df1 = {"af": af1, "N": np.full(m, N)}
    df2 = {"af": af2, "N": np.full(m, N)}
    overall = snp_fst([df1, df2], overall=True)
    assert 0.05 < overall < 0.16
    per = snp_fst([df1, df2])
    assert per.shape == (m,)
    with pytest.raises(ValueError):
        snp_fst([df1])


def test_gc_lambda():
    rng = np.random.default_rng(4)
    chi2 = rng.chisquare(1, 20000) * 1.3  # inflated by 1.3
    gwas = MHTest(score=chi2, predict=chisq_log10_predictor(1))
    lam = get_lambda_gc(gwas)
    assert abs(lam - 1.3) < 0.05
    corrected = snp_gc(gwas)
    assert abs(get_lambda_gc(corrected) - 1.0) < 1e-6


# ---- reference test-5-match.R exact cases --------------------------------

@pytest.fixture()
def match_frames():
    sumstats = pd.DataFrame({
        "chr": 1,
        "pos": [86303, 86331, 162463, 752566, 755890, 758144],
        "a0": ["T", "G", "C", "A", "T", "G"],
        "a1": ["G", "A", "T", "G", "A", "A"],
        "beta": [-1.868, 0.250, -0.671, 2.112, 0.239, 1.272],
        "p": [0.860, 0.346, 0.900, 0.456, 0.776, 0.383],
    })
    info_snp = pd.DataFrame({
        "chr": 1,
        "rsid": ["rs2949417", "rs115209712", "rs143399298", "rs3094315",
                 "rs3115858"],
        "a0": ["T", "A", "G", "A", "T"],
        "a1": ["G", "G", "A", "G", "A"],
        "pos": [86303, 86331, 162463, 752566, 755890],
    })
    return sumstats, info_snp


def test_snp_match_reference_cases(match_frames):
    sumstats, info_snp = match_frames
    m1 = snp_match(sumstats, info_snp, verbose=False)
    assert len(m1) == 4
    np.testing.assert_allclose(
        m1["beta"], np.asarray(sumstats["beta"][:4]) * [1, -1, 1, 1])

    m2 = snp_match(sumstats, info_snp, strand_flip=False, verbose=False)
    assert len(m2) == 4
    np.testing.assert_allclose(
        m2["beta"],
        np.asarray(sumstats["beta"].iloc[[0, 1, 3, 4]]) * [1, -1, 1, 1])

    m3 = snp_match(sumstats, info_snp, return_flip_and_rev=True, verbose=False)
    np.testing.assert_array_equal(m3["_FLIP_"], [False, False, True, False])
    np.testing.assert_array_equal(m3["_REV_"], [False, True, False, False])


def test_snp_match_by_rsid(match_frames):
    sumstats, info_snp = match_frames
    s2 = sumstats.copy()
    s2["rsid"] = ["rs2949417", "rs115209712", "rs143399298", "rs3094315",
                  "rs3115858", None]
    s2["pos"] = s2["pos"] + 10
    s2["beta"] = 1.0
    with pytest.raises(ValueError, match="No variant"):
        snp_match(s2, info_snp, verbose=False)
    mi = snp_match(s2, info_snp, join_by_pos=False, verbose=False)
    assert len(mi) == 4
    np.testing.assert_allclose(mi["beta"], [1, -1, 1, 1])
    np.testing.assert_array_equal(mi["pos.ss"], mi["pos"] + 10)
    # duplicate removal
    s3 = pd.concat([s2.iloc[[0]], s2], ignore_index=True)
    mdup = snp_match(s3, info_snp, join_by_pos=False, verbose=False)
    assert len(mdup) == 3


def test_same_ref_reference_case(match_frames):
    sumstats, info_snp = match_frames
    out = same_ref(info_snp["a1"], info_snp["a0"],
                   sumstats["a1"][:5], sumstats["a0"][:5])
    np.testing.assert_array_equal(out, [1, 0, 1, 1, 1])
    # doc example with NA
    out2 = same_ref(["A", "C", "T", "G", None], ["C", "T", "C", "A", "A"],
                    ["A", "C", "A", "A", "C"], ["C", "G", "G", "G", "A"])
    np.testing.assert_array_equal(out2[:4], [1, np.nan, 1, 0])
    assert np.isnan(out2[4]) and np.isnan(out2[1])


def test_as_genetic_pos_nn_and_rsid():
    """Reference test-5-match.R snp_asGeneticPos block."""
    info_pos = np.array([853954, 854250, 864938, 870645, 873558])
    info_rsid = ["rs1806509", "rs7537756", "rs2340587", "rs28576697",
                 "rs1110052"]
    gmap = pd.DataFrame({
        "rsid": ["rs1806509", "rs7537756", "rs28576697", "rs1110052"],
        "pos": [853954, 854250, 870645, 873558],
        "pos_cM": [0.194323402834, 0.194576977815, 0.202835640491,
                   0.203874368612],
    })
    res1 = snp_asGeneticPos(np.ones(5), info_pos, gmap)
    np.testing.assert_allclose(res1, np.asarray(gmap["pos_cM"])[[0, 1, 2, 2, 3]])
    res2 = snp_asGeneticPos(np.ones(5), info_pos, gmap, rsid=info_rsid)
    np.testing.assert_allclose(np.delete(res2, 2), gmap["pos_cM"])
    assert res2[1] < res2[2] < res2[3]
