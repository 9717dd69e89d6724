"""BGEN reader: golden parity vs the reference's rbgen/QCTOOL fixtures
(reference test-1-readBGEN.R)."""

import os

import numpy as np
import pytest

TESTDATA = "/root/reference/tests/testthat/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference fixtures not available")


@pytest.fixture(scope="module")
def bgen_files(tmp_path_factory):
    from bigsnpr_tpu.utils.rds import read_rds, unwrap

    d = tmp_path_factory.mktemp("bgen")
    bgen = d / "ex.bgen"
    bgen.write_bytes(bytes(unwrap(read_rds(f"{TESTDATA}/bgen_example.rds"))))
    (d / "ex.bgen.bgi").write_bytes(
        bytes(unwrap(read_rds(f"{TESTDATA}/bgi_example.rds"))))
    return str(bgen)


@pytest.fixture(scope="module")
def oracles():
    from bigsnpr_tpu.utils.rds import read_rds, unwrap, to_frame

    variants = to_frame(read_rds(f"{TESTDATA}/bgen_variants.rds"))
    dosages = read_rds(f"{TESTDATA}/bgen_dosages.rds")
    dosages = np.asarray(unwrap(dosages))
    varinfo = to_frame(read_rds(f"{TESTDATA}/bgen_varinfo.rds"))
    return variants, dosages, varinfo


def test_read_bgi_full(bgen_files, oracles):
    from bigsnpr_tpu.io.bgen import snp_readBGI

    variants, _, _ = oracles
    info = snp_readBGI(bgen_files + ".bgi")
    np.testing.assert_array_equal(info["position"], variants["physical.pos"])
    np.testing.assert_array_equal(info["allele1"], variants["allele1"])


def test_format_snp_id():
    from bigsnpr_tpu.io.bgen import format_snp_id

    with pytest.raises(ValueError):
        format_snp_id(["1_88169_C_T", "01_88169_C_T", "1:88169_C_T"])
    assert format_snp_id(["1_88169_C_T", "01_88169_C_T"]) == \
        ["01_88169_C_T", "01_88169_C_T"]


def test_dosages_match_rbgen(bgen_files, oracles):
    """Dosage parity vs {rbgen} fixture (reference test-1-readBGEN.R:60-66)."""
    from bigsnpr_tpu.io.bgen import snp_readBGEN

    variants, dosages, _ = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    pack = snp_readBGEN(bgen_files, [IDs])
    X = pack.to_dosage()
    m = len(IDs)
    dosages = dosages.reshape(m, -1).T  # R matrix is (n, m) column-major
    excl = [17, 18]  # identical IDs (reference excl)
    keep = np.setdiff1d(np.arange(m), excl)
    np.testing.assert_allclose(X[:, keep], np.round(dosages[:, keep], 2),
                               atol=1e-12, equal_nan=True)
    # the one missing value
    assert np.isnan(X[:, keep].T.ravel(order="C")[500])


def test_varinfo_match_qctool(bgen_files, oracles):
    """freq/INFO parity vs QCTOOL fixture (reference test-1-readBGEN.R:70-85)."""
    from bigsnpr_tpu.io.bgen import snp_readBGEN

    variants, _, varinfo = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    pack = snp_readBGEN(bgen_files, [IDs])
    keep = np.setdiff1d(np.arange(len(IDs)), [18])
    # fixture values are printed with 6 significant digits
    np.testing.assert_allclose(
        pack.map["freq"].to_numpy()[keep],
        np.asarray(varinfo["alleleB_frequency"], dtype=float)[keep],
        rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        pack.map["info"].to_numpy()[keep],
        np.asarray(varinfo["impute_info"], dtype=float)[keep],
        rtol=2e-5, atol=1e-6)
    X = pack.to_dosage()
    np.testing.assert_allclose(pack.map["freq"],
                               np.nanmean(X, axis=0) / 2, atol=2e-4)


def test_hard_calls_and_subset(bgen_files, oracles):
    from bigsnpr_tpu.io.bgen import snp_readBGEN

    variants, dosages, _ = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    pack = snp_readBGEN(bgen_files, [IDs], read_as="random", seed=0)
    X = pack.to_dosage()
    m = len(IDs)
    dos = dosages.reshape(m, -1).T
    # sampled hard calls agree with dosages in expectation
    keep = np.setdiff1d(np.arange(m), [17, 18])
    both = ~np.isnan(X[:, keep]) & ~np.isnan(dos[:, keep])
    assert abs(X[:, keep][both].mean() - dos[:, keep][both].mean()) < 0.05
    # row subset (dosage mode both times)
    rows = np.arange(0, 300, 2)
    pack_full = snp_readBGEN(bgen_files, [IDs])
    pack_sub = snp_readBGEN(bgen_files, [IDs], ind_row=rows)
    np.testing.assert_allclose(pack_sub.to_dosage(), pack_full.to_dosage()[rows],
                               equal_nan=True)


def test_prod_bgen(bgen_files, oracles):
    """Streaming BGEN product (reference snp_prodBGEN)."""
    from bigsnpr_tpu.io.bgen import snp_prodBGEN

    variants, dosages, _ = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    m = len(IDs)
    rng = np.random.default_rng(5)
    beta = rng.standard_normal(m)
    out = snp_prodBGEN(bgen_files, beta, IDs)
    dos = dosages.reshape(m, -1).T.copy()  # exact dosages from rbgen
    # duplicate IDs (cols 17/18) both resolve to the first record (R match())
    dos[:, 18] = dos[:, 17]
    oracle = dos @ beta              # NaN propagates
    np.testing.assert_allclose(out, oracle, rtol=1e-6, equal_nan=True)


def test_bgen_to_pgs_flow(bgen_files, oracles):
    """Imputed-data pipeline: BGEN dosages -> LD -> LDpred2-grid runs."""
    from bigsnpr_tpu.io.bgen import snp_readBGEN
    from bigsnpr_tpu.ops.corr import snp_cor
    from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_grid

    variants, dosages, _ = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    pack = snp_readBGEN(bgen_files, [IDs])
    # QC as a user would: drop near-monomorphic + duplicate-position variants
    X = pack.to_dosage()
    af = np.nanmean(X, axis=0) / 2
    maf_ok = np.minimum(af, 1 - af) > 0.05
    _, first = np.unique(variants["physical.pos"], return_index=True)
    keep = np.zeros(pack.m, dtype=bool)
    keep[first] = True
    keep &= maf_ok
    pack = pack.subset(ind_col=np.nonzero(keep)[0])
    # prune perfect proxies (the fixture repeats dosage patterns at
    # distinct positions; |r|=1 pairs make any sampler diverge, as in
    # the reference) — standard clumping step
    from bigsnpr_tpu.ops.clumping import snp_clumping

    kept = snp_clumping(pack, infos_chr=np.ones(pack.m, dtype=int),
                        thr_r2=0.95, size=pack.m)
    pack = pack.subset(ind_col=kept)
    m = pack.m
    corr = snp_cor(pack, size=m, fill_diag=True)
    assert corr.shape == (m, m)
    assert np.isfinite(corr.upper.data).all()

    rng = np.random.default_rng(4)
    df_beta = {"beta": rng.normal(0, 0.02, m),
               "beta_se": np.full(m, 0.02),
               "n_eff": np.full(m, 10000.0)}
    out = snp_ldpred2_grid(corr, df_beta,
                           {"p": [0.5], "h2": [0.3], "sparse": [False]},
                           burn_in=30, num_iter=50)
    assert out.shape == (m, 1)
    assert np.isfinite(out).all()


def test_prod_bgen_device_engine(bgen_files, oracles):
    """The accelerator GEMM path (hi/lo beta split) tracks the exact host
    product to ~1e-6 relative."""
    from bigsnpr_tpu.io.bgen import snp_prodBGEN

    variants, dosages, _ = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    rng = np.random.default_rng(5)
    beta = rng.standard_normal(len(IDs))
    host = snp_prodBGEN(bgen_files, beta, IDs, engine="host")
    dev = snp_prodBGEN(bgen_files, beta, IDs, engine="device",
                       block_size=7)  # force multi-block accumulation
    np.testing.assert_allclose(dev, host, rtol=5e-6, atol=5e-6,
                               equal_nan=True)


def test_streaming_chunked_matches_whole(bgen_files, oracles):
    """chunk_variants=3 (many chunks, unordered write-back) == one chunk."""
    from bigsnpr_tpu.io.bgen import snp_readBGEN

    variants, _, _ = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    a = snp_readBGEN(bgen_files, [IDs])
    b = snp_readBGEN(bgen_files, [IDs], chunk_variants=3)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_allclose(a.map["info"], b.map["info"],
                               equal_nan=True)


def test_streaming_backingfile_memmap(bgen_files, oracles, tmp_path):
    """Backed ingest writes incrementally into the .dpk store; reload
    round-trips."""
    from bigsnpr_tpu.core.dosage import DosagePack
    from bigsnpr_tpu.io.bgen import snp_readBGEN

    variants, _, _ = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    store = tmp_path / "ex.dpk"
    pack = snp_readBGEN(bgen_files, [IDs], backingfile=store,
                        chunk_variants=5)
    assert isinstance(pack.codes, np.memmap)
    re = DosagePack.load(store)
    np.testing.assert_array_equal(np.asarray(re.codes),
                                  np.asarray(pack.codes))
    np.testing.assert_allclose(re.map["freq"], pack.map["freq"],
                               equal_nan=True)


def test_streaming_halfwritten_cleanup(bgen_files, oracles, tmp_path,
                                       monkeypatch):
    """A failure mid-ingest removes the half-written store (reference
    R/read-bgen.R:191)."""
    import bigsnpr_tpu.io.bgen as bgen_mod

    variants, _, _ = oracles
    IDs = [f"1_{p}_{a1}_{a2}" for p, a1, a2 in zip(
        variants["physical.pos"], variants["allele1"], variants["allele2"])]
    store = tmp_path / "boom.dpk"

    calls = {"k": 0}
    orig = bgen_mod._ingest_one_bgen

    def exploding(*a, **kw):
        calls["k"] += 1
        raise RuntimeError("disk on fire")

    monkeypatch.setattr(bgen_mod, "_ingest_one_bgen", exploding)
    with pytest.raises(RuntimeError):
        bgen_mod.snp_readBGEN(bgen_files, [IDs], backingfile=store)
    assert calls["k"] == 1
    assert not store.exists()
