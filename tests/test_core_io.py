"""Core container + PLINK I/O tests (reference test-1-readBed/writeBed semantics)."""

import numpy as np
import pytest

from bigsnpr_tpu import (
    GenoPack, snp_fake, snp_attach, snp_readBed, snp_writeBed, read_bed,
)
from bigsnpr_tpu.core import unpack


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(13, 21)).astype(np.uint8)
    packed = unpack.np_pack_codes(codes)
    assert packed.shape == (13, 6)
    out = unpack.np_unpack_codes(packed, 21)
    np.testing.assert_array_equal(out, codes)


def test_fake_dosage_values():
    pack = snp_fake(50, 30, seed=42, na_prob=0.1)
    X = pack.to_dosage()
    assert X.shape == (50, 30)
    vals = X[~np.isnan(X)]
    assert set(np.unique(vals)) <= {0.0, 1.0, 2.0}
    assert np.isnan(X).any()


def test_save_attach_roundtrip(tmp_path):
    pack = snp_fake(37, 11, seed=1, na_prob=0.05)
    path = pack.save(tmp_path / "test.gpk")
    pack2 = snp_attach(path)
    np.testing.assert_array_equal(np.asarray(pack.packed), np.asarray(pack2.packed))
    assert pack2.n == pack.n
    assert list(pack2.fam["sample.ID"]) == list(pack.fam["sample.ID"])


def test_bed_write_read_roundtrip(tmp_path):
    pack = snp_fake(37, 11, seed=2, na_prob=0.05)
    bedfile = tmp_path / "test.bed"
    snp_writeBed(pack, bedfile)
    pack2 = read_bed(bedfile)
    np.testing.assert_array_equal(np.asarray(pack.packed), np.asarray(pack2.packed))
    np.testing.assert_array_equal(pack.to_dosage(), pack2.to_dosage())


def test_subset():
    pack = snp_fake(20, 15, seed=3)
    sub = pack.subset(ind_row=np.arange(5, 15), ind_col=np.arange(0, 7))
    X = pack.to_dosage()
    np.testing.assert_array_equal(sub.to_dosage(), X[5:15, :7])
    assert len(sub.map) == 7


def test_read_reference_example(example_pack):
    assert example_pack.shape == (517, 4542)
    X = example_pack.to_dosage()
    assert not np.isnan(X).any()
    assert set(np.unique(X)) <= {0.0, 1.0, 2.0}


def test_read_reference_missing(example_missing_pack):
    X = example_missing_pack.to_dosage()
    assert np.isnan(X).any()


def test_bed_byte_identity(example_pack, tmp_path):
    """Byte-identical .bed round-trip (reference oracle, SURVEY §7 stage 1)."""
    out = tmp_path / "rt.bed"
    snp_writeBed(example_pack, out)
    orig = open("/root/reference/inst/extdata/example.bed", "rb").read()
    ours = open(out, "rb").read()
    assert orig == ours


def test_randomized_subsets(example_pack):
    """10 random row/col subsets == dense slicing (reference test-1-subset.R)."""
    X = example_pack.to_dosage()
    rng = np.random.default_rng(17)
    for k in range(10):
        ind_row = np.sort(rng.choice(example_pack.n, rng.integers(1, 51),
                                     replace=False))
        ind_col = np.sort(rng.choice(example_pack.m, rng.integers(1, 201),
                                     replace=False))
        sub = example_pack.subset(ind_row=ind_row, ind_col=ind_col)
        np.testing.assert_array_equal(sub.to_dosage(),
                                      X[np.ix_(ind_row, ind_col)])
        assert list(sub.fam["sample.ID"]) == \
            list(example_pack.fam["sample.ID"].iloc[ind_row])
        assert list(sub.map["marker.ID"]) == \
            list(example_pack.map["marker.ID"].iloc[ind_col])


def test_attach_reference_rds_bk_pair():
    """Interop: snp_attach on the reference's own .rds+.bk store
    (R/read-plink.R:128-139), incl. the relocatable backingfile fix-up —
    the stored path is a Windows path from the creator machine. Byte
    parity against a direct FBM code256 decode of the .bk."""
    import os

    rds = "/root/reference/tests/testthat/testdata/before_readonly.rds"
    if not os.path.exists(rds):
        pytest.skip("reference testdata not present")
    import bigsnpr_tpu as bt

    pack = bt.snp_attach(rds)
    assert (pack.n, pack.m) == (10, 20)
    # oracle: decode the raw .bk bytes through the serialized code256
    from bigsnpr_tpu.utils.rds import REnv, read_rds, unwrap

    obj = read_rds(rds)
    env = obj.value[0].attrs[".xData"]
    code256 = np.asarray(unwrap(env.frame[".->code256"]), dtype=float)
    raw = np.fromfile(
        "/root/reference/tests/testthat/testdata/before_readonly.bk",
        dtype=np.uint8).reshape(20, 10)   # (ncol, nrow): variant-major
    X_ref = code256[raw].T                # (n, m)
    np.testing.assert_array_equal(pack.to_dosage(), X_ref)

    # fam/map round out the bigSNP triple
    assert list(pack.fam["sample.ID"])[:2] == ["IND0", "IND1"]
    assert pack.map.shape[0] == 20

    # copy=False default keeps the GenoPack 2-bit canon
    assert pack.packed.shape == (20, 3)
