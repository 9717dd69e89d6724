"""Colstats / counts / MAF / scaling vs dense numpy oracle."""

import numpy as np
import pytest

from bigsnpr_tpu import (
    snp_fake, snp_counts, snp_colstats, snp_MAF, bed_MAF,
    snp_scaleBinom, bed_scaleBinom, snp_scaleAlpha,
)


@pytest.fixture(scope="module")
def pack():
    return snp_fake(123, 257, seed=7, na_prob=0.07)


def test_counts(pack):
    X = pack.to_dosage()
    counts = snp_counts(pack)
    for k in range(3):
        np.testing.assert_array_equal(counts[k], np.nansum(X == k, axis=0))
    np.testing.assert_array_equal(counts[3], np.isnan(X).sum(axis=0))


def test_counts_rowsubset(pack):
    ind = np.arange(10, 100)
    X = pack.to_dosage()[ind]
    counts = snp_counts(pack, ind_row=ind)
    np.testing.assert_array_equal(counts[3], np.isnan(X).sum(axis=0))
    np.testing.assert_array_equal(counts[1], np.nansum(X == 1, axis=0))


def test_colstats(pack):
    X = pack.to_dosage()
    s = snp_colstats(pack)
    np.testing.assert_allclose(s["sumX"], np.nansum(X, axis=0), rtol=1e-12)
    nona = (~np.isnan(X)).sum(0)
    deno = np.nansum(X**2, 0) - np.nansum(X, 0) ** 2 / nona
    np.testing.assert_allclose(s["denoX"], deno, rtol=1e-10)
    np.testing.assert_array_equal(s["nona"], nona)


def test_maf_scaling(pack):
    X = pack.to_dosage()
    nona = (~np.isnan(X)).sum(0)
    af = np.nansum(X, 0) / (2 * nona)
    np.testing.assert_allclose(snp_MAF(pack), np.minimum(af, 1 - af), rtol=1e-12)

    sc = bed_scaleBinom(pack)
    np.testing.assert_allclose(sc["center"], 2 * af, rtol=1e-12)
    np.testing.assert_allclose(sc["scale"], np.sqrt(2 * af * (1 - af)), rtol=1e-12)

    sca = snp_scaleAlpha(-0.5)(pack)
    np.testing.assert_allclose(sca["scale"], (2 * af * (1 - af)) ** 0.25, rtol=1e-10)


def test_bed_maf_frame(pack):
    X = pack.to_dosage()
    df = bed_MAF(pack)
    ac = np.nansum(X, 0)
    np.testing.assert_allclose(df["ac"], ac)
    np.testing.assert_array_equal(df["N"], (~np.isnan(X)).sum(0))


def test_counts_example(example_pack):
    """517x4542 complete-data counts sanity."""
    counts = snp_counts(example_pack)
    assert counts.sum(0).min() == 517 and counts.sum(0).max() == 517
    assert counts[3].sum() == 0
