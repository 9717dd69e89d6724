"""autoSVD option behaviors (reference test-2-autoSVD.R semantics)."""

import numpy as np
import pytest

from bigsnpr_tpu.pca.autosvd import snp_autoSVD


@pytest.fixture(scope="module")
def ex(example_pack):
    return dict(pack=example_pack,
                CHR=example_pack.map["chromosome"].to_numpy(),
                POS=example_pack.map["physical.pos"].to_numpy())


def test_errors(ex):
    with pytest.raises(ValueError, match="min_mac > 0"):
        snp_autoSVD(ex["pack"], ex["CHR"], min_mac=0)


def test_skip_clumping_equals_thr1(ex):
    """thr_r2=NaN (skip) ~ thr_r2=1 (clump keeps everything)
    (reference test-2-autoSVD.R:41-43)."""
    s5 = snp_autoSVD(ex["pack"], ex["CHR"], thr_r2=1.0, roll_size=0, k=6)
    s6 = snp_autoSVD(ex["pack"], ex["CHR"], thr_r2=np.nan, roll_size=0, k=6)
    np.testing.assert_array_equal(s5.subset, s6.subset)
    np.testing.assert_allclose(s5.d, s6.d, rtol=1e-5)


def test_size_and_roll_effects(ex):
    """Bigger windows prune more; roll_size=0 flags more outliers
    (reference test-2-autoSVD.R:30-37)."""
    base = snp_autoSVD(ex["pack"], ex["CHR"], k=6)
    small_win = snp_autoSVD(ex["pack"], ex["CHR"], size=5, k=6)
    assert len(small_win.subset) >= len(base.subset)
    no_roll = snp_autoSVD(ex["pack"], ex["CHR"], roll_size=0, k=6)
    assert len(no_roll.subset) <= len(base.subset)
    # higher tukey alpha -> more outliers removed
    stricter = snp_autoSVD(ex["pack"], ex["CHR"], alpha_tukey=0.999,
                           roll_size=0, k=6)
    assert len(stricter.subset) <= len(no_roll.subset)


def test_lrldr_reporting(ex):
    res = snp_autoSVD(ex["pack"], ex["CHR"], infos_pos=ex["POS"],
                      alpha_tukey=0.9999, roll_size=0, int_min_size=0, k=6)
    lr = res.lrldr
    assert list(lr.columns) == ["Chr", "Start", "Stop", "Iter"]
    if len(lr):
        assert lr["Iter"].min() >= 1
        assert (lr["Stop"] >= lr["Start"]).all()
