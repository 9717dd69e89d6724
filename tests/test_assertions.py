"""Declarative argument contracts (reference check_args,
R/utils-assert.R:19-49): table keyed by argument name, applied by
decorator, gated by a global option."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu.utils.assertions import (ArgError, CONTRACTS, check_args,
                                          get_check_args, set_check_args)


def test_contract_table_applies_by_name():
    @check_args()
    def f(pack, ind_row=None, k=10):
        return "ok"

    pack = snp_fake(20, 30, seed=0)
    assert f(pack) == "ok"
    assert f(pack, ind_row=np.arange(5)) == "ok"
    with pytest.raises(ArgError, match="non-negative"):
        f(pack, ind_row=np.array([-1, 2]))
    with pytest.raises(ArgError, match="GenoPack"):
        f("not a pack")
    with pytest.raises(ArgError, match="one integer"):
        f(pack, k=2.5)
    assert set(f.__checked_args__) == {"pack", "ind_row", "k"}


def test_overrides_win():
    @check_args(k=lambda v, name: (_ for _ in ()).throw(ArgError("custom")))
    def f(k=1):
        return k

    with pytest.raises(ArgError, match="custom"):
        f(k=5)


def test_global_gate():
    @check_args()
    def f(ind_col=None):
        return "ran"

    assert get_check_args()
    set_check_args(False)
    try:
        assert f(ind_col=np.array([-5])) == "ran"   # checks off
    finally:
        set_check_args(True)
    with pytest.raises(ArgError):
        f(ind_col=np.array([-5]))


def test_df_beta_contract():
    from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_inf
    from bigsnpr_tpu.ops.corr import SparseLD
    import scipy.sparse as sp

    corr = SparseLD(upper=sp.identity(4, format="csc"))
    with pytest.raises(ArgError, match="beta_se"):
        snp_ldpred2_inf(corr, {"beta": np.ones(4)}, h2=0.3)
    with pytest.raises(ArgError, match="positive"):
        snp_ldpred2_inf(corr, {"beta": np.ones(4),
                               "beta_se": np.zeros(4),
                               "n_eff": np.full(4, 100.0)}, h2=0.3)


def test_entry_points_are_decorated():
    import bigsnpr_tpu as bt
    from bigsnpr_tpu.ops.corr import snp_cor
    from bigsnpr_tpu.ops.clumping import snp_clumping

    for fn in (snp_cor, snp_clumping, bt.snp_randomSVD):
        assert getattr(fn, "__checked_args__", None), fn

    pack = snp_fake(20, 30, seed=0)
    with pytest.raises(ArgError):
        snp_cor(pack, ind_col=np.array([-3]))


def test_readbed_exist_contract(tmp_path):
    from bigsnpr_tpu.io.bed import snp_readBed

    with pytest.raises(ArgError, match="does not exist"):
        snp_readBed(tmp_path / "nope.bed")


def test_contract_table_is_declarative():
    # the table is data, keyed by canonical argument names
    assert "ind_row" in CONTRACTS and "pack" in CONTRACTS
    assert callable(CONTRACTS["df_beta"])


def test_config_options_context():
    from bigsnpr_tpu import config

    assert config.get_option("matmul_precision") == "highest"
    with config.options(matmul_precision="default", check_args=False,
                        pallas_mxu="split2"):
        assert config.get_option("matmul_precision") == "default"
        assert config.get_option("check_args") is False
        assert config.pallas_mxu == "split2"
    assert config.get_option("matmul_precision") == "highest"
    assert config.get_option("check_args") is True
    assert config.pallas_mxu == "highest"
    with pytest.raises(KeyError):
        config.get_option("nope")


def test_infos_chr_none_is_allowed(example_pack):
    """infos_chr=None is the supported default (falls back to pack.map)
    — the contract must not reject it (round-2 advisor finding)."""
    from bigsnpr_tpu.ops.clumping import snp_clumping

    kept = snp_clumping(example_pack, infos_chr=None, thr_r2=0.5)
    kept2 = snp_clumping(example_pack, thr_r2=0.5)
    np.testing.assert_array_equal(kept, kept2)
