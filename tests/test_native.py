"""Native C++ I/O helpers == pure-numpy implementations."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu import native
from bigsnpr_tpu.core import unpack


needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native lib not built")


@needs_native
def test_bed_subset_pack_native():
    pack = snp_fake(123, 77, seed=71, na_prob=0.1)
    rows = np.sort(np.random.default_rng(0).choice(77, 30, replace=False))
    cols = np.sort(np.random.default_rng(1).choice(123, 50, replace=False))
    out = native.bed_subset_pack(np.asarray(pack.packed), rows, cols)
    assert out is not None
    # numpy oracle
    codes = unpack.np_unpack_codes(np.asarray(pack.packed), 123)
    expect = unpack.np_pack_codes(codes[rows][:, cols])
    np.testing.assert_array_equal(out, expect)


@needs_native
def test_bgen_native_matches_python(tmp_path):
    """Native decode == python decode on the reference BGEN fixture."""
    import os

    TESTDATA = "/root/reference/tests/testthat/testdata"
    if not os.path.isdir(TESTDATA):
        pytest.skip("fixtures unavailable")
    from bigsnpr_tpu.utils.rds import read_rds, unwrap
    from bigsnpr_tpu.io.bgen import (
        snp_readBGI, _parse_variant_header, _read_variant, check_bgen_format,
    )

    bgen = tmp_path / "ex.bgen"
    bgen.write_bytes(bytes(unwrap(read_rds(f"{TESTDATA}/bgen_example.rds"))))
    (tmp_path / "ex.bgen.bgi").write_bytes(
        bytes(unwrap(read_rds(f"{TESTDATA}/bgi_example.rds"))))
    info = snp_readBGI(str(bgen) + ".bgi")
    buf = bgen.read_bytes()
    N = check_bgen_format(bgen)
    ind_row = np.arange(N)
    offs, sizes = [], []
    for s in info["file_start_position"]:
        _, goff, csize = _parse_variant_header(buf, int(s), N)
        offs.append(goff)
        sizes.append(csize)
    out = native.bgen_decode_variants(buf, offs, sizes, N, ind_row, True)
    assert out is not None
    codes_nat, info_nat, freq_nat = out
    rng = np.random.default_rng(0)
    for k, s in enumerate(info["file_start_position"]):
        _, codes_py, inf_py, frq_py = _read_variant(buf, int(s), ind_row,
                                                    True, N, rng)
        np.testing.assert_array_equal(codes_nat[k], codes_py)
        np.testing.assert_allclose(info_nat[k], inf_py, rtol=1e-12)
        np.testing.assert_allclose(freq_nat[k], frq_py, rtol=1e-12)
