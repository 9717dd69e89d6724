"""Pallas fused decode+GEMM kernels vs dense oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake, bed_scaleBinom
from bigsnpr_tpu.ops.pallas_kernels import PallasOperator, sample_perm, TN
from tests.conftest import dense_standardized


def test_sample_perm_is_permutation():
    p = sample_perm(2 * TN)
    assert sorted(p) == list(range(2 * TN))


@pytest.mark.parametrize("n,m", [(523, 300), (1024, 256), (77, 520)])
def test_pallas_matvec_pair(n, m):
    pack = snp_fake(n, m, seed=61, na_prob=0.06)
    sc = bed_scaleBinom(pack)
    scale = np.where(sc["scale"] > 0, sc["scale"], 1.0)
    op = PallasOperator(pack, sc["center"], scale, interpret=True)
    Xt = dense_standardized(pack, sc["center"], scale)

    rng = np.random.default_rng(0)
    V = rng.standard_normal((n, 5))
    np.testing.assert_allclose(op.cprod(V), Xt.T @ V, rtol=2e-4, atol=2e-4)
    U = rng.standard_normal((m, 3))
    np.testing.assert_allclose(op.prod(U), Xt @ U, rtol=2e-4, atol=2e-4)
    v = rng.standard_normal(n)
    np.testing.assert_allclose(op.cprod(v), Xt.T @ v, rtol=2e-4, atol=2e-4)


def test_pallas_monomorphic_and_na():
    """scale-0 variants contribute 0; NA handled as mean-impute 0."""
    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack

    rng = np.random.default_rng(1)
    X = rng.binomial(2, 0.3, size=(100, 40)).astype(float)
    X[:, 7] = 2.0   # monomorphic
    X[rng.random((100, 40)) < 0.1] = np.nan
    X[:, 7] = 2.0
    pack = GenoPack(packed=unpack.np_pack_codes(unpack.np_dosage_to_codes(X.T)),
                    n=100)
    sc = bed_scaleBinom(pack)
    op = PallasOperator(pack, sc["center"], sc["scale"], interpret=True)
    out = op.cprod(np.ones(100))
    assert out[7] == 0.0
    Xt = dense_standardized(pack, sc["center"],
                            np.where(sc["scale"] > 0, sc["scale"], 1))
    Xt[:, 7] = 0
    np.testing.assert_allclose(out, Xt.T @ np.ones(100), rtol=1e-4, atol=1e-4)

@pytest.mark.parametrize("cls", ["pallas", "xla"])
def test_masked_operator_equals_physical_subset(cls):
    """ind_row/ind_col masking on the full device-resident pack must act
    exactly as the physically subsetted matrix (no-repack autoSVD path)."""
    from bigsnpr_tpu.ops.matvec import XlaOperator

    n, m = 223, 140
    pack = snp_fake(n, m, seed=7, na_prob=0.05)
    rng = np.random.default_rng(3)
    ind_row = np.sort(rng.choice(n, size=150, replace=False))
    ind_col = np.sort(rng.choice(m, size=90, replace=False))

    sub = pack.subset(ind_row=ind_row, ind_col=ind_col)
    sc_sub = bed_scaleBinom(sub)
    scale_sub = np.where(sc_sub["scale"] > 0, sc_sub["scale"], 1.0)
    Xt = dense_standardized(sub, sc_sub["center"], scale_sub)

    sc_full = bed_scaleBinom(pack, ind_row=ind_row)
    if cls == "pallas":
        op = PallasOperator(pack, sc_full["center"], sc_full["scale"],
                            interpret=True, ind_row=ind_row, ind_col=ind_col)
    else:
        op = XlaOperator(pack, sc_full["center"], sc_full["scale"],
                         ind_row=ind_row, ind_col=ind_col)
    assert (op.n, op.m) == (150, 90)

    V = rng.standard_normal((150, 4))
    np.testing.assert_allclose(op.cprod(V), Xt.T @ V, rtol=2e-4, atol=2e-4)
    U = rng.standard_normal((90, 4))
    np.testing.assert_allclose(op.prod(U), Xt @ U, rtol=2e-4, atol=2e-4)
    B, Y = op.power(V)
    np.testing.assert_allclose(B, Xt.T @ V, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(Y, Xt @ (Xt.T @ V), rtol=2e-4, atol=3e-3)


def test_power_fuses_cprod_prod():
    pack = snp_fake(101, 64, seed=11, na_prob=0.04)
    sc = bed_scaleBinom(pack)
    scale = np.where(sc["scale"] > 0, sc["scale"], 1.0)
    op = PallasOperator(pack, sc["center"], scale, interpret=True)
    rng = np.random.default_rng(5)
    V = rng.standard_normal((101, 6))
    B, Y = op.power(V)
    np.testing.assert_allclose(B, op.cprod(V), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Y, op.prod(op.cprod(V)), rtol=1e-4, atol=1e-4)


def test_randomsvd_masked_subset_parity():
    """snp_randomSVD(ind_row, ind_col) via the masked device path equals
    the SVD of the physical subset."""
    from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD

    pack = snp_fake(180, 120, seed=23, na_prob=0.03)
    rng = np.random.default_rng(9)
    ind_row = np.sort(rng.choice(180, size=120, replace=False))
    ind_col = np.sort(rng.choice(120, size=80, replace=False))

    svd = snp_randomSVD(pack, k=5, tol=1e-7, ind_row=ind_row,
                        ind_col=ind_col, engine="xla")
    sub = pack.subset(ind_row=ind_row, ind_col=ind_col)
    sc = bed_scaleBinom(sub)
    Xt = dense_standardized(sub, sc["center"],
                            np.where(sc["scale"] > 0, sc["scale"], 1.0))
    u, s, vt = np.linalg.svd(Xt, full_matrices=False)
    np.testing.assert_allclose(svd.d, s[:5], rtol=1e-4)
    cos = np.abs(np.sum(svd.u * u[:, :5], axis=0))
    np.testing.assert_allclose(cos, 1.0, atol=1e-3)


def test_split2_mxu_parity():
    """Exact-integer bf16 bit-plane kernels (mxu='split2') match the
    f64 oracle to ~1e-5 rel — the integer planes are exact in bf16,
    only the hi/lo Q split rounds (4 single MXU passes vs 6)."""
    import jax.numpy as jnp

    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(3)
    m, n, l = 512, 2048, 8
    packed = rng.integers(0, 256, size=(m, n // 4), dtype=np.uint8)
    center = rng.uniform(0.2, 1.8, m)
    scale = rng.uniform(0.3, 1.0, m)

    codes = unpack.np_unpack_codes(packed, n)
    na = codes == 1
    d = np.where(na, 0, 2 - ((codes.astype(int) + 1) >> 1)).astype(float)
    xt = np.where(na, 0.0, (d - center[:, None]) / scale[:, None])

    from bigsnpr_tpu.core.genotypes import GenoPack

    pack = GenoPack(packed=packed, n=n)
    op = pk.PallasOperator(pack, center, scale, interpret=True,
                           mxu="split2")
    V = rng.standard_normal((n, l)).astype(np.float32)
    B = op.cprod(V)
    ref = xt @ V
    assert np.abs(B - ref).max() / np.abs(ref).max() < 2e-5
    U = rng.standard_normal((m, l)).astype(np.float32)
    Y = op.prod(U)
    ref2 = xt.T @ U
    assert np.abs(Y - ref2).max() / np.abs(ref2).max() < 2e-5


def test_int8_mxu_parity():
    """int8-MXU bit-plane kernels (mxu='int8'): T/NA planes exact int8,
    Q as 4 radix-128 int8 digits (28-bit operand) — matches the f64
    oracle to ~1e-6 rel."""
    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack
    from bigsnpr_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(4)
    m, n, l = 512, 2048, 8
    packed = rng.integers(0, 256, size=(m, n // 4), dtype=np.uint8)
    center = rng.uniform(0.2, 1.8, m)
    scale = rng.uniform(0.3, 1.0, m)

    codes = unpack.np_unpack_codes(packed, n)
    na = codes == 1
    d = np.where(na, 0, 2 - ((codes.astype(int) + 1) >> 1)).astype(float)
    xt = np.where(na, 0.0, (d - center[:, None]) / scale[:, None])

    pack = GenoPack(packed=packed, n=n)
    op = pk.PallasOperator(pack, center, scale, interpret=True, mxu="int8")
    V = rng.standard_normal((n, l)).astype(np.float32)
    B = op.cprod(V)
    ref = xt @ V
    assert np.abs(B - ref).max() / np.abs(ref).max() < 5e-6
    U = rng.standard_normal((m, l)).astype(np.float32)
    Y = op.prod(U)
    ref2 = xt.T @ U
    assert np.abs(Y - ref2).max() / np.abs(ref2).max() < 5e-6
    # fused power step too (cross-program f32 reduction order differs,
    # so compare max-normalized, not per-element relative)
    Bp, Yp = op.power(V)
    assert np.abs(Bp - ref).max() / np.abs(ref).max() < 5e-6
    ref3 = xt.T @ ref
    assert np.abs(Yp - ref3).max() / np.abs(ref3).max() < 5e-6


def test_int8_nona_parity():
    """NA-free fast path (auto-detected): skips the NA plane, exact on
    imputed packs."""
    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack
    from bigsnpr_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(7)
    m, n, l = 256, 1000, 8  # n % 4 != 0: exercises the partial last byte
    codes = rng.choice(np.array([0, 2, 3], np.uint8), size=(m, n))
    packed = unpack.np_pack_codes(codes)
    center = rng.uniform(0.2, 1.8, m)
    scale = rng.uniform(0.3, 1.0, m)
    d = (2 - ((codes.astype(int) + 1) >> 1)).astype(float)
    xt = (d - center[:, None]) / scale[:, None]

    pack = GenoPack(packed=packed, n=n)
    op = pk.PallasOperator(pack, center, scale, interpret=True, mxu="int8")
    assert op.nona is True  # auto-detected
    V = rng.standard_normal((n, l)).astype(np.float32)
    B = op.cprod(V)
    ref = xt @ V
    assert np.abs(B - ref).max() / np.abs(ref).max() < 5e-6
    U = rng.standard_normal((m, l)).astype(np.float32)
    Y = op.prod(U)
    ref2 = xt.T @ U
    assert np.abs(Y - ref2).max() / np.abs(ref2).max() < 5e-6
    # a pack containing NA must NOT take the fast path
    codes_na = codes.copy()
    codes_na[0, 0] = 1
    op_na = pk.PallasOperator(GenoPack(packed=unpack.np_pack_codes(codes_na),
                                       n=n), center, scale, interpret=True,
                              mxu="int8")
    assert op_na.nona is False


def test_int8m_materialized_planes():
    """int8m (at-rest int8 planes, zero per-pass decode) matches the
    dense oracle with and without NAs."""
    import numpy as np
    from bigsnpr_tpu import snp_fake, bed_scaleBinom
    from bigsnpr_tpu.ops import pallas_kernels as pk

    for na_prob in (0.0, 0.05):
        pack = snp_fake(256, 640, seed=3, na_prob=na_prob)
        sc = bed_scaleBinom(pack)
        op = pk.PallasOperator(pack, sc["center"], sc["scale"], mxu="int8m")
        rng = np.random.default_rng(1)
        V = rng.standard_normal((pack.n, 8)).astype(np.float32)
        B, Y = op.power(V)
        X = pack.to_dosage()
        Xt = np.nan_to_num((X - sc["center"]) /
                           np.where(sc["scale"] > 0, sc["scale"], 1.0))
        Bo = Xt.T @ V
        np.testing.assert_allclose(B, Bo, atol=2e-4 * np.abs(Bo).max())
        Yo = Xt @ Bo
        np.testing.assert_allclose(Y, Yo, atol=2e-4 * np.abs(Yo).max())
