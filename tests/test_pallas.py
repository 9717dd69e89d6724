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
