"""GRM + ancestry-summary tests."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake, bed_scaleBinom
from bigsnpr_tpu.ops.grm import bed_tcrossprodSelf, bed_GRM
from bigsnpr_tpu.pca.ancestry import snp_ancestry_summary
from tests.conftest import dense_standardized


def test_tcrossprod_oracle():
    pack = snp_fake(70, 150, seed=51, na_prob=0.04)
    K, center, scale = bed_tcrossprodSelf(pack)
    sc = bed_scaleBinom(pack)
    np.testing.assert_allclose(center, sc["center"], rtol=1e-12)
    Xt = dense_standardized(pack, center, np.where(scale > 0, scale, 1))
    Xt[:, scale == 0] = 0
    np.testing.assert_allclose(K, Xt @ Xt.T, rtol=2e-4, atol=2e-3)
    assert np.allclose(K, K.T)
    G = bed_GRM(pack)
    np.testing.assert_allclose(G, K / pack.m)


def test_ancestry_summary_recovers_proportions():
    rng = np.random.default_rng(6)
    m, npop = 2000, 4
    ref_freq = rng.uniform(0.05, 0.95, (m, npop))
    w_true = np.array([0.5, 0.3, 0.2, 0.0])
    freq = ref_freq @ w_true + rng.normal(0, 0.002, m)
    freq = np.clip(freq, 0, 1)
    # projection: PCs of the reference frequencies
    Xc = ref_freq - ref_freq.mean(axis=0)
    U, s, Vt = np.linalg.svd(Xc, full_matrices=False)
    P = U[:, :npop]
    correction = np.ones(npop)
    sol, info = snp_ancestry_summary(freq, ref_freq, P, correction)
    np.testing.assert_allclose(sol, w_true, atol=0.02)
    assert info["cor_pred"] > 0.99
    assert abs(sol.sum() - 1) < 1e-6

    # reversed frequencies -> error
    with pytest.raises(ValueError, match="reversed"):
        snp_ancestry_summary(1 - freq, ref_freq, P, correction)
