"""Matvec pair + randomized SVD vs dense oracle."""

import numpy as np
import pytest

from bigsnpr_tpu import (
    snp_fake, snp_prodVec, snp_cprodVec, bed_scaleBinom, snp_randomSVD,
)
from tests.conftest import dense_standardized


@pytest.fixture(scope="module")
def pack():
    return snp_fake(89, 211, seed=11, na_prob=0.05)


@pytest.fixture(scope="module")
def scaled(pack):
    sc = bed_scaleBinom(pack)
    return sc["center"], sc["scale"]


def test_cprod(pack, scaled):
    center, scale = scaled
    Xt = dense_standardized(pack, center, scale)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(pack.n)
    out = np.asarray(snp_cprodVec(pack, v, center, scale))
    np.testing.assert_allclose(out, Xt.T @ v, rtol=2e-4, atol=2e-4)


def test_prod(pack, scaled):
    center, scale = scaled
    Xt = dense_standardized(pack, center, scale)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(pack.m)
    out = np.asarray(snp_prodVec(pack, u, center, scale))
    np.testing.assert_allclose(out, Xt @ u, rtol=2e-4, atol=2e-4)


def test_matmat(pack, scaled):
    center, scale = scaled
    Xt = dense_standardized(pack, center, scale)
    rng = np.random.default_rng(2)
    V = rng.standard_normal((pack.n, 5))
    U = rng.standard_normal((pack.m, 3))
    np.testing.assert_allclose(
        np.asarray(snp_cprodVec(pack, V, center, scale)), Xt.T @ V, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(snp_prodVec(pack, U, center, scale)), Xt @ U, rtol=2e-4, atol=2e-4)


def test_small_block(pack, scaled):
    """Block-size invariance (padding correctness)."""
    center, scale = scaled
    rng = np.random.default_rng(3)
    v = rng.standard_normal(pack.n)
    a = np.asarray(snp_cprodVec(pack, v, center, scale, block=16))
    b = np.asarray(snp_cprodVec(pack, v, center, scale, block=64))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    u = rng.standard_normal(pack.m)
    c = np.asarray(snp_prodVec(pack, u, center, scale, block=16))
    d = np.asarray(snp_prodVec(pack, u, center, scale, block=64))
    np.testing.assert_allclose(c, d, rtol=1e-5, atol=1e-5)


def test_randomsvd_vs_dense(pack):
    sc = bed_scaleBinom(pack)
    Xt = dense_standardized(pack, sc["center"], sc["scale"])
    u_d, s_d, vt_d = np.linalg.svd(Xt, full_matrices=False)
    res = snp_randomSVD(pack, k=6, tol=1e-7)
    np.testing.assert_allclose(res.d, s_d[:6], rtol=1e-4)
    # subspace alignment per component (sign-invariant)
    for j in range(6):
        c = abs(np.dot(res.u[:, j], u_d[:, j]))
        assert c > 0.999, f"PC{j}: |cos| = {c}"


def test_randomsvd_device_engine(pack):
    """Fully on-device Krylov (the TPU path) == dense oracle; exercised
    on CPU via engine="device"."""
    sc = bed_scaleBinom(pack)
    Xt = dense_standardized(pack, sc["center"], sc["scale"])
    u_d, s_d, _ = np.linalg.svd(Xt, full_matrices=False)
    res = snp_randomSVD(pack, k=6, tol=1e-6, engine="device")
    np.testing.assert_allclose(res.d, s_d[:6], rtol=1e-3)
    for j in range(6):
        c = abs(np.dot(res.u[:, j], u_d[:, j]))
        assert c > 0.995, f"PC{j}: |cos| = {c}"


def test_randomsvd_device_masked(pack):
    """device engine with ind_row/ind_col == host engine on the subset."""
    rng = np.random.default_rng(5)
    ind_row = np.sort(rng.choice(pack.n, 60, replace=False))
    ind_col = np.sort(rng.choice(pack.m, 150, replace=False))
    a = snp_randomSVD(pack, k=4, tol=1e-6, engine="device",
                      ind_row=ind_row, ind_col=ind_col)
    b = snp_randomSVD(pack, k=4, tol=1e-6,
                      ind_row=ind_row, ind_col=ind_col)
    np.testing.assert_allclose(a.d, b.d, rtol=1e-3)
    for j in range(4):
        c = abs(np.dot(a.u[:, j], b.u[:, j]))
        assert c > 0.99, f"PC{j}: |cos| = {c}"


def test_randomsvd_example(example_pack):
    """configs[0] slice: example.bed K=10 PC parity vs dense oracle."""
    sc = bed_scaleBinom(example_pack)
    Xt = dense_standardized(example_pack, sc["center"], sc["scale"])
    u_d, s_d, vt_d = np.linalg.svd(Xt, full_matrices=False)
    res = snp_randomSVD(example_pack, k=10, tol=1e-7)
    np.testing.assert_allclose(res.d, s_d[:10], rtol=1e-3)
    scores = res.scores()
    oracle = u_d[:, :10] * s_d[:10]
    for j in range(10):
        c = abs(np.dot(scores[:, j], oracle[:, j])) / (
            np.linalg.norm(scores[:, j]) * np.linalg.norm(oracle[:, j]))
        assert c > 0.99, f"PC{j}: |cos| = {c}"
