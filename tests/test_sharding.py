"""Shard-count invariance on the virtual 8-device CPU mesh — the
distributed analog of the reference's ncores=1 vs 2 bit-equality suite
(reference tests/testthat/test-7-OpenMP.R)."""

import numpy as np
import pytest

import jax

from bigsnpr_tpu import snp_fake, bed_scaleBinom
from bigsnpr_tpu.parallel import mesh as pmesh
from tests.conftest import dense_standardized


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _run_power_iter(pack, n_devices, l=4, seed=0):
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax.numpy as jnp

    mesh = pmesh.make_mesh(n_devices)
    packed, n, m, n_pad = pmesh.shard_pack(pack, mesh)
    m_pad = packed.shape[0]
    sc = bed_scaleBinom(pack)
    center = np.zeros(m_pad, dtype=np.float32)
    scale = np.ones(m_pad, dtype=np.float32)
    center[:m] = sc["center"]
    scale[:m] = np.where(sc["scale"] > 0, sc["scale"], 1.0)
    Qh = np.random.default_rng(seed).standard_normal((n_pad, l)).astype(np.float32)
    Qh[n:] = 0

    out = pmesh.power_iter_fn(mesh, n_pad)(
        jax.device_put(jnp.asarray(packed)),
        jax.device_put(jnp.asarray(Qh), NamedSharding(mesh, P("s", None))),
        jax.device_put(jnp.asarray(center), NamedSharding(mesh, P("v"))),
        jax.device_put(jnp.asarray(scale), NamedSharding(mesh, P("v"))))
    return np.asarray(out)[:n], sc


@needs_8
def test_power_iter_shard_invariance():
    pack = snp_fake(103, 57, seed=21, na_prob=0.06)
    out8, sc = _run_power_iter(pack, 8)
    out1, _ = _run_power_iter(pack, 1)
    np.testing.assert_allclose(out8, out1, rtol=2e-4, atol=2e-4)


@needs_8
def test_colstats_shard_invariance():
    pack = snp_fake(90, 41, seed=22, na_prob=0.1)
    import jax.numpy as jnp

    outs = []
    for nd in (8, 2, 1):
        mesh = pmesh.make_mesh(nd)
        packed, n, m, n_pad = pmesh.shard_pack(pack, mesh)
        stats = np.asarray(pmesh.colstats_fn(mesh)(packed))[:, :m]
        outs.append(stats)
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6)
    # oracle
    X = pack.to_dosage()
    np.testing.assert_allclose(outs[0][0], np.nansum(X, 0), rtol=1e-6)
    np.testing.assert_allclose(outs[0][2], (~np.isnan(X)).sum(0), rtol=1e-6)


@needs_8
def test_sharded_cprod_matches_dense():
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax.numpy as jnp

    pack = snp_fake(66, 30, seed=23, na_prob=0.05)
    mesh = pmesh.make_mesh(8)
    packed, n, m, n_pad = pmesh.shard_pack(pack, mesh)
    m_pad = packed.shape[0]
    sc = bed_scaleBinom(pack)
    center = np.zeros(m_pad, dtype=np.float32)
    scale = np.ones(m_pad, dtype=np.float32)
    center[:m] = sc["center"]
    scale[:m] = np.where(sc["scale"] > 0, sc["scale"], 1.0)
    V = np.zeros((n_pad, 3), dtype=np.float32)
    V[:n] = np.random.default_rng(1).standard_normal((n, 3))

    out = pmesh.cprod_fn(mesh)(
        jax.device_put(jnp.asarray(packed)),
        jax.device_put(jnp.asarray(V), NamedSharding(mesh, P("s", None))),
        jax.device_put(jnp.asarray(center), NamedSharding(mesh, P("v"))),
        jax.device_put(jnp.asarray(scale), NamedSharding(mesh, P("v"))))
    Xt = dense_standardized(pack, sc["center"],
                            np.where(sc["scale"] > 0, sc["scale"], 1.0))
    np.testing.assert_allclose(np.asarray(out)[:m], Xt.T @ V[:n],
                               rtol=2e-4, atol=2e-4)


@needs_8
def test_mesh_operator_svd_matches_single_device():
    """Full randomized SVD through the sharded MeshOperator == XLA path
    (the distributed compute path of autoSVD, BASELINE configs[4] analog)."""
    from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD

    pack = snp_fake(230, 170, seed=24, na_prob=0.04)
    svd_mesh = snp_randomSVD(pack, k=5, tol=1e-6, engine="mesh")
    svd_xla = snp_randomSVD(pack, k=5, tol=1e-6, engine="xla")
    np.testing.assert_allclose(svd_mesh.d, svd_xla.d, rtol=1e-4)
    for j in range(5):
        c = abs(np.dot(svd_mesh.u[:, j], svd_xla.u[:, j]))
        assert c > 0.999, (j, c)


@needs_8
def test_mesh_autosvd():
    """autoSVD end-to-end on the virtual 8-device mesh."""
    from bigsnpr_tpu.pca.autosvd import snp_autoSVD

    pack = snp_fake(150, 200, seed=25)
    res = snp_autoSVD(pack, thr_r2=0.95, min_mac=2, min_maf=0.01, k=4,
                      max_iter=1, svd_kwargs={"engine": "mesh"})
    assert res.d.shape == (4,)
    res_x = snp_autoSVD(pack, thr_r2=0.95, min_mac=2, min_maf=0.01, k=4,
                        max_iter=1, svd_kwargs={"engine": "xla"})
    np.testing.assert_allclose(res.d, res_x.d, rtol=1e-3)


def test_mesh_power_fused():
    """MeshOperator.power == (cprod, prod∘cprod) — one fused sharded
    program, both collectives on the mesh."""
    import numpy as np
    from bigsnpr_tpu import snp_fake, bed_scaleBinom
    from bigsnpr_tpu.parallel.mesh import MeshOperator, make_mesh

    pack = snp_fake(301, 140, seed=2, na_prob=0.05)
    sc = bed_scaleBinom(pack)
    op = MeshOperator(pack, sc["center"], sc["scale"], mesh=make_mesh(8))
    V = np.random.default_rng(0).standard_normal((301, 6)).astype(np.float32)
    B, Y = op.power(V)
    np.testing.assert_allclose(B, op.cprod(V), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Y, op.prod(op.cprod(V)), rtol=1e-4, atol=1e-4)
