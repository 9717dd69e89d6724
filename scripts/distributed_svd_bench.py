"""Multi-process distributed SVD at 1000G scale (BASELINE configs[4],
as far as one machine allows): synthesize a 1000G-geometry .bed
(2,490 samples x M variants), run randomSVD through the distributed
MeshOperator on P processes (each mmapping ONLY its sample byte-shard),
and check parity against the single-process run.

Usage: python scripts/distributed_svd_bench.py [M_variants] [P_procs]
"""

import os
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORKER = r"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord, bed, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4], sys.argv[5])
sys.path.insert(0, sys.argv[6])
if nproc > 1:
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
from bigsnpr_tpu.parallel.distributed import (distributed_binom_operator,
                                              global_mesh)
from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD
t0 = time.perf_counter()
mesh = global_mesh()
op, sc = distributed_binom_operator(bed, mesh)
t_ingest = time.perf_counter() - t0
t0 = time.perf_counter()
svd = snp_randomSVD(None, fun_scaling=sc, k=10, tol=1e-4, op=op,
                    engine="mesh")
t_svd = time.perf_counter() - t0
np.savez(f"{outdir}/svd{pid}_{nproc}.npz", d=svd.d, u=svd.u,
         t_ingest=t_ingest, t_svd=t_svd, niter=svd.niter)
print(f"[p{pid}/{nproc}] ingest {t_ingest:.1f}s svd {t_svd:.1f}s "
      f"depth={svd.niter}", flush=True)
"""


def synth_bed(path, n, m, seed=0):
    rng = np.random.default_rng(seed)
    nb = (n + 3) // 4
    p = rng.uniform(0.05, 0.5, m)
    # 2-bit PLINK codes from binomial dosages, packed directly
    from bigsnpr_tpu.core import unpack

    with open(path, "wb") as f:
        f.write(bytes([0x6C, 0x1B, 0x01]))
        chunk = 4096
        for j0 in range(0, m, chunk):
            mm = min(chunk, m - j0)
            d = rng.binomial(2, p[j0:j0 + mm, None], size=(mm, n)).astype(float)
            f.write(unpack.np_pack_codes(
                unpack.np_dosage_to_codes(d)).tobytes())
    stem = str(path)[:-4]
    with open(stem + ".fam", "w") as f:
        f.writelines(f"F{i} S{i} 0 0 1 -9\n" for i in range(n))
    with open(stem + ".bim", "w") as f:
        f.writelines(f"1 snp{j} 0 {1000 + j} A C\n" for j in range(m))
    return path


def run(nproc, bed, outdir, workerfile):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, workerfile, str(p), str(nproc),
         f"127.0.0.1:{port}", bed, outdir,
         str(Path(__file__).resolve().parent.parent)])
        for p in range(nproc)]
    rc = [p.wait(timeout=1800) for p in procs]
    assert all(r == 0 for r in rc), rc


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nproc = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = 2490  # 1000G phase-3 sample count
    with tempfile.TemporaryDirectory() as d:
        bed = str(Path(d) / "synth1000g.bed")
        t0 = time.perf_counter()
        synth_bed(bed, n, m)
        print(f"synth .bed {n}x{m}: {os.path.getsize(bed)/1e6:.0f} MB "
              f"in {time.perf_counter()-t0:.0f}s")
        workerfile = str(Path(d) / "worker.py")
        Path(workerfile).write_text(WORKER)

        run(1, bed, d, workerfile)
        run(nproc, bed, d, workerfile)

        r1 = np.load(Path(d) / "svd0_1.npz")
        rP = np.load(Path(d) / f"svd0_{nproc}.npz")
        dd = np.abs(rP["d"] - r1["d"]).max() / r1["d"][0]
        cos = np.abs(np.sum(r1["u"] * rP["u"], axis=0))
        print(f"1 proc:  ingest {float(r1['t_ingest']):.1f}s "
              f"svd {float(r1['t_svd']):.1f}s")
        print(f"{nproc} procs: ingest {float(rP['t_ingest']):.1f}s "
              f"svd {float(rP['t_svd']):.1f}s")
        print(f"parity: max rel d-diff {dd:.2e}, min |cos(u)| {cos.min():.4f}")
        assert dd < 1e-3 and cos.min() > 0.99


if __name__ == "__main__":
    main()
