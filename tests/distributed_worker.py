"""Worker for the 2-process jax.distributed CPU test (test_distributed.py).

Each process initializes the distributed runtime, mmaps ONLY its sample
byte-shard of the .bed, and runs the mesh operator + randomSVD; results
are written to an .npz that the parent compares across processes and
against a dense oracle. This is the analog of the reference's
ncores=1-vs-2 determinism tests (tests/testthat/test-5-parallel.R) for
the multi-host backend the reference does not have (SURVEY.md §2.8).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    bedfile = sys.argv[4]
    outdir = sys.argv[5]

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * jax.local_device_count()

    from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD
    from bigsnpr_tpu.parallel.distributed import (distributed_binom_operator,
                                                  global_mesh)

    mesh = global_mesh()
    op, sc = distributed_binom_operator(bedfile, mesh)

    rng = np.random.default_rng(0)
    V = rng.standard_normal((op.n, 3)).astype(np.float32)
    U = rng.standard_normal((op.m, 3)).astype(np.float32)
    B = op.cprod(V)
    Y = op.prod(U)
    Bp, Yp = op.power(V)

    svd = snp_randomSVD(None, fun_scaling=sc, k=5, tol=1e-7,
                        op=op, engine="mesh")

    np.savez(f"{outdir}/out{pid}.npz", B=B, Y=Y, Bp=Bp, Yp=Yp,
             d=svd.d, u=svd.u, v=svd.v,
             center=sc["center"], scale=sc["scale"],
             ndev=jax.device_count(), nproc=jax.process_count())


if __name__ == "__main__":
    main()
