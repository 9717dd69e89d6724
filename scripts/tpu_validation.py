"""On-chip validation suite — run when a TPU is reachable.

Measures (with data-dependent chained timing):
  1. XLA vs Pallas matvec throughput (the bench metric)
  2. randomized SVD wall time at a mid-size cohort
  3. Gibbs sweep throughput, sequential vs block-parallel vs sharded
  4. examples/full_pipeline.py at reduced size on-chip

Usage: python scripts/tpu_validation.py [--quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit_chained(step, x0, iters=10):
    out = step(x0)
    out.block_until_ready()
    out = step(out)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main(quick=False):
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices())
    assert jax.default_backend() != "cpu", "no TPU reachable"

    from bigsnpr_tpu.core.unpack import unpack_standardized
    from bigsnpr_tpu.ops import pallas_kernels as pk

    m, n, l = (32768, 8192, 8) if quick else (131072, 16384, 8)
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 256, size=(m, n // 4), dtype=np.uint8))
    center = jnp.asarray(rng.uniform(0.2, 1.8, m).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.3, 1.0, m).astype(np.float32))
    Q0 = jnp.asarray(rng.standard_normal((n, l)).astype(np.float32))

    # 1a. XLA power-iter
    block = 4096
    nblocks = m // block

    @jax.jit
    def xla_step(Q):
        Q = Q[:, :l] * 1e-3
        pb = packed.reshape(nblocks, block, n // 4)
        cb = center.reshape(nblocks, block)
        sb = scale.reshape(nblocks, block)

        def body(acc, args):
            p, c, s = args
            xt = unpack_standardized(p, n, c, s)
            z = jnp.dot(xt, Q, preferred_element_type=jnp.float32,
                        precision="highest")
            return acc + jnp.dot(xt.T, z, preferred_element_type=jnp.float32,
                                 precision="highest"), None

        acc, _ = jax.lax.scan(body, jnp.zeros((n, l), jnp.float32),
                              (pb, cb, sb))
        return acc

    dt = timeit_chained(xla_step, Q0)
    print(f"XLA power-iter: {dt*1e3:.1f} ms -> "
          f"{2*m*n/dt/1e9:.0f} G visits/s")

    # 1b. Pallas power-iter
    cs = np.zeros((8, m), dtype=np.float32)
    cs[0] = np.asarray(center)
    cs[1] = 1.0 / np.asarray(scale)
    csj = jnp.asarray(cs)
    perm = pk.sample_perm(n)
    permj = jnp.asarray(perm)
    inv_perm = jnp.asarray(np.argsort(perm))

    @jax.jit
    def pallas_step(Q):
        Qp = (Q[:, :l] * 1e-3).T[:, permj]
        Zt = pk.pallas_cprod(packed, Qp, csj)
        Yt = pk.pallas_prod(packed, Zt, csj)
        return Yt[:, inv_perm].T

    dtp = timeit_chained(pallas_step, Q0)
    print(f"Pallas power-iter: {dtp*1e3:.1f} ms -> "
          f"{2*m*n/dtp/1e9:.0f} G visits/s ({dt/dtp:.1f}x vs XLA)")

    # 2. SVD wall time
    from bigsnpr_tpu.core.genotypes import GenoPack
    from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD

    pack = GenoPack(packed=np.asarray(packed), n=n)
    for engine in ("xla", "pallas"):
        t0 = time.perf_counter()
        svd = snp_randomSVD(pack, k=10, tol=1e-4, engine=engine)
        print(f"randomSVD[{engine}]: {time.perf_counter()-t0:.1f}s "
              f"depth={svd.niter}")

    # 3. Gibbs throughput
    import scipy.sparse as sp
    from bigsnpr_tpu.ops.corr import SparseLD
    from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_grid

    mg, W = (20000, 100) if quick else (100000, 250)
    diags = [np.ones(mg)]
    offs = [0]
    for d in range(1, W + 1):
        diags.append(rng.normal(0, 0.3 / np.sqrt(d), mg - d))
        offs.append(d)
    corr = SparseLD(upper=sp.diags(diags, offs, format="csc").tocsc())
    df = {"beta": rng.normal(0, 0.01, mg), "beta_se": np.full(mg, 0.01),
          "n_eff": np.full(mg, 1e5)}
    grid1 = {"p": [0.1], "h2": [0.3], "sparse": [False]}

    t0 = time.perf_counter()
    snp_ldpred2_grid(corr, df, grid1, burn_in=10, num_iter=10)
    dt_seq = time.perf_counter() - t0
    print(f"Gibbs sequential: {dt_seq:.1f}s for 20x{mg} steps "
          f"({20*mg/dt_seq/1e3:.0f} steps/ms)")

    nb = mg // 2000
    blocks = np.full(nb, 2000)
    t0 = time.perf_counter()
    snp_ldpred2_grid(corr, df, grid1, burn_in=10, num_iter=10, blocks=blocks)
    dt_blk = time.perf_counter() - t0
    print(f"Gibbs block-parallel ({nb} blocks): {dt_blk:.1f}s "
          f"({dt_seq/dt_blk:.1f}x)")

    print("OK — update BENCH_NOTES.md with these numbers.")


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
