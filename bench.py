"""Driver benchmark: standardized genotype matvec throughput per chip.

Metric: Gvariant·samples/s/chip through the fused decode+GEMM power-
iteration step (the hot loop of bed_randomSVD/autoSVD and PRS scoring;
reference hot loop src/bed-prod-vec.cpp:15-97). Each power iteration
touches every genotype twice (X̃ᵀQ then X̃·).

Baseline: the reference's OpenMP bed matvec is a memory-bound byte-per-
genotype pass; on its README hardware class (15 cores, ~25 GB/s DDR)
that is ~10 G genotype-visits/s. vs_baseline = ours / 10e9.

Prints ONE JSON line.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_GVS = 10.0  # G genotype-visits/s, reference-class CPU estimate


def main():
    import jax
    import jax.numpy as jnp
    from bigsnpr_tpu.core.unpack import unpack_standardized

    # synthetic cohort: 131072 variants x 16384 samples (512 MB packed)
    m, n, l = 131072, 16384, 8
    rng = np.random.default_rng(0)
    packed = rng.integers(0, 256, size=(m, n // 4), dtype=np.uint8)
    center = rng.uniform(0.2, 1.8, m).astype(np.float32)
    scale = rng.uniform(0.3, 1.0, m).astype(np.float32)
    Q0 = rng.standard_normal((n, l)).astype(np.float32)

    block = 4096
    nblocks = m // block

    @jax.jit
    def power_iter(packed, Q, center, scale):
        pb = packed.reshape(nblocks, block, n // 4)
        cb = center.reshape(nblocks, block)
        sb = scale.reshape(nblocks, block)

        def body(acc, args):
            p, c, s = args
            xt = unpack_standardized(p, n, c, s)
            z = jnp.dot(xt, Q, preferred_element_type=jnp.float32,
                        precision="highest")
            acc = acc + jnp.dot(xt.T, z, preferred_element_type=jnp.float32,
                                precision="highest")
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.zeros((n, l), jnp.float32),
                              (pb, cb, sb))
        return acc

    dev_packed = jnp.asarray(packed)
    dev_c, dev_s, dev_q = jnp.asarray(center), jnp.asarray(scale), jnp.asarray(Q0)

    out = power_iter(dev_packed, dev_q, dev_c, dev_s)  # compile + warm
    out.block_until_ready()

    niter = 5
    t0 = time.perf_counter()
    for _ in range(niter):
        out = power_iter(dev_packed, out[:, :l] / np.float32(1e3), dev_c, dev_s)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    visits = 2.0 * m * n * niter
    gvs = visits / dt / 1e9
    print(json.dumps({
        "metric": "genotype matvec Gvariant*samples/s/chip",
        "value": round(gvs, 2),
        "unit": "G visits/s",
        "vs_baseline": round(gvs / BASELINE_GVS, 2),
    }))


if __name__ == "__main__":
    main()
