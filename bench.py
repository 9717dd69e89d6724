"""Driver benchmark: standardized genotype matvec throughput per chip.

Metric: Gvariant·samples/s/chip through the power-iteration step (the hot
loop of bed_randomSVD/autoSVD and PRS scoring; reference hot loop
src/bed-prod-vec.cpp:15-97). Each power iteration touches every genotype
twice (X̃ᵀQ then X̃·). Timing uses data-dependent chaining (the output
feeds the next input) so async dispatch cannot hide execution.

Two compute paths are measured and the best is reported:
  - XLA: blocked decode -> GEMM (decoded block materializes in HBM)
  - Pallas: fused decode+GEMM inside VMEM tiles (packed bytes only)

Baseline: the reference's OpenMP bed matvec is a memory-bound
byte-per-genotype pass; on its README hardware class (15 cores) that is
~10 G genotype-visits/s. vs_baseline = ours / 10e9.

Robustness: the measurement runs in a subprocess with a timeout; if the
TPU is unreachable the parent reports a CPU fallback (flagged by a much
smaller value) rather than hanging the driver.

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_GVS = 10.0  # G genotype-visits/s, reference-class CPU estimate


def _measure():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bigsnpr_tpu.core.unpack import unpack_standardized
    from bigsnpr_tpu.ops import pallas_kernels as pk

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        m, n, l = 131072, 16384, 8
        iters = 10
    else:
        m, n, l = 8192, 4096, 8
        iters = 3

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 256, size=(m, n // 4), dtype=np.uint8))
    center = jnp.asarray(rng.uniform(0.2, 1.8, m).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.3, 1.0, m).astype(np.float32))
    Q0 = jnp.asarray(rng.standard_normal((n, l)).astype(np.float32))

    def timeit(step, q0, iters):
        out = step(q0)
        out.block_until_ready()
        out = step(out)  # compile the chained form
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(out)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    # ---- XLA path
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

        acc, _ = jax.lax.scan(body, jnp.zeros((n, l), jnp.float32), (pb, cb, sb))
        return acc

    dt_xla = timeit(xla_step, Q0, iters)
    gvs_xla = 2.0 * m * n / dt_xla / 1e9

    # ---- Pallas path (TPU only)
    gvs_pallas = 0.0
    if on_tpu:
        try:
            cs = np.zeros((8, m), dtype=np.float32)
            cs[0] = np.asarray(center)
            cs[1] = 1.0 / np.asarray(scale)
            csj = jnp.asarray(cs)
            perm = pk.sample_perm(n)
            inv_perm = jnp.asarray(np.argsort(perm))
            permj = jnp.asarray(perm)

            @jax.jit
            def pallas_step(Q):
                Qp = (Q[:, :l] * 1e-3).T[:, permj]      # (l, n) permuted
                Zt = pk.pallas_cprod(packed, Qp, csj)   # (l, m)
                Yt = pk.pallas_prod(packed, Zt, csj)    # (l, n) permuted
                return Yt[:, inv_perm].T

            dt_p = timeit(pallas_step, Q0, iters)
            gvs_pallas = 2.0 * m * n / dt_p / 1e9
        except Exception:
            gvs_pallas = 0.0

    gvs = max(gvs_xla, gvs_pallas)
    print(json.dumps({
        "metric": "genotype matvec Gvariant*samples/s/chip",
        "value": round(gvs, 2),
        "unit": "G visits/s",
        "vs_baseline": round(gvs / BASELINE_GVS, 2),
    }), flush=True)


def main():
    if os.environ.get("BIGSNPR_BENCH_CHILD"):
        if os.environ.get("BIGSNPR_BENCH_CPU"):
            import jax

            jax.config.update("jax_platforms", "cpu")
        _measure()
        return

    env = dict(os.environ, BIGSNPR_BENCH_CHILD="1")
    for attempt_env, timeout in ((env, 900),
                                 (dict(env, BIGSNPR_BENCH_CPU="1"), 600)):
        try:
            res = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=attempt_env, capture_output=True,
                                 text=True, timeout=timeout)
            for line in reversed(res.stdout.strip().splitlines()):
                if line.startswith("{"):
                    print(line)
                    return
        except subprocess.TimeoutExpired:
            continue
    print(json.dumps({
        "metric": "genotype matvec Gvariant*samples/s/chip",
        "value": 0.0, "unit": "G visits/s", "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
