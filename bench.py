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

Robustness (round-1 postmortem: the only driver-captured number was a
CPU fallback because first-time XLA+Pallas compilation of the big shapes
blew the single 900 s subprocess budget):
  - measurements run in subprocesses with timeouts;
  - the axon plugin caches compilations server-side ACROSS processes,
    so after a timed-out attempt the SAME shape is retried once more —
    the retry hits the warm cache and completes in seconds;
  - a smaller TPU shape is tried before falling back to CPU;
  - the JSON says which path won, on which backend, at which shape, and
    carries per-path numbers; path errors go to stderr, never swallowed.

Prints ONE JSON line (last line of stdout).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_GVS = 10.0  # G genotype-visits/s, reference-class CPU estimate

SIZES = {
    # name -> (m, n, l, iters); packed bytes = m * n / 4
    "xl": (131072, 65536, 8, 20),      # 2 GB packed (manual runs:
    #                                    BIGSNPR_BENCH_CHILD=1
    #                                    BIGSNPR_BENCH_SIZE=xl python bench.py)
    "big": (131072, 16384, 8, 30),     # 512 MB packed
    "mid": (65536, 8192, 8, 30),       # 128 MB packed
    "cpu": (8192, 4096, 8, 3),
}


def _measure(size_name):
    import numpy as np
    import jax

    from bigsnpr_tpu import config as btconfig

    cache_dir = btconfig.enable_compilation_cache()

    import jax.numpy as jnp
    from bigsnpr_tpu.core.unpack import unpack_standardized
    from bigsnpr_tpu.ops import pallas_kernels as pk

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    m, n, l, iters = SIZES[size_name]

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    log(f"backend={backend} size={size_name} m={m} n={n}")
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    # upload in <=256 MB slices: very large single transfers have wedged
    # the tunnel runtime (CLAUDE.md postmortems)
    chunk_rows = max(1, (256 << 20) // (n // 4))
    packed = jnp.concatenate(
        [jax.device_put(rng.integers(0, 256, size=(rows, n // 4),
                                     dtype=np.uint8))
         for rows in ([chunk_rows] * (m // chunk_rows)
                      + ([m % chunk_rows] if m % chunk_rows else []))],
        axis=0)
    packed.block_until_ready()
    log(f"packed transfer {m * n // 4 / 1e6:.0f} MB in "
        f"{time.perf_counter() - t0:.1f}s")
    center = jnp.asarray(rng.uniform(0.2, 1.8, m).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.3, 1.0, m).astype(np.float32))
    Q0 = jnp.asarray(rng.standard_normal((n, l)).astype(np.float32))

    compile_s = {}

    def timeit(step, q0, iters, label=None, repeats=1):
        # data-dependent chaining AND a host fetch of the final output:
        # the tunnel's block_until_ready can return before remote
        # execution finishes (measured 0.1 ms/iter for a 1 GB-touching
        # step — impossible), but a device_get cannot lie. The fetched
        # array is small (n x l); its one-time link latency is measured
        # separately and subtracted. With repeats > 1 returns the list
        # of per-loop averages (run-to-run spread on the shared chip is
        # ~±15%, round-3 verdict #9: single numbers are weak evidence).
        t0 = time.perf_counter()
        out = step(q0)
        np.asarray(out)
        out = step(out)  # compile the chained form
        np.asarray(out)
        dt_c = time.perf_counter() - t0
        if label:
            compile_s[label] = round(dt_c, 1)
        log(f"compile+warmup {dt_c:.1f}s")
        t0 = time.perf_counter()
        np.asarray(out)  # fetch-latency probe on a ready array
        fetch_s = time.perf_counter() - t0
        dts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(out)
            np.asarray(out)
            dts.append(max(time.perf_counter() - t0 - fetch_s, 1e-9) / iters)
        return dts if repeats > 1 else dts[0]

    results = {}

    # ---- XLA path
    # NOTE: packed/center/scale are jit ARGUMENTS, not closure constants —
    # the axon tunnel ships closure constants inside the HLO to its
    # remote_compile endpoint, which rejects >~0.5 GB bodies (HTTP 413)
    # and can wedge the tunnel (round-1/2 postmortem).
    block = 4096
    nblocks = m // block

    @jax.jit
    def xla_step_arg(packed, center, scale, Q):
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

    def xla_step(Q):
        return xla_step_arg(packed, center, scale, Q)

    def run_xla():
        # On TPU the XLA path compies in minutes (server-side
        # remote_compile, uncacheable client-side) and never wins over
        # Pallas — measured AFTER Pallas so a timeout still captures
        # the winning number; it is the primary path on CPU only.
        try:
            dt_xla = timeit(xla_step, Q0, iters, label="xla")
            results["gvs_xla"] = round(2.0 * m * n / dt_xla / 1e9, 2)
            log(f"xla: {dt_xla*1e3:.1f} ms/iter -> {results['gvs_xla']} GVS")
        except Exception as e:  # noqa: BLE001 - reported, not swallowed
            log(f"xla path FAILED: {type(e).__name__}: {e}")
            results["error_xla"] = f"{type(e).__name__}: {e}"[:200]

    if not on_tpu:
        run_xla()

    # ---- Pallas path (TPU only)
    if on_tpu:
        try:
            cs = np.zeros((8, m), dtype=np.float32)
            cs[0] = np.asarray(center)
            cs[1] = 1.0 / np.asarray(scale)
            csj = jnp.asarray(cs)
            perms = {}

            def perm_pair(tnb):
                if tnb not in perms:
                    p = pk.sample_perm(n, tnb=tnb)
                    perms[tnb] = (jnp.asarray(p),
                                  jnp.asarray(np.argsort(p)))
                return perms[tnb]

            @pk.tpu_jit(static_argnames=("tm", "mxu", "tnb"))
            def pallas_step_arg(packed, csj, permj, inv_perm, Q, tm, mxu,
                                tnb, planes=None):
                Qp = (Q[:, :l] * 1e-3).T[:, permj]      # (l, n) permuted
                Zt = pk.pallas_cprod(packed, Qp, csj, tm=tm, mxu=mxu,
                                     tnb=tnb, planes=planes)
                Yt = pk.pallas_prod(packed, Zt, csj, tm=tm, mxu=mxu,
                                    tnb=tnb, planes=planes)
                return Yt[:, inv_perm].T

            planes_cache = {}

            def planes_for(tnb):
                # int8m: at-rest materialized int8 planes (4-8x packed
                # bytes for zero per-pass decode — round-3 verdict #5).
                # Keep at most ONE layout resident: two tnb layouts of a
                # 537 MB pack are ~8.6 GB of HBM together (round-4 OOM).
                if tnb not in planes_cache:
                    planes_cache.clear()
                    planes_cache[tnb] = jax.block_until_ready(
                        pk.materialize_int8_planes_chunked(packed, tnb,
                                                           False))
                return planes_cache[tnb]

            best_dt, best_cfg = None, None
            for tm, mxu, tnb in ((512, "int8", 512), (512, "int8", 1024),
                                 (512, "split2", 512), (512, "int8", 128),
                                 (512, "highest", 128),
                                 (512, "int8m", 512), (512, "int8m", 1024)):
                # int8m configs LAST: a plane-materialization OOM after
                # a runtime hiccup must not cost the decode-mode numbers
                try:
                    permj, inv_perm = perm_pair(tnb)
                    planes = planes_for(tnb) if mxu == "int8m" else None

                    def pallas_step(Q, tm=tm, mxu=mxu, tnb=tnb,
                                    permj=permj, inv_perm=inv_perm,
                                    planes=planes):
                        return pallas_step_arg(packed, csj, permj, inv_perm,
                                               Q, tm, mxu, tnb, planes)

                    dt_p = timeit(pallas_step, Q0, iters,
                                  label=f"pallas_tm{tm}_{mxu}_tnb{tnb}")
                except Exception as e:  # noqa: BLE001 - per-config report
                    log(f"pallas[tm={tm},{mxu},tnb={tnb}] FAILED: "
                        f"{type(e).__name__}: {e}")
                    planes_cache.clear()
                    continue
                log(f"pallas[tm={tm},{mxu},tnb={tnb}]: {dt_p*1e3:.1f} "
                    f"ms/iter -> {2.0*m*n/dt_p/1e9:.1f} GVS")
                if best_dt is None or dt_p < best_dt:
                    best_dt, best_cfg = dt_p, (tm, mxu, tnb)
            if best_dt is not None:
                # re-measure the winning config with 5 repeats and
                # report the spread; headline = max(median, the config's
                # clean sweep measurement) — the shared chip can slow
                # down mid-run (other tenants), and the sweep number is
                # itself a chained 10-iter average, not a fluke one-shot
                planes = None
                planes_cache.clear()  # stale int8m planes: HBM pressure
                tm, mxu, tnb = best_cfg
                permj, inv_perm = perm_pair(tnb)
                planes = planes_for(tnb) if mxu == "int8m" else None
                dts = timeit(lambda Q: pallas_step_arg(
                    packed, csj, permj, inv_perm, Q, tm, mxu, tnb, planes),
                    Q0, iters, repeats=5)
                gvss = sorted(2.0 * m * n / dt / 1e9 for dt in dts)
                best_sweep = 2.0 * m * n / best_dt / 1e9
                # headline = median of repeats (max-of-two-estimators is
                # upward-biased); the sweep's best lives in _sweep.
                results["gvs_pallas"] = round(gvss[len(gvss) // 2], 2)
                results["gvs_pallas_med5"] = round(gvss[len(gvss) // 2], 2)
                results["gvs_pallas_sweep"] = round(best_sweep, 2)
                results["gvs_pallas_min"] = round(gvss[0], 2)
                results["gvs_pallas_max"] = round(gvss[-1], 2)
                log(f"pallas best cfg repeats: min {gvss[0]:.1f} "
                    f"med5 {results['gvs_pallas_med5']} max {gvss[-1]:.1f}"
                    f" GVS (sweep {best_sweep:.1f})")
                (results["pallas_tm"], results["pallas_mxu"],
                 results["pallas_tnb"]) = best_cfg
            planes_cache.clear()  # release plane HBM before gibbs bench
        except Exception as e:  # noqa: BLE001 - reported, not swallowed
            log(f"pallas path FAILED: {type(e).__name__}: {e}")
            results["error_pallas"] = f"{type(e).__name__}: {e}"[:200]

        # ---- supplementary: NA-free pack (imputed at-rest data, the
        # common PRS case). nona decode reads T bits only; int8m-nona
        # streams materialized T planes (4x bytes, ZERO decode) — the
        # round-3 verdict-#5 layout attack. Headline stays the NA pack.
        try:
            valid = np.array([a | (b << 2) | (c << 4) | (d << 6)
                              for a in (0, 2, 3) for b in (0, 2, 3)
                              for c in (0, 2, 3) for d in (0, 2, 3)],
                             dtype=np.uint8)
            packed_nf = jnp.concatenate(
                [jax.device_put(rng.choice(valid, size=(rows, n // 4)))
                 for rows in ([chunk_rows] * (m // chunk_rows)
                              + ([m % chunk_rows] if m % chunk_rows
                                 else []))], axis=0)
            packed_nf.block_until_ready()
            planes_nf = None
            for mxu, key in (("int8", "gvs_nona"),
                             ("int8m", "gvs_nona_int8m")):
                tnb = 512
                permj, inv_perm = perm_pair(tnb)
                if mxu == "int8m":
                    planes_nf = jax.block_until_ready(
                        pk.materialize_int8_planes_chunked(
                            packed_nf, tnb, True))

                @pk.tpu_jit(static_argnames=("tm", "mxu", "tnb"))
                def nona_step_arg(packed, csj, permj, inv_perm, Q, tm,
                                  mxu, tnb, planes=None):
                    Qp = (Q[:, :l] * 1e-3).T[:, permj]
                    Zt = pk.pallas_cprod(packed, Qp, csj, tm=tm, mxu=mxu,
                                         tnb=tnb, nona=True, planes=planes)
                    Yt = pk.pallas_prod(packed, Zt, csj, tm=tm, mxu=mxu,
                                        tnb=tnb, nona=True, planes=planes)
                    return Yt[:, inv_perm].T

                try:
                    dts = timeit(
                        lambda Q, mxu=mxu, tnb=tnb, permj=permj,
                        inv_perm=inv_perm, planes=planes_nf:
                        nona_step_arg(packed_nf, csj, permj, inv_perm, Q,
                                      512, mxu, tnb, planes),
                        Q0, iters, label=f"nona_{mxu}", repeats=3)
                    gvss = sorted(2.0 * m * n / dt / 1e9 for dt in dts)
                    results[key] = round(gvss[len(gvss) // 2], 2)
                    log(f"nona[{mxu},tnb={tnb}]: min {gvss[0]:.1f} "
                        f"med {gvss[len(gvss)//2]:.1f} max {gvss[-1]:.1f}"
                        f" GVS")
                except Exception as e:  # noqa: BLE001 - per-config
                    log(f"nona[{mxu}] FAILED: {type(e).__name__}: {e}")
            del packed_nf, planes_nf
        except Exception as e:  # noqa: BLE001 - reported, not swallowed
            log(f"nona section FAILED: {type(e).__name__}: {e}")
        run_xla()

    # ---- secondary metric: chain-batched LDpred2 throughput (the
    # round-4 flagship: 21 grid cells / 30 auto chains share band tiles)
    if on_tpu:
        try:
            _gibbs_bench(results, log)
        except Exception as e:  # noqa: BLE001 - reported, not swallowed
            log(f"gibbs bench FAILED: {type(e).__name__}: {e}")
            results["error_gibbs"] = f"{type(e).__name__}: {e}"[:200]

    gvs = max(results.get("gvs_xla", 0.0), results.get("gvs_pallas", 0.0))
    winner = ("pallas" if results.get("gvs_pallas", 0.0) >=
              results.get("gvs_xla", 0.0) else "xla")
    out = {
        "metric": "genotype matvec Gvariant*samples/s/chip",
        "value": round(gvs, 2),
        "unit": "G visits/s",
        "vs_baseline": round(gvs / BASELINE_GVS, 2),
        "path": winner,
        "backend": backend,
        "shape": f"{m}x{n}",
        "cpu_fallback": not on_tpu,
        "compile_s": compile_s,
        "compile_cache": cache_dir,
    }
    out.update(results)
    print(json.dumps(out), flush=True)


def _gibbs_bench(results, log, m=100_000, W=250, block=2000, sweeps=20):
    """21-cell LDpred2-grid + 30-chain auto at 100K variants through the
    chain-batched Pallas sweep (reference parallel unit: 30 chains / 21
    grid models as concurrent processes, R/LDpred2.R:100-114,233-236).
    Reference-class rate: ~5,800 variant-steps/ms per 4-core chain."""
    import numpy as np

    from bigsnpr_tpu.ops.corr import SparseLD
    from bigsnpr_tpu.pgs.gibbs_blocked import build_block_bands
    from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_auto, snp_ldpred2_grid
    from scripts.tpu_validation import _banded_block_ld, _grouped_gwas_noise

    rng = np.random.default_rng(0)
    corr = SparseLD(upper=_banded_block_ld(m, W, block))
    n_eff = 50_000.0
    beta_true = np.zeros(m)
    causal = rng.choice(m, m // 50, replace=False)
    beta_true[causal] = rng.normal(0, 0.01, len(causal))
    Rb = corr.sym() @ beta_true
    cal = np.sqrt(0.2 / float(beta_true @ Rb))      # implied h2 -> 0.2
    se = np.full(m, 1 / np.sqrt(n_eff))
    df = {"beta": cal * Rb + _grouped_gwas_noise(m, n_eff, rng),
          "beta_se": se, "n_eff": np.full(m, n_eff)}
    bb = build_block_bands(corr, np.full(m // block, block))
    burn, it = sweeps // 2, sweeps - sweeps // 2
    ps = np.geomspace(1e-4, 0.3, 7)
    grid = {"p": np.tile(ps, 3), "h2": np.repeat([0.1, 0.3, 0.7], 7) * 1.0,
            "sparse": np.zeros(21, bool)}
    snp_ldpred2_grid(corr, df, grid, burn_in=burn, num_iter=it, blocks=bb)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        snp_ldpred2_grid(corr, df, grid, burn_in=burn, num_iter=it,
                         blocks=bb)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    results["gibbs_grid21_vsm"] = round(sweeps * m * 21 / best / 1e3)
    log(f"gibbs grid x21 @ {m}: {best:.2f}s = "
        f"{results['gibbs_grid21_vsm']} variant-steps/ms")
    p_inits = list(np.geomspace(5e-4, 0.3, 30))
    snp_ldpred2_auto(corr, df, h2_init=0.3, vec_p_init=p_inits,
                     burn_in=burn, num_iter=it, blocks=bb)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        snp_ldpred2_auto(corr, df, h2_init=0.3, vec_p_init=p_inits,
                         burn_in=burn, num_iter=it, blocks=bb)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    results["gibbs_auto30_vsm"] = round(sweeps * m * 30 / best / 1e3)
    log(f"gibbs auto x30 @ {m}: {best:.2f}s = "
        f"{results['gibbs_auto30_vsm']} variant-steps/ms")
    # steady-state sweep rate: warm-vs-warm difference of a 3x-longer
    # call removes the fixed per-call cost (host prep + the ~30 MB/s
    # fetch of the (NC, m) result arrays), which dominates 20-sweep
    # walls — round-5 bisection measured the full auto sweep at ~26 ms.
    # The longer call is its own program (paths/report shapes), so warm
    # it before timing.
    snp_ldpred2_auto(corr, df, h2_init=0.3, vec_p_init=p_inits,
                     burn_in=3 * burn, num_iter=3 * it, blocks=bb)
    t0 = time.perf_counter()
    snp_ldpred2_auto(corr, df, h2_init=0.3, vec_p_init=p_inits,
                     burn_in=3 * burn, num_iter=3 * it, blocks=bb)
    dt3 = time.perf_counter() - t0
    extra = max(dt3 - best, 1e-9)
    results["gibbs_auto30_steady_vsm"] = round(
        2 * sweeps * m * 30 / extra / 1e3)
    log(f"gibbs auto x30 steady: {2*sweeps} extra sweeps in {extra:.2f}s "
        f"= {results['gibbs_auto30_steady_vsm']} variant-steps/ms")


def main():
    if os.environ.get("BIGSNPR_BENCH_CHILD"):
        if os.environ.get("BIGSNPR_BENCH_CPU"):
            import jax

            jax.config.update("jax_platforms", "cpu")
        _measure(os.environ["BIGSNPR_BENCH_SIZE"])
        return

    env = dict(os.environ, BIGSNPR_BENCH_CHILD="1")
    # (env, size, timeout, sleep_before). The repeated "big" attempt is
    # deliberate: a first-compile timeout leaves the server-side compile
    # cache warm, so the retry completes quickly. The spaced retries
    # cover a transiently wedged tunnel that recovers on a remote timer
    # (round-2 postmortem: a killed client wedged the pool slot for
    # >40 min with no client-side remedy).
    attempts = [
        (env, "big", 1800, 0),
        (env, "big", 1200, 0),
        (env, "mid", 600, 120),
        (env, "mid", 600, 300),
        (dict(env, BIGSNPR_BENCH_CPU="1"), "cpu", 600, 0),
    ]
    for attempt_env, size, timeout, sleep_before in attempts:
        if sleep_before:
            print(f"[bench] sleeping {sleep_before}s before retry "
                  f"(tunnel may recover)", file=sys.stderr, flush=True)
            time.sleep(sleep_before)
        attempt_env = dict(attempt_env, BIGSNPR_BENCH_SIZE=size)
        try:
            res = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=attempt_env, capture_output=True,
                                 text=True, timeout=timeout)
            sys.stderr.write(res.stderr[-4000:])
            for line in reversed(res.stdout.strip().splitlines()):
                if line.startswith("{"):
                    print(line)
                    return
            print(f"[bench] attempt size={size} rc={res.returncode} "
                  f"produced no JSON", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired as e:
            if e.stderr:
                err = e.stderr if isinstance(e.stderr, str) else \
                    e.stderr.decode(errors="replace")
                sys.stderr.write(err[-4000:])
            print(f"[bench] attempt size={size} timed out after {timeout}s",
                  file=sys.stderr, flush=True)
            continue
    print(json.dumps({
        "metric": "genotype matvec Gvariant*samples/s/chip",
        "value": 0.0, "unit": "G visits/s", "vs_baseline": 0.0,
        "path": "none", "backend": "unreachable", "cpu_fallback": True,
    }))


if __name__ == "__main__":
    main()
