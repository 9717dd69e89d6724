"""On-chip bisection of the chain-batched auto sweep's per-sweep cost
(round-4 verdict #4: auto x30 is 3-5x below grid x30 per sweep; the
round-5 isolation showed neither the MLE stage nor the slot scatters
explain it). Builds variants of the auto body from sweep-only up to
the full no-MLE auto, timing each as a host-driven chained loop.

Usage: python scripts/auto_bisect_bench.py [--m 100000] [--sweeps 20]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    def arg(flag, default, cast=int):
        if flag in sys.argv:
            return cast(sys.argv[sys.argv.index(flag) + 1])
        return default

    import jax
    import jax.numpy as jnp

    from bigsnpr_tpu import config as btconfig
    from bigsnpr_tpu.ops.corr import SparseLD
    from bigsnpr_tpu.pgs.gibbs_blocked import (build_block_bands, _dp0_mc,
                                               _sweeps_bucketed_mc)
    from bigsnpr_tpu.pgs.gibbs import _beta_draw, _poisson1, \
        _mle_alpha_profile
    from bigsnpr_tpu.pgs.ldpred2 import _blocked_setup
    from scripts.tpu_validation import _banded_block_ld

    btconfig.enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    m = arg("--m", 100_000)
    W, block, NC = 250, 2000, 30
    sweeps = arg("--sweeps", 20)

    rng = np.random.default_rng(0)
    corr = SparseLD(upper=_banded_block_ld(m, W, block))
    bb = build_block_bands(corr, np.full(m // block, block))
    gb2, bands, gidx, _, use_pallas, bcs, meta = _blocked_setup(
        None, bb, None, np.float32, mc=True)
    print(f"use_pallas={use_pallas}", flush=True)

    dt = jnp.float32
    bh = jnp.asarray(rng.normal(0, 0.01, m), dt)
    nv = jnp.full(m, 5e4, dt)
    lv = jnp.asarray(rng.uniform(-3, -0.5, m), dt)
    keys = jax.random.split(jax.random.PRNGKey(0), NC)
    p0 = jnp.asarray(np.geomspace(1e-3, 0.2, NC), dt)

    def make(level):
        @partial(jax.jit, static_argnames=("m", "level"))
        def sweep(bands, gidx, bcs, state, keys, m, level):
            (dp_pads, curr_beta, p, h2e, ps_, avg_b, avg_pp, avg_dp,
             paths, k) = state
            NCl = curr_beta.shape[0]
            inv_odd_p = (1 - p) / p
            C1 = ps_[:, None] * nv[None, :]
            C2 = 1.0 / (1.0 + 1.0 / C1)
            C4 = C2 / nv[None, :]
            s1 = jnp.sqrt(1 + C1)

            def draw(kc):
                ku, kz, kp, kb = jax.random.split(
                    jax.random.fold_in(kc, k), 4)
                return (jax.random.uniform(ku, (m,), dtype=dt),
                        jax.random.normal(kz, (m,), dtype=dt), kp, kb)

            u, z, kps, kbs = jax.vmap(draw)(keys)
            dp2, nb, aux = _sweeps_bucketed_mc(
                bands, gidx, dp_pads, curr_beta, (bh, C2, C4, s1), u, z,
                inv_odd_p, p, jnp.zeros((NCl,), bool), 1.0, False, m,
                use_pallas=use_pallas, bcs=bcs, meta=meta)
            gap, causal, h2_inc, postp_inc, beta_inc, dps = aux
            if level >= 1:          # consume the three extra outputs
                pm = (k >= 3)
                avg_b = avg_b + jnp.where(pm, beta_inc, 0.0)
                avg_pp = avg_pp + jnp.where(pm, postp_inc, 0.0)
                avg_dp = avg_dp + jnp.where(pm, dps, 0.0)
            if level >= 2:          # hyper: beta draw + h2 feedback
                nbc = jnp.sum(causal, axis=1)
                p2 = jax.vmap(lambda kc, a, b: _beta_draw(
                    kc, a, b, dtype=dt))(kps, 1 + nbc / 5.0,
                                         1 + (m - nbc) / 5.0)
                p = jnp.clip(p2, 1e-5, 1.0)
                h2e = h2e + h2_inc
                ps_ = jnp.maximum(h2e, 1e-4) / (m * p)
            if level >= 3:          # paths dynamic_update_slice
                vals = jnp.stack([p, h2e, ps_], axis=1)[:, :, None]
                paths = jax.lax.dynamic_update_slice(
                    paths, vals.astype(paths.dtype), (0, 0, k))
            if level >= 4:          # MLE stage (poisson + profile)
                def mle(kb, ca, beta2):
                    wts = _poisson1(kb, (m,), dt) * ca
                    return _mle_alpha_profile(
                        jnp.asarray(0.0, dt), jnp.asarray(1e-6, dt), wts,
                        lv, beta2, (jnp.asarray(-0.5, dt),
                                    jnp.asarray(1.5, dt)))
                pa, psx = jax.vmap(mle)(kbs, causal.astype(dt), nb * nb)
                pa, psx = jax.lax.optimization_barrier((pa, psx))
                ps_ = ps_ + 0.0 * psx
            return (dp2, nb, p, h2e, ps_, avg_b, avg_pp, avg_dp, paths,
                    k + 1)
        return sweep

    for level, name in [(0, "sweep only (grid-equivalent)"),
                        (1, "+avg accumulators"),
                        (2, "+beta-draw/h2 hyper"),
                        (3, "+paths"),
                        (4, "+MLE")]:
        sweep = make(level)
        state = (_dp0_mc(bands, NC), jnp.zeros((NC, m), dt), p0,
                 jnp.zeros((NC,), dt), 0.3 / (m * p0),
                 jnp.zeros((NC, m), dt), jnp.zeros((NC, m), dt),
                 jnp.zeros((NC, m), dt), jnp.full((NC, 3, 64), jnp.nan, dt),
                 jnp.asarray(0, jnp.int32))
        for _ in range(2):
            state = sweep(bands, gidx, bcs, state, keys, m, level)
        jax.block_until_ready(state[1])
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(sweeps):
                state = sweep(bands, gidx, bcs, state, keys, m, level)
            jax.block_until_ready(state[1])
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
        print(f"level {level} [{name}]: {best/sweeps*1e3:.1f} ms/sweep",
              flush=True)


if __name__ == "__main__":
    main()
