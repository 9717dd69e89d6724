"""On-chip multi-chain Gibbs benchmark (round-4 verdict #1 'Done' gate).

Measures, at the round-3 geometry (100K variants, 50x2000 blocks,
W=250) and optionally larger: wall time of 1 vs NC chains of
LDpred2-auto through the chain-batched Pallas path, and the grid model
at 21 cells. Reference parallel unit being matched:
/root/reference/R/LDpred2.R:100-114,233-236 (30 chains / 21 grid
models as concurrent processes).

Usage: python scripts/gibbs_multichain_bench.py [--m 100000] [--W 250]
       [--block 2000] [--sweeps 20] [--chains 1 4 30] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    def arg(flag, default, cast=int):
        if flag in sys.argv:
            return cast(sys.argv[sys.argv.index(flag) + 1])
        return default

    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bigsnpr_tpu import config as btconfig
    from bigsnpr_tpu.ops.corr import SparseLD
    from bigsnpr_tpu.pgs.gibbs_blocked import build_block_bands
    from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_auto, snp_ldpred2_grid
    from scripts.tpu_validation import _banded_block_ld

    btconfig.enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    m = arg("--m", 100_000)
    W = arg("--W", 250)
    block = arg("--block", 2000)
    sweeps = arg("--sweeps", 20)
    chain_counts = ([int(c) for c in
                     sys.argv[sys.argv.index("--chains") + 1:]
                     if c.isdigit()] if "--chains" in sys.argv
                    else [1, 4, 30])

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    corr = SparseLD(upper=_banded_block_ld(m, W, block))
    print(f"LD built in {time.perf_counter()-t0:.0f}s "
          f"(nnz={corr.upper.nnz/1e6:.0f}M)", flush=True)
    n_eff = 50_000.0
    beta_true = np.zeros(m)
    causal = rng.choice(m, m // 50, replace=False)
    beta_true[causal] = rng.normal(0, 0.01, len(causal))
    se = np.full(m, 1 / np.sqrt(n_eff))
    df = {"beta": corr.sym() @ beta_true + rng.normal(0, se),
          "beta_se": se, "n_eff": np.full(m, n_eff)}

    nb = m // block
    blocks = np.full(nb, block)
    if blocks.sum() < m:
        blocks = np.r_[blocks, [m - blocks.sum()]]
    t0 = time.perf_counter()
    bb = build_block_bands(corr, blocks)
    bb.device_put()
    print(f"band build + upload: {time.perf_counter()-t0:.0f}s "
          f"({bb.nbytes/1e9:.2f} GB, {len(bb.buckets)} buckets)", flush=True)

    burn = sweeps // 2
    it = sweeps - burn
    base = None
    reps = 3   # the tunnel's first timed run in a process can stall for
    #            minutes (round-4 postmortem); report every warm repeat
    for nc in chain_counts:
        p_inits = list(np.geomspace(1e-4, 0.2, nc))
        # cold (compile) + warm runs
        t0 = time.perf_counter()
        snp_ldpred2_auto(corr, df, h2_init=0.3, vec_p_init=p_inits,
                         burn_in=burn, num_iter=it, blocks=bb)
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = snp_ldpred2_auto(corr, df, h2_init=0.3,
                                   vec_p_init=p_inits,
                                   burn_in=burn, num_iter=it, blocks=bb)
            warms.append(time.perf_counter() - t0)
        warm = min(warms)
        tot = sweeps * m * nc
        if base is None:
            base = warm
        nfin = sum(np.isfinite(r["h2_est"]) for r in res)
        print(f"auto x{nc:3d} chains [{burn}+{it} sweeps]: cold {cold:.1f}s "
              f"warms {['%.2f' % w for w in warms]} best {warm:.2f}s = "
              f"{tot/warm/1e3:.0f} variant-steps/ms "
              f"({warm/base:.2f}x single-chain wall, "
              f"{nfin}/{nc} chains finite)", flush=True)

    if "--hyper" in sys.argv:
        # hyper-stage isolation (round-4 verdict #4): same NC through
        # (a) grid cells (sweep kernel only, no hyper stage),
        # (b) auto w/o MLE (adds beta-draw + h2/paths bookkeeping),
        # (c) full auto (adds Poisson bootstrap + MLE alpha profile).
        nc = max(chain_counts)
        p_inits = list(np.geomspace(1e-4, 0.2, nc))
        gridN = {"p": np.asarray(p_inits), "h2": np.full(nc, 0.3),
                 "sparse": np.zeros(nc, bool)}
        variants = [
            ("grid x%d (no hyper)" % nc,
             lambda: snp_ldpred2_grid(corr, df, gridN, burn_in=burn,
                                      num_iter=it, blocks=bb)),
            ("auto x%d use_MLE=False" % nc,
             lambda: snp_ldpred2_auto(corr, df, h2_init=0.3,
                                      vec_p_init=p_inits, burn_in=burn,
                                      num_iter=it, use_MLE=False,
                                      blocks=bb)),
            ("auto x%d use_MLE=True" % nc,
             lambda: snp_ldpred2_auto(corr, df, h2_init=0.3,
                                      vec_p_init=p_inits, burn_in=burn,
                                      num_iter=it, use_MLE=True,
                                      blocks=bb)),
        ]
        for name, fn in variants:
            fn()                                     # compile
            warms = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                warms.append(time.perf_counter() - t0)
            w = min(warms)
            print(f"[hyper] {name}: best {w:.2f}s = {w/sweeps*1e3:.0f} "
                  f"ms/sweep ({sweeps*m*nc/w/1e3:.0f} v-s/ms)", flush=True)
        return

    # 21-cell grid (the reference's grid_param geometry: 7 p x 3 h2)
    ps = np.geomspace(1e-4, 0.3, 7)
    grid = {"p": np.tile(ps, 3),
            "h2": np.repeat([0.1, 0.3, 0.7], 7) * 1.0,
            "sparse": np.zeros(21, bool)}
    t0 = time.perf_counter()
    snp_ldpred2_grid(corr, df, grid, burn_in=burn, num_iter=it, blocks=bb)
    cold = time.perf_counter() - t0
    warms = []
    for _ in range(reps):
        t0 = time.perf_counter()
        snp_ldpred2_grid(corr, df, grid, burn_in=burn, num_iter=it,
                         blocks=bb)
        warms.append(time.perf_counter() - t0)
    warm = min(warms)
    print(f"grid x 21 cells [{burn}+{it} sweeps]: cold {cold:.1f}s "
          f"warms {['%.2f' % w for w in warms]} best {warm:.2f}s = "
          f"{sweeps*m*21/warm/1e3:.0f} variant-steps/ms "
          f"({warm/base:.2f}x single-chain wall)", flush=True)


if __name__ == "__main__":
    main()
