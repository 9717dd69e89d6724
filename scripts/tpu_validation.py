"""On-chip validation suite — run when a TPU is reachable.

Measures (with data-dependent chained timing):
  1. XLA vs Pallas power-iter throughput (the bench metric), via the
     device-resident operators (XlaOperator / PallasOperator.power)
  2. Pallas variant-tile (TM) sweep for tuning
  3. randomized SVD wall time at a mid-size cohort
  4. Gibbs sweep throughput, sequential vs block-parallel
  5. snp_cor device-compaction throughput

Usage: python scripts/tpu_validation.py [--quick] [--sweep]
       (default: supervised mode — each section runs in its own
        subprocess with a timeout, so one wedged transfer cannot take
        down the suite; --inline for the old single-process run;
        --part {power,sweep,svd,gibbs,cor} runs one section)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit_chained(step, x0, iters=10):
    """Chained timing with a host fetch of the final output — the axon
    tunnel's block_until_ready can return before remote execution
    finishes (round-2 postmortem: 0.1 ms/iter reported for a 1 GB-touch
    step); a device_get cannot lie. One-shot fetch latency on a ready
    array is measured and subtracted."""
    import jax

    out = step(x0)
    jax.device_get(out)
    out = step(out)  # compile the chained form
    jax.device_get(out)
    t0 = time.perf_counter()
    jax.device_get(out)
    fetch_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out)
    jax.device_get(out)
    return max(time.perf_counter() - t0 - fetch_s, 1e-9) / iters


def main(quick=False, sweep=False, parts=None):
    import jax
    import jax.numpy as jnp

    from bigsnpr_tpu import config as btconfig

    btconfig.enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())
    assert "--cpu" in sys.argv or jax.default_backend() != "cpu", \
        "no TPU reachable"

    from bigsnpr_tpu.core.genotypes import GenoPack
    from bigsnpr_tpu.ops import pallas_kernels as pk
    from bigsnpr_tpu.ops.matvec import XlaOperator

    m, n, l = (32768, 8192, 8) if quick else (131072, 16384, 8)
    rng = np.random.default_rng(0)
    pack = GenoPack(
        packed=rng.integers(0, 256, size=(m, n // 4), dtype=np.uint8), n=n)
    # synthetic center/scale, like bench.py: bed_scaleBinom on a 512 MB
    # random pack routes a full device colstats pass BEFORE the first
    # timing and wedged the tunnel once (round-2 postmortem) — the
    # throughput numbers do not depend on the scaling values.
    center = rng.uniform(0.2, 1.8, m)
    scale = rng.uniform(0.3, 1.0, m)
    Q0 = rng.standard_normal((n, l)).astype(np.float32)

    parts = parts or {"power", "sweep", "svd", "gibbs", "cor"}

    # 1. operator power-iter, fully device-chained via power_dev
    ops = {"xla": XlaOperator(pack, center, scale),
           "pallas": pk.PallasOperator(pack, center, scale),
           "pallas-split2": pk.PallasOperator(pack, center, scale,
                                              mxu="split2"),
           "pallas-int8": pk.PallasOperator(pack, center, scale,
                                            mxu="int8"),
           "pallas-int8m": pk.PallasOperator(pack, center, scale,
                                             mxu="int8m")}
    base = {}
    for name, op in (ops.items() if "power" in parts else ()):
        def step(Q, op=op):
            _, Y = op.power_dev(Q * 1e-3)
            return Y

        dt = timeit_chained(step, jnp.asarray(Q0), iters=10)
        base[name] = dt
        print(f"{name} power-iter: {dt*1e3:.1f} ms -> "
              f"{2*m*n/dt/1e9:.0f} G visits/s")
        # host-round-trip variant (the .power numpy surface): shows the
        # tunnel-latency tax iterative host drivers would pay
        def step_h(Q, op=op):
            _, Y = op.power(np.asarray(Q) * 1e-3)
            return jnp.asarray(Y)

        dt_h = timeit_chained(step_h, Q0, iters=3)
        print(f"{name} power-iter via host: {dt_h*1e3:.1f} ms")

    # 2. (TM, mxu) sweep (Pallas)
    if sweep and "sweep" in parts:
        op = ops["pallas"]

        # one outer jit per config: standalone pallas_cprod programs let
        # XLA pin the (2l, m) result in VMEM (scoped OOM at big m)
        @pk.tpu_jit(static_argnames=("tm", "mxu"))
        def sweep_step(Q, tm, mxu):
            Qk = jnp.zeros((op.n_pad, l), jnp.float32).at[
                op.row_pos].set(Q * 1e-3)
            B = pk.pallas_cprod(op.packed, Qk.T, op.cs, tm=tm,
                                mxu=mxu, tnb=op.tnb)
            Y = pk.pallas_prod(op.packed, B, op.cs, tm=tm, mxu=mxu,
                               tnb=op.tnb)
            return Y[:l].T[op.row_pos]

        for mxu in ("int8", "split2", "highest"):
            for tm in (256, 512, 1024):
                if op.packed.shape[0] % tm:
                    continue
                try:
                    dt = timeit_chained(
                        lambda Q, tm=tm, mxu=mxu: sweep_step(Q, tm=tm,
                                                             mxu=mxu),
                        jnp.asarray(Q0), iters=5)
                except Exception as e:  # noqa: BLE001 — per-config report
                    print(f"  TM={tm} {mxu} FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    continue
                print(f"  TM={tm} {mxu} tnb={op.tnb}: {dt*1e3:.1f} ms -> "
                      f"{2*m*n/dt/1e9:.0f} G visits/s", flush=True)

    # 3. SVD wall time
    from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD

    # "auto" = Pallas operator + device-resident Krylov, "device" = XLA
    # operator + device Krylov (explicit "xla"/"pallas" now keep the
    # host-loop Krylov per the round-2 advisor fix — too slow over the
    # tunnel to time here)
    for engine in (("auto", "device") if "svd" in parts else ()):
        t0 = time.perf_counter()
        svd = snp_randomSVD(pack, k=10, tol=1e-4, engine=engine)
        print(f"randomSVD[{engine}]: {time.perf_counter()-t0:.1f}s "
              f"depth={svd.niter}")

    # 4. Gibbs throughput
    if "gibbs" in parts:
        _gibbs_section(quick, rng)

    # 5. snp_cor device compaction
    if "cor" in parts:
        _cor_section(quick, pack, n)

    # 6. full autoSVD pipeline wall time (BASELINE configs[0] rung)
    if "autosvd" in parts:
        _autosvd_section(quick)

    print("OK — update BENCH_NOTES.md with these numbers.")


def _autosvd_section(quick):
    """End-to-end autoSVD (MAF -> clump -> iterated randomSVD) at
    1000G-class geometry (reference bed_autoSVD, R/autoSVD.R:226-339;
    BASELINE configs[0]: 2,490 x 1.7M). Synthetic LD-structured pack so
    clumping has real work to do."""
    from bigsnpr_tpu.core.genotypes import GenoPack
    from bigsnpr_tpu.core import unpack as up
    from bigsnpr_tpu.pca.autosvd import snp_autoSVD
    from bigsnpr_tpu.utils.profiling import StageTimer
    import pandas as pd

    n, m = (512, 100_000) if quick else (2490, 1_700_000)
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    # LD-structured synthetic genotypes (byte-op generator, shared with
    # _ld_structured_pack — full per-entry gaussians cost 4.2G f64
    # draws = ~35 min on this host; this build is memory-bound ~2 min)
    pack0 = _ld_structured_pack(n, m, rng)
    pack = GenoPack(packed=pack0.packed, n=n,
                    map=pd.DataFrame({
                        "chromosome": 1 + np.arange(m) // (m // 22 + 1),
                        "physical.pos": (np.arange(m) % (m // 22 + 1)) * 1000,
                    }))
    print(f"synthetic pack built in {time.perf_counter()-t0:.0f}s "
          f"({pack.packed.nbytes/1e6:.0f} MB packed)", flush=True)

    timer = StageTimer()
    t0 = time.perf_counter()
    svd = snp_autoSVD(pack, infos_chr=pack.map["chromosome"].to_numpy(),
                      infos_pos=pack.map["physical.pos"].to_numpy(),
                      k=10, timer=timer, verbose=True)
    dt = time.perf_counter() - t0
    print(f"autoSVD k=10 @ {n}x{m}: {dt:.0f}s total; stage breakdown:")
    print(timer.report(), flush=True)
    print(f"kept {len(svd.subset)} variants, niter={svd.niter}")


def _gibbs_section(quick, rng):
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

    from bigsnpr_tpu.pgs.gibbs_blocked import build_block_bands

    nb = mg // 2000
    blocks = np.full(nb, 2000)
    t0 = time.perf_counter()
    bb = build_block_bands(corr, blocks)
    bb.device_put()
    dt_build = time.perf_counter() - t0
    print(f"band build + device upload: {dt_build:.1f}s")
    t0 = time.perf_counter()
    snp_ldpred2_grid(corr, df, grid1, burn_in=10, num_iter=10, blocks=bb)
    dt_blk = time.perf_counter() - t0
    print(f"Gibbs block-parallel ({nb} blocks, incl. compile): {dt_blk:.1f}s "
          f"({dt_seq/dt_blk:.1f}x vs sequential)")
    t0 = time.perf_counter()
    snp_ldpred2_grid(corr, df, grid1, burn_in=10, num_iter=10, blocks=bb)
    dt_blk2 = time.perf_counter() - t0
    print(f"Gibbs block-parallel warm: "
          f"{dt_blk2:.2f}s ({20*mg/dt_blk2/1e3:.0f} steps/ms)")


def _ld_structured_pack(n, m, rng, group=10, mut=0.15, sgroup=200,
                        sg_w=0.6):
    """Synthetic 2-bit pack with realistic local LD, byte-op build.

    Two latent scales drive each variant: a `group`-level gaussian
    (tight LD, r~0.7 after mutation) plus a `sgroup`-level one (weak LD
    r~0.2 across a ~200-variant neighborhood — real chromosomes have
    banded LD, not tiny diagonal blocks), thresholded into codes; then
    per-entry decorrelation by REDRAWING from the variant's own
    marginal at rate `mut` (uint16 masks, independent across entries —
    the earlier lag-7 copy variant added r^2~0.02 cross-group CHAINS
    that blew blocks='auto' ldsplit to 10 min at 100K, round-5
    postmortem). Exact LD cuts exist at every `sgroup` boundary, so
    block derivation stays cheap. Full per-entry gaussians cost ~20 min
    at 50Kx100K on this host — this build is memory-bound."""
    from bigsnpr_tpu.core.genotypes import GenoPack
    from bigsnpr_tpu.core import unpack as up
    from scipy.stats import norm

    thr = int(mut * (1 << 16))
    a1 = np.float32(1.0 / np.sqrt(1.0 + sg_w**2))
    a2 = np.float32(sg_w / np.sqrt(1.0 + sg_w**2))
    chunk = 50_000 if 50_000 % sgroup == 0 else (50_000 // sgroup) * sgroup
    codes = np.empty((m, (n + 3) // 4 * 4), dtype=np.uint8)
    for b0 in range(0, m, chunk):
        b1 = min(b0 + chunk, m)
        mloc = b1 - b0
        z = rng.standard_normal((mloc // group + 2, n)).astype(np.float32)
        zs = rng.standard_normal((mloc // sgroup + 2, n)).astype(np.float32)
        idx = np.arange(mloc) // group
        idxs = np.arange(mloc) // sgroup
        p = rng.uniform(0.1, 0.5, (mloc, 1)).astype(np.float32)
        base = a1 * z[idx] + a2 * zs[idxs]
        c = ((base > norm.ppf((1 - p) ** 2)).astype(np.uint8)
             + (base > norm.ppf(1 - p ** 2)))
        mask = rng.integers(0, 1 << 16, (mloc, n), dtype=np.uint16) < thr
        r = rng.integers(0, 1 << 16, (mloc, n), dtype=np.uint16)
        t1 = ((1 - p) ** 2 * (1 << 16)).astype(np.uint16)
        t2 = ((1 - p ** 2) * (1 << 16)).astype(np.uint16)
        c_rand = ((r > t1).astype(np.uint8) + (r > t2))
        c = np.where(mask, c_rand, c)
        codes[b0:b1, :n] = np.array([0, 2, 3], np.uint8)[c]
        codes[b0:b1, n:] = 1
    return GenoPack(packed=up.np_pack_codes(codes), n=n)


def _cor_section(quick, pack, n):
    """snp_cor on LD-STRUCTURED data (round-3 verdict weak #6: a random
    pack gives a diagonal-only result — compaction exercised, band
    occupancy not). Reference kernel: src/corr.cpp:11-97."""
    from bigsnpr_tpu.ops.corr import snp_cor

    rng = np.random.default_rng(3)
    nc, mc = (2048, 8192) if quick else (16384, 65536)
    t0 = time.perf_counter()
    sub = _ld_structured_pack(nc, mc, rng)
    print(f"LD-structured pack {mc}x{nc} built in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    for fin in ("device", "host"):
        t0 = time.perf_counter()
        ld = snp_cor(sub, size=500, thr_r2=0.01, finalize=fin)
        dt = time.perf_counter() - t0
        print(f"snp_cor[{fin}] {mc}x{nc}: {dt:.1f}s, "
              f"nnz={ld.upper.nnz/1e6:.1f}M "
              f"({mc/dt:.0f} variants/s; 1M-chr projection "
              f"{1e6/(mc/dt)/60:.1f} min)", flush=True)


def _banded_block_ld(m, W, block, rho=0.7, group=16, cross=1e-4):
    """Direct CSC construction of a block-diagonal banded correlation
    (upper triangle): column j holds rows max(j-W, block_start(j))..j.
    Builds 1M x W-thousands in seconds where sp.diags takes minutes.

    Structure (round-4 redesign): REAL LD is blocky — tight groups of
    correlated variants with mostly-independent variants between them.
    Within a `group` of `group` neighbors: r = rho^d (AR, PSD per
    group); across groups inside the window: a tiny constant `cross`
    that keeps the band dense/wide (the perf-relevant property) while
    being statistically negligible. A uniform truncated-AR band (the
    round-3 generator) makes EVERY variant ~60 strong neighbors —
    LDpred2's p then drifts to the infinitesimal mode by construction
    (verified identical on the sequential reference sampler).
    PSD: eig >= (1-rho)/(1+rho) - 2*W*cross > 0 for the defaults."""
    import scipy.sparse as sp

    j = np.arange(m, dtype=np.int64)
    i0 = np.maximum(j - W, (j // block) * block)
    counts = (j - i0 + 1).astype(np.int64)
    indptr = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    total = int(indptr[-1])
    pos = np.arange(total, dtype=np.int64)
    within = pos - np.repeat(indptr[:-1], counts)
    rows = (np.repeat(i0, counts) + within).astype(np.int32)
    cols = np.repeat(j, counts).astype(np.int32)
    dist = (np.repeat(counts - 1, counts) - within)
    pows = (rho ** np.arange(W + 1)).astype(np.float32)
    same = (rows // group) == (cols // group)
    data = np.where(same, pows[dist], np.float32(cross))
    data[dist == 0] = 1.0
    return sp.csc_matrix((data, rows, indptr), shape=(m, m))


def _grouped_gwas_noise(m, n_eff, rng, rho=0.7, group=16):
    """GWAS sumstats noise with the LD's covariance: e ~ N(0, R/n).
    Independent noise at LD-correlated sites reads as millions of tiny
    independent signals and inflates LDpred2's p estimate by
    construction (root-caused round 4 on the sequential reference
    sampler). One Cholesky of the shared group-AR block serves all
    groups; the 1e-4 cross terms are negligible for noise."""
    d = np.abs(np.subtract.outer(np.arange(group), np.arange(group)))
    Lc = np.linalg.cholesky(rho ** d)
    ng = -(-m // group)
    z = rng.standard_normal((ng, group))
    e = (z @ Lc.T).ravel()[:m]
    return e / np.sqrt(n_eff)


def scale_run(m_scale=200_000, W=500, block=4096, sweeps=(100, 100),
              chains=1, n_eff=50_000.0):
    """HM3-class LDpred2-auto on chip: wall time + memory report
    (reference target: ~1M HM3 variants, <2 min/chain on 4 cores x 30
    concurrent chains, vignettes/LDpred2.Rmd:272-393, with a ~60 GB
    SFBM). `chains` runs that many auto chains through the chain-batched
    Pallas path (the reference's 30-process chain grid on one chip)."""
    import jax
    import jax.numpy as jnp
    from bigsnpr_tpu.ops.corr import SparseLD
    from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_auto
    from bigsnpr_tpu.pgs.gibbs_blocked import build_block_bands

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    print(f"building synthetic banded LD m={m_scale} W={W} ...", flush=True)
    t0 = time.perf_counter()
    # AR(1)-decay correlation (Toeplitz, PSD) truncated at W and zeroed
    # at block boundaries — random-diagonal LD is badly non-PSD at this
    # width and trips the sampler's divergence guard (NaN by design)
    corr = SparseLD(upper=_banded_block_ld(m_scale, W, block))
    print(f"  LD built in {time.perf_counter()-t0:.0f}s "
          f"(nnz={corr.upper.nnz/1e6:.0f}M, "
          f"{(corr.upper.data.nbytes + corr.upper.indices.nbytes)/1e9:.1f} GB)")

    n_eff = float(n_eff)
    beta_true = np.zeros(m_scale)
    causal = rng.choice(m_scale, m_scale // 50, replace=False)
    beta_true[causal] = rng.normal(0, 0.01, len(causal))
    Rb = corr.sym() @ beta_true
    h2_true = 0.2
    cal = np.sqrt(h2_true / float(beta_true @ Rb))  # implied h2 -> 0.2
    beta_true *= cal
    se = np.full(m_scale, 1 / np.sqrt(n_eff))
    df = {"beta": cal * Rb + _grouped_gwas_noise(m_scale, n_eff, rng),
          "beta_se": se, "n_eff": np.full(m_scale, n_eff)}
    print(f"calibrated synthetic: h2_true={h2_true} "
          f"(LD-correlated GWAS noise)", flush=True)

    nb_full = m_scale // block
    blocks = np.r_[np.full(nb_full, block),
                   [m_scale - nb_full * block]][:nb_full + (m_scale % block > 0)]
    t0 = time.perf_counter()
    bb = build_block_bands(corr, blocks)
    print(f"band build: {time.perf_counter()-t0:.0f}s, "
          f"device bytes {bb.nbytes/1e9:.2f} GB "
          f"({len(bb.buckets)} buckets, "
          f"dropped r2 {100*bb.dropped_r2_frac:.2f}%)", flush=True)
    t0 = time.perf_counter()
    if jax.default_backend() == "tpu":
        b3, _, _, meta = bb.device_put_mc()
        print(f"v3 device upload: {time.perf_counter()-t0:.0f}s "
              f"({sum(b.nbytes for b in b3)/1e9:.2f} GB, meta {meta})",
              flush=True)
    else:
        bb.device_put()
        print(f"device upload: {time.perf_counter()-t0:.0f}s", flush=True)

    burn_in, num_iter = sweeps
    p_inits = list(np.geomspace(5e-4, 0.3, chains)) if chains > 1 else [0.1]
    t0 = time.perf_counter()
    res = snp_ldpred2_auto(corr, df, h2_init=0.3, vec_p_init=p_inits,
                           burn_in=burn_in, num_iter=num_iter,
                           blocks=bb)
    dt = time.perf_counter() - t0
    tot = (burn_in + num_iter) * m_scale * chains
    nfin = sum(np.isfinite(r["h2_est"]) for r in res)
    print(f"LDpred2-auto[{burn_in}+{num_iter} sweeps, m={m_scale}, "
          f"{chains} chains]: {dt:.0f}s ({tot/dt/1e3:.0f} variant-steps/ms,"
          f" {dt/chains:.1f}s/chain-equiv) {nfin}/{chains} chains finite",
          flush=True)
    fin = [r for r in res if np.isfinite(r["h2_est"])]
    if fin:
        h2s = [r["h2_est"] for r in fin]
        ps = [r["p_est"] for r in fin]
        print(f"h2_est range [{min(h2s):.3f}, {max(h2s):.3f}] "
              f"p_est range [{min(ps):.4f}, {max(ps):.4f}]")
        from bigsnpr_tpu.pgs.ldpred2 import ldpred2_auto_chain_qc

        keep, beta_auto = ldpred2_auto_chain_qc(res)
        if np.isfinite(beta_auto).all():
            r = np.corrcoef(beta_auto, beta_true)[0, 1]
            print(f"chain-QC kept {int(keep.sum())}/{chains}; "
                  f"cor(beta_auto, beta_true) = {r:.3f}")

    if "--seqcheck" in sys.argv:
        # estimate-quality attribution (round-4 verdict #6): same
        # synthetic, 100K slice, blocked vs an UNCUT single-block run
        # (same band W, no cross-block truncation — the reference-design
        # control that is feasible on the tunnel; the literal sequential
        # scan-chain sampler runs at 5-51 steps/ms here, hours at this
        # shape, and is bit-equal to uncut-banded on block-diagonal LD
        # by tests/test_gibbs_blocked.py). If the h2/p spreads agree,
        # the flagship's spread is the sampler's own posterior spread,
        # not block truncation. --seqslow adds the true sequential arm.
        ms = min(100_000, m_scale)
        ind = np.arange(ms)
        corr_s = corr.subset(ind)
        df_s = {"beta": df["beta"][:ms], "beta_se": df["beta_se"][:ms],
                "n_eff": df["n_eff"][:ms]}
        bt_s = beta_true[:ms]
        ch_s = min(chains, 8)
        p_in = list(np.geomspace(5e-4, 0.3, ch_s))
        nbs = ms // block
        blocks_s = np.r_[np.full(nbs, block), [ms - nbs * block]][
            :nbs + (ms % block > 0)]
        arms = [("blocked", dict(blocks=blocks_s)),
                ("uncut", dict(blocks=np.array([ms])))]
        if "--seqslow" in sys.argv:
            arms.append(("sequential", dict()))
        for label, kw in arms:
            t0 = time.perf_counter()
            rs = snp_ldpred2_auto(corr_s, df_s, h2_init=0.3,
                                  vec_p_init=p_in, burn_in=burn_in,
                                  num_iter=num_iter, **kw)
            dts = time.perf_counter() - t0
            fin_s = [r for r in rs if np.isfinite(r["h2_est"])]
            h2v = [r["h2_est"] for r in fin_s]
            pv = [r["p_est"] for r in fin_s]
            keep, b_auto = ldpred2_auto_chain_qc(rs)
            rcor = (np.corrcoef(b_auto, bt_s)[0, 1]
                    if np.isfinite(b_auto).all() else np.nan)
            print(f"[seqcheck {label}] {ms} x {ch_s} chains: {dts:.0f}s, "
                  f"{len(fin_s)}/{ch_s} finite, "
                  f"h2 [{min(h2v):.3f}, {max(h2v):.3f}] "
                  f"p [{min(pv):.4f}, {max(pv):.4f}] "
                  f"cor(beta, true) = {rcor:.3f}", flush=True)


def supervised(quick, sweep):
    """Each section in its own subprocess with a timeout: a wedged
    transfer or compile loses one section, not the suite (round-2
    postmortem: a single inline run sat 10 min in one transfer and the
    watchdog kill wedged the tunnel)."""
    import subprocess

    sections = ["power"] + (["sweep"] if sweep else []) + \
        ["svd", "gibbs", "cor", "autosvd"]
    budget = {"power": 600, "sweep": 1800, "svd": 420,
              "gibbs": 600, "cor": 420, "autosvd": 1800}
    # PYTHONUNBUFFERED: a timeout-killed child must not take its
    # block-buffered partial results with it (lost the round-3 sweep)
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    for part in sections:
        cmd = [sys.executable, os.path.abspath(__file__), "--inline",
               "--part", part] + (["--quick"] if quick else []) + \
            (["--sweep"] if sweep else [])
        print(f"=== section {part} (timeout {budget[part]}s)", flush=True)
        try:
            rc = subprocess.run(cmd, timeout=budget[part],
                                env=env).returncode
            if rc:
                print(f"!!! section {part} exited rc={rc}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"!!! section {part} TIMED OUT", flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        # force CPU BEFORE any jax op (the axon plugin ignores
        # JAX_PLATFORMS=cpu) — for scale runs while the tunnel is down
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--scale" in sys.argv:
        def _arg(flag, default, cast=int):
            if flag in sys.argv:
                return cast(sys.argv[sys.argv.index(flag) + 1])
            return default

        m_s = _arg("--scale", 200_000)
        scale_run(m_scale=m_s, W=_arg("--W", 500),
                  block=_arg("--block", 4096),
                  sweeps=(_arg("--burn", 100), _arg("--iter", 100)),
                  chains=_arg("--chains", 1),
                  n_eff=_arg("--neff", 50_000.0, float))
    elif "--part" in sys.argv:
        i = sys.argv.index("--part")
        main(quick="--quick" in sys.argv, sweep="--sweep" in sys.argv,
             parts={sys.argv[i + 1]})
    elif "--inline" in sys.argv:
        main(quick="--quick" in sys.argv, sweep="--sweep" in sys.argv)
    else:
        supervised(quick="--quick" in sys.argv, sweep="--sweep" in sys.argv)
