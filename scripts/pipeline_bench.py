"""End-to-end on-chip pipeline wall time (round-3 verdict #7).

The single number a bigsnpr user can compare to their workstation:
.bed ingest -> GWAS -> windowed snp_cor -> LDSC h2 -> LDpred2-auto
(multi-chain, chain-batched Pallas) -> snp_PRS scoring, per-stage wall
+ one total, at a realistic single-chromosome shape. Reference flow:
vignettes/LDpred2.Rmd:90-393 (their tutorial pipeline on a real
chromosome 22: ~15 min on 4 cores at n=350K x m=40K class).

Usage: python scripts/pipeline_bench.py [--n 10000] [--m 100000]
           [--chains 30] [--burn 500] [--iter 200] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    def arg(flag, default, cast=int):
        if flag in sys.argv:
            return cast(sys.argv[sys.argv.index(flag) + 1])
        return default

    n = arg("--n", 10_000)
    m = arg("--m", 100_000)
    chains = arg("--chains", 30)
    burn_in = arg("--burn", 500)
    num_iter = arg("--iter", 200)

    import jax

    import bigsnpr_tpu as bt
    from bigsnpr_tpu import config as btconfig
    from bigsnpr_tpu.assoc.gwas import big_univLinReg
    from bigsnpr_tpu.utils.profiling import StageTimer

    btconfig.enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from tpu_validation import _ld_structured_pack

    bed = f"/tmp/pipeline_bench_{n}x{m}.bed"
    if "--reuse" in sys.argv and os.path.exists(bed):
        print(f"reusing {bed}", flush=True)
    else:
        rng = np.random.default_rng(7)
        t0 = time.perf_counter()
        pack0 = _ld_structured_pack(n, m, rng)
        import dataclasses

        import pandas as pd

        pack0 = dataclasses.replace(pack0, fam=pd.DataFrame({
            "family.ID": np.arange(n), "sample.ID": np.arange(n),
            "paternal.ID": 0, "maternal.ID": 0, "sex": 1, "affection": -9,
        }), map=pd.DataFrame({
            "chromosome": np.ones(m, np.int32),
            "marker.ID": [f"SNP{j}" for j in range(m)],
            "genetic.dist": 0.0,
            "physical.pos": np.arange(1, m + 1) * 1000,
            "allele1": "A", "allele2": "C",
        }))
        bt.snp_writeBed(pack0, bed)
        print(f"synthetic cohort {n}x{m} built + written in "
              f"{time.perf_counter()-t0:.0f}s "
              f"({os.path.getsize(bed)/1e6:.0f} MB .bed)", flush=True)

    t = StageTimer()
    with t.stage("bed ingest"):
        pack = bt.snp_readBed(bed)
    pos = np.arange(1, m + 1) * 1000

    with t.stage("simulate trait"):
        simu = bt.snp_simuPheno(pack, h2=0.2, M=m // 50, seed=2)
        y = simu["pheno"]
    with t.stage("GWAS (big_univLinReg)"):
        gwas = big_univLinReg(pack, y)
        df_beta = {"beta": gwas["estim"].to_numpy(),
                   "beta_se": gwas["std.err"].to_numpy(),
                   "n_eff": np.full(m, float(n))}

    with t.stage("windowed LD (snp_cor)"):
        corr = bt.snp_cor(pack, size=500, infos_pos=pos, thr_r2=0.01,
                          finalize="device"
                          if jax.default_backend() == "tpu" else "host")
    print(f"  LD: nnz={corr.upper.nnz/1e6:.1f}M", flush=True)

    with t.stage("LDSC h2"):
        h2_est = bt.snp_ldsc2(corr, df_beta)["h2"]
    print(f"  LDSC h2 = {h2_est:.3f} (true 0.2)", flush=True)

    from bigsnpr_tpu.pgs.gibbs_blocked import auto_blocks, build_block_bands

    with t.stage("LD blocks (auto_blocks/ldsplit)"):
        blocks = auto_blocks(corr)
    print(f"  {len(blocks)} blocks, max {int(np.max(blocks))}", flush=True)
    with t.stage("band build + device upload"):
        bb = build_block_bands(corr, blocks)
        if jax.default_backend() == "tpu":
            bb.device_put_mc()
        else:
            bb.device_put()
    print(f"  bands {bb.nbytes/1e9:.2f} GB, {len(bb.buckets)} buckets, "
          f"dropped r2 {100*bb.dropped_r2_frac:.2f}%", flush=True)
    with t.stage("LDpred2-auto multi-chain sampling"):
        auto = bt.snp_ldpred2_auto(
            corr, df_beta, h2_init=max(float(h2_est), 0.05),
            vec_p_init=list(np.geomspace(1e-4, 0.2, chains)),
            burn_in=burn_in, num_iter=num_iter, blocks=bb)
    nfin = sum(np.isfinite(r["h2_est"]) for r in auto)
    print(f"  {nfin}/{chains} chains finite", flush=True)

    with t.stage("chain QC + PRS scoring"):
        from bigsnpr_tpu.pgs.ldpred2 import ldpred2_auto_chain_qc

        keep, beta_auto = ldpred2_auto_chain_qc(auto)
        pred = np.asarray(bt.snp_prodVec(pack, beta_auto))
        r = np.corrcoef(pred, y)[0, 1]
    h2s = [r_["h2_est"] for r_ in auto if np.isfinite(r_["h2_est"])]
    print(f"  kept {int(keep.sum())}/{chains} chains, r(PRS, y) = {r:.3f}, "
          f"h2_est median {np.median(h2s):.3f}", flush=True)

    print(f"\npipeline @ {n}x{m}, {chains} chains x "
          f"{burn_in}+{num_iter} sweeps: {sum(t.times.values()):.0f}s total")
    print(t.report())
    if "--reuse" not in sys.argv:
        for f in (bed, bed[:-4] + ".bim", bed[:-4] + ".fam"):
            if os.path.exists(f):
                os.remove(f)


if __name__ == "__main__":
    main()
