"""bigsnpr_tpu — TPU-native SNP-array analysis engine.

A from-scratch JAX/XLA/Pallas re-foundation of the capabilities of the R
package bigsnpr (privefl/bigsnpr): file-backed genotype matrices become
2-bit-packed device arrays decoded on-chip; streaming linear algebra,
LD computation, clumping, PCA (autoSVD), and polygenic-score methods
(C+T/SCT, LDpred2, lassosum2, LDSC) run as jit-compiled, shardable XLA
programs over a `jax.sharding.Mesh`.

Public API mirrors the reference's naming (``snp_*`` / ``bed_*``,
cf. reference NAMESPACE:3-88) so that users of bigsnpr can find their way.
"""

from bigsnpr_tpu.core.genotypes import (
    GenoPack,
    snp_fake,
    snp_attach,
    snp_attach_rds,
    snp_save,
    snp_subset,
)
from bigsnpr_tpu.io.bed import (
    read_bed,
    bed,
    snp_readBed,
    snp_readBed2,
    snp_writeBed,
    snp_attachExtdata,
)
from bigsnpr_tpu.ops.stats import (
    snp_colstats,
    snp_counts,
    bed_counts,
    snp_MAF,
    bed_MAF,
    snp_scaleBinom,
    bed_scaleBinom,
    snp_scaleAlpha,
    as_scaling_fun,
)
from bigsnpr_tpu.ops.matvec import (
    snp_prodVec,
    snp_cprodVec,
    bed_prodVec,
    bed_cprodVec,
)
from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD, bed_randomSVD, BigSVD
from bigsnpr_tpu.ops.corr import snp_cor, bed_cor, SparseLD
from bigsnpr_tpu.ops.ldscores import snp_ld_scores, bed_ld_scores, ld_scores_sfbm
from bigsnpr_tpu.ops.clumping import snp_clumping, bed_clumping, snp_indLRLDR
from bigsnpr_tpu.pca.autosvd import snp_autoSVD, bed_autoSVD
from bigsnpr_tpu.ops.splitld import snp_ldsplit
from bigsnpr_tpu.pgs.ldsc import snp_ldsc, snp_ldsc2, coef_to_liab
from bigsnpr_tpu.pgs.ldpred2 import (
    snp_ldpred2_inf, snp_ldpred2_grid, snp_ldpred2_auto,
    ldpred2_auto_chain_qc,
)
from bigsnpr_tpu.pgs.lassosum2 import snp_lassosum2, seq_log
from bigsnpr_tpu.pgs.prs import snp_PRS, snp_thr_correct
from bigsnpr_tpu.pgs.sct import snp_grid_clumping, snp_grid_PRS, snp_grid_stacking
from bigsnpr_tpu.assoc.gwas import big_univLinReg, big_univLogReg
from bigsnpr_tpu.assoc.simu import snp_simuPheno
from bigsnpr_tpu.assoc.pcadapt import snp_pcadapt, bed_pcadapt
from bigsnpr_tpu.assoc.max3 import snp_MAX3
from bigsnpr_tpu.assoc.fst import snp_fst
from bigsnpr_tpu.assoc.mhtest import (
    MHTest, snp_gc, snp_qq, snp_manhattan, mhtest_from_gwas,
)
from bigsnpr_tpu.utils.match import (
    snp_match, same_ref, snp_asGeneticPos, snp_asGeneticPos2,
)
from bigsnpr_tpu.utils.impute import snp_fastImpute, snp_fastImputeSimple
from bigsnpr_tpu.ops.grm import bed_tcrossprodSelf, bed_GRM
from bigsnpr_tpu.pca.ancestry import snp_ancestry_summary
from bigsnpr_tpu.pca.project import (
    bed_projectPCA, bed_projectSelfPCA, snp_projectSelfPCA, pca_OADP_proj,
)
from bigsnpr_tpu.core.dosage import DosagePack
from bigsnpr_tpu.core.codes import CODE_012, CODE_DOSAGE, CODE_IMPUTE_PRED
from bigsnpr_tpu.utils.misc import (
    sub_bed, as_SFBM, snp_getSampleInfos, snp_split, snp_pruning,
    download_1000G, download_genetic_map,
)
from bigsnpr_tpu.io.bgen import snp_readBGEN, snp_readBGI, snp_prodBGEN
from bigsnpr_tpu.utils.external import (
    snp_plinkQC, snp_plinkIBDQC, snp_plinkKINGQC, snp_plinkRmSamples,
    snp_beagleImpute, snp_modifyBuild, download_plink, download_plink2,
    download_beagle,
)

# TPU-specific extension (no reference twin): deliberate pre-compilation
from bigsnpr_tpu.warmup import warmup, warmup_svd, warmup_gibbs

__version__ = "0.1.0"
