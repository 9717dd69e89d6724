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
    snp_save,
    snp_subset,
)
from bigsnpr_tpu.io.bed import (
    read_bed,
    snp_readBed,
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

__version__ = "0.1.0"
