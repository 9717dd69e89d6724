"""PCA projection of new samples onto reference PCs, with OADP shrinkage
correction.

Reference: bed_projectPCA / bed_projectSelfPCA (R/bed-projectPCA.R:100-281)
on the fused XᵀV + row-norms kernel (src/bed-fun.cpp:103-133,
src/project-utils.cpp:12-43), and bigutilsr::pca_OADP_proj2 (external):
Online Augmentation, Decomposition, and Procrustes (Zhang, Dey & Lee 2020).

OADP here: per sample, eigen-decompose the (K+1) arrowhead
diag(d^2, 0) + b b^T (b = [V^T x, residual norm]), take the augmented
score b.u_k, and Procrustes-map augmented reference scores back onto the
original ones (computable in closed form from d and the eigenvectors).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bigsnpr_tpu.config as config
from bigsnpr_tpu.core.unpack import unpack_standardized
from bigsnpr_tpu.ops.blocks import pick_block, pad_rows
from bigsnpr_tpu.utils.match import snp_match


@partial(jax.jit, static_argnames=("n", "block", "precision"))
def _proj_blocked(packed, V, center, scale, n, block, precision):
    """Fused XV = X̃ V and X_norm = rowSums(X̃^2) in one streaming pass
    (reference prod_and_rowSumsSq)."""
    m_pad, nb = packed.shape
    nblocks = m_pad // block
    blocks = packed.reshape(nblocks, block, nb)
    c = center.reshape(nblocks, block)
    s = scale.reshape(nblocks, block)
    Vb = V.reshape(nblocks, block, -1)

    def body(carry, args):
        xv, xn = carry
        pb, cb, sb, vb = args
        xt = unpack_standardized(pb, n, cb, sb)      # (block, n)
        xv = xv + jnp.dot(xt.T, vb, preferred_element_type=jnp.float32,
                          precision=precision)
        xn = xn + jnp.sum(xt * xt, axis=0)
        return (xv, xn), None

    K = V.shape[-1]
    init = (jnp.zeros((n, K), jnp.float32), jnp.zeros(n, jnp.float32))
    (xv, xn), _ = jax.lax.scan(body, init, (blocks, c, s, Vb))
    return xv, xn


def prod_and_row_sums_sq(pack, V, center, scale, ind_col=None, block=None):
    """(XV (n, K), X_norm (n,)) on the standardized columns ind_col."""
    sub = pack if ind_col is None else pack.subset(ind_col=np.asarray(ind_col))
    n, m = sub.n, sub.m
    V = np.asarray(V, dtype=np.float64)
    assert V.shape[0] == m
    block = block or pick_block(n)
    packed, _ = pad_rows(np.asarray(sub.packed), block)
    # pad variants decode as dosage 2 (zero bytes) -> center 2 zeroes them,
    # which matters for the X_norm accumulation (XV is already masked by V=0)
    c, _ = pad_rows(np.asarray(center, dtype=np.float32), block, fill=2)
    s, _ = pad_rows(np.asarray(scale, dtype=np.float32), block, fill=1)
    Vp, _ = pad_rows(V.astype(np.float32), block, fill=0)
    xv, xn = _proj_blocked(jnp.asarray(packed), jnp.asarray(Vp),
                           jnp.asarray(c), jnp.asarray(s), n, block,
                           config.matmul_precision)
    return np.asarray(xv, dtype=np.float64), np.asarray(xn, dtype=np.float64)


def pca_OADP_proj(XV: np.ndarray, X_norm: np.ndarray, sval: np.ndarray):
    """OADP-corrected projection (bigutilsr::pca_OADP_proj2 surface)."""
    XV = np.asarray(XV, dtype=np.float64)
    X_norm = np.asarray(X_norm, dtype=np.float64)
    sval = np.asarray(sval, dtype=np.float64)
    K = len(sval)
    d2 = sval**2
    out = np.empty_like(XV)
    for i in range(XV.shape[0]):
        z = XV[i]
        r2 = max(X_norm[i] - z @ z, 0.0)
        b = np.r_[z, np.sqrt(r2)]
        A = np.diag(np.r_[d2, 0.0]) + np.outer(b, b)
        lam, U = np.linalg.eigh(A)
        lam, U = lam[::-1][:K], U[:, ::-1][:, :K]
        # augmented score of the new sample
        t = b @ U
        # Procrustes of augmented ref scores (A_ref = U S Ubar) onto U S:
        # M = Ubar^T diag(d2); R from SVD(M), scale rho
        Ubar = U[:K, :]
        M = Ubar.T @ np.diag(d2)
        P, Sig, Qt = np.linalg.svd(M)
        R = P @ Qt
        denom = np.trace(Ubar.T @ np.diag(d2) @ Ubar)
        rho = Sig.sum() / denom if denom > 0 else 1.0
        out[i] = rho * (t @ R)
    return out


def bed_projectSelfPCA(obj_svd, pack, ind_row=None, ind_col=None) -> dict:
    """Project (other) individuals of the same dataset on obj_svd
    (reference bed_projectSelfPCA, R/bed-projectPCA.R:196-225)."""
    if ind_col is None:
        ind_col = obj_svd.subset
    assert ind_col is not None, "pass ind_col (or use autoSVD's subset)"
    sub = pack if ind_row is None else pack.subset(ind_row=np.asarray(ind_row))
    XV, X_norm = prod_and_row_sums_sq(sub, obj_svd.v, obj_svd.center,
                                      obj_svd.scale, ind_col=ind_col)
    return {
        "obj.svd.ref": obj_svd,
        "simple_proj": XV,
        "OADP_proj": pca_OADP_proj(XV, X_norm, obj_svd.d),
    }


snp_projectSelfPCA = bed_projectSelfPCA


def bed_projectPCA(pack_ref, pack_new, k: int = 10, ind_row_new=None,
                   ind_row_ref=None, ind_col_ref=None, strand_flip=True,
                   join_by_pos=True, match_min_prop=0.5, verbose=False,
                   **autosvd_kw) -> dict:
    """Match variants, autoSVD the reference, project the target
    (reference bed_projectPCA, R/bed-projectPCA.R:100-172)."""
    from bigsnpr_tpu.pca.autosvd import bed_autoSVD

    def remap(map_df):
        import pandas as pd

        return pd.DataFrame({
            "chr": map_df["chromosome"].to_numpy(),
            "rsid": map_df["marker.ID"].to_numpy(),
            "pos": map_df["physical.pos"].to_numpy(),
            "a1": map_df["allele1"].to_numpy(),
            "a0": map_df["allele2"].to_numpy(),
        })

    map_ref = remap(pack_ref.map)
    map_ref["beta"] = 1.0
    map_new = remap(pack_new.map)
    info_snp = snp_match(map_ref, map_new, strand_flip=strand_flip,
                         join_by_pos=join_by_pos,
                         match_min_prop=match_min_prop, verbose=verbose)

    num_ref = info_snp["_NUM_ID_.ss"].to_numpy() - 1
    num_new = info_snp["_NUM_ID_"].to_numpy() - 1
    ind_col = num_ref if ind_col_ref is None else np.intersect1d(
        np.asarray(ind_col_ref), num_ref)

    obj_svd = bed_autoSVD(pack_ref, ind_row=ind_row_ref, ind_col=ind_col,
                          k=k, verbose=verbose, **autosvd_kw)

    # keep = match(subset, num_ref) — num_ref is not necessarily sorted
    order = np.argsort(num_ref)
    keep = order[np.searchsorted(num_ref[order], obj_svd.subset)]
    assert np.array_equal(num_ref[keep], obj_svd.subset)
    beta = info_snp["beta"].to_numpy()[keep]
    center = (obj_svd.center - 1) * beta + 1
    scale = obj_svd.scale * beta

    sub_new = (pack_new if ind_row_new is None
               else pack_new.subset(ind_row=np.asarray(ind_row_new)))
    XV, X_norm = prod_and_row_sums_sq(sub_new, obj_svd.v, center, scale,
                                      ind_col=num_new[keep])
    return {
        "obj.svd.ref": obj_svd,
        "simple_proj": XV,
        "OADP_proj": pca_OADP_proj(XV, X_norm, obj_svd.d),
    }
