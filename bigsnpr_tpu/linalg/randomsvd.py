"""Randomized partial SVD of the implicit standardized genotype operator.

The reference delegates to bigstatsr::big_randomSVD (an iterative
Lanczos-style solver parameterized by a matvec pair,
reference R/autoSVD.R:205-219). TPU design: randomized subspace (power)
iteration on the sample-side Gram operator — each iteration is one
mat-mat pair (X̃ᵀQ then X̃·), which keeps the MXU busy with (block x n x l)
GEMMs instead of m separate dots. Converges to the same top-k subspace;
parity is to tolerance, like the reference's own tol=1e-4 contract.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from bigsnpr_tpu.ops.matvec import snp_prodVec, snp_cprodVec
from bigsnpr_tpu.ops.stats import bed_scaleBinom


@dataclass
class BigSVD:
    """Result container mirroring bigstatsr's big_SVD {d, u, v, center, scale}."""

    d: np.ndarray        # (k,) singular values
    u: np.ndarray        # (n, k) left vectors (samples)
    v: np.ndarray        # (m, k) right vectors (variants)
    center: np.ndarray
    scale: np.ndarray
    niter: int = 0
    # attrs filled by autoSVD
    subset: np.ndarray | None = None
    lrldr: object | None = None

    def scores(self) -> np.ndarray:
        """PC scores = u * d (the reference's predict.big_SVD)."""
        return self.u * self.d


def _orth(Y: np.ndarray) -> np.ndarray:
    q, _ = np.linalg.qr(Y)
    return q


def snp_randomSVD(
    pack,
    fun_scaling=bed_scaleBinom,
    ind_col=None,
    k: int = 10,
    tol: float = 1e-4,
    max_iter: int = 200,
    oversample: int = 10,
    seed: int = 1,
    verbose: bool = False,
    engine: str = "auto",
) -> BigSVD:
    """Truncated SVD of the standardized genotype matrix.

    Reference: bed_randomSVD (R/autoSVD.R:205-219): needs only
    {scaling stats, X·v, Xᵀ·v}; k=10, tol=1e-4 defaults.

    engine: "auto" uses the fused Pallas operator on TPU for 2-bit packs,
    the XLA blocked path otherwise.
    """
    full = ind_col is None
    sub = pack if full else pack.subset(ind_col=np.asarray(ind_col))
    sc = fun_scaling(sub) if callable(fun_scaling) else fun_scaling
    center, scale = np.asarray(sc["center"]), np.asarray(sc["scale"])
    n, m = sub.n, sub.m

    op = None
    if engine != "xla" and hasattr(sub, "packed"):
        import jax

        if engine == "pallas" or (engine == "auto"
                                  and jax.default_backend() == "tpu"):
            from bigsnpr_tpu.ops.pallas_kernels import PallasOperator

            op = PallasOperator(sub, center,
                                np.where(scale > 0, scale, 1.0))

    def cprod_fn(V):
        if op is not None:
            return op.cprod(V)
        return np.asarray(snp_cprodVec(sub, V, center, scale))

    def prod_fn(U):
        if op is not None:
            return op.prod(U)
        return np.asarray(snp_prodVec(sub, U, center, scale))

    l = min(k + oversample, min(n, m))
    rng = np.random.default_rng(seed)
    Q = _orth(rng.standard_normal((n, l)))
    d_prev = np.zeros(k)
    niter = 0
    for it in range(max_iter):
        niter = it + 1
        Z = cprod_fn(Q)   # (m, l)
        Y = prod_fn(Z)    # (n, l)
        Q, R = np.linalg.qr(Y)
        # eigenvalues of the Gram operator ~ diag of R (after QR of A Aᵀ Q)
        d_now = np.sqrt(np.abs(np.diag(R))[:k])
        rel = np.max(np.abs(d_now - d_prev) / np.maximum(d_now, 1e-30))
        if verbose:
            print(f"  randomSVD iter {niter}: rel change {rel:.2e}")
        if rel < tol:
            break
        d_prev = d_now

    # Rayleigh-Ritz: T = Qᵀ X̃ = Zᵀ with final Q
    Z = cprod_fn(Q)                                           # (m, l)
    Ut, s, Vtt = np.linalg.svd(Z.T, full_matrices=False)      # Z.T = (l, m)
    u = Q @ Ut[:, :k]
    d = s[:k]
    v = Vtt[:k].T

    # sign convention: largest-|loading| coordinate of each u positive
    signs = np.sign(u[np.argmax(np.abs(u), axis=0), np.arange(k)])
    signs[signs == 0] = 1
    return BigSVD(d=d, u=u * signs, v=v * signs, center=center, scale=scale,
                  niter=niter)


def bed_randomSVD(pack, fun_scaling=bed_scaleBinom, ind_col=None, k=10,
                  tol=1e-4, **kw) -> BigSVD:
    return snp_randomSVD(pack, fun_scaling=fun_scaling, ind_col=ind_col, k=k,
                         tol=tol, **kw)
