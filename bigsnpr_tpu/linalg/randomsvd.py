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

import jax
import jax.numpy as jnp
import numpy as np

from bigsnpr_tpu.utils.assertions import check_args

from bigsnpr_tpu.ops.matvec import snp_prodVec, snp_cprodVec
from bigsnpr_tpu.ops.pallas_kernels import tpu_jit
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


def _device_krylov(op, n, m, k, l, tol, max_depth, seed, verbose):
    """Fully device-resident block-Krylov loop.

    The host loop in snp_randomSVD pulls (B, Y) to host every depth and
    orthogonalizes in numpy — over a tunneled TPU each depth then costs
    host-link latency (measured ~140 ms/step vs ~10 ms on-device). Here
    the Krylov basis K, the cprod blocks M, and the Gram matrix G are
    preallocated on device; one jitted step per depth does
    re-orthogonalization, QR, the fused power step, and the Gram update.
    Per depth only the filled (filled, filled) corner of the Gram
    crosses the link (sliced on device) for the host Ritz/convergence
    check; u/v are formed on device after convergence.
    """
    import jax
    import jax.numpy as jnp

    Lmax = l * max_depth

    # The loop is a host-driven chain of SMALL top-level device
    # programs (projection, CholQR2, Gram update) around the ONE big
    # shared program (op.power_dev = the cached _power_sub). Inlining
    # the power step into monolithic init/depth_step programs made each
    # operator's first call a novel big server-side compile — at the
    # 2490 x 1.7M autoSVD geometry one such compile ran >30 min and
    # broke the tunnel pipe (round-4). All state stays device-resident
    # between calls; only dispatch latency is paid per depth.
    rng_h = np.random.default_rng(seed)
    Y = jnp.asarray(rng_h.standard_normal((n, l)).astype(np.float32))
    Q = _cholqr2_j(Y)
    B, Y = op.power_dev(Q)
    K, M, G = _krylov_init(Q, B, m, Lmax)
    filled = l
    d_prev = np.zeros(k)
    niter = 0
    for it in range(max_depth):
        niter = it + 1
        d_now = _ritz_host(G, filled, k)
        rel = np.max(np.abs(d_now - d_prev) / np.maximum(d_now, 1e-30))
        if verbose:
            print(f"  randomSVD[device] depth {niter}: rel {rel:.2e}")
        if rel < tol or filled + l > Lmax or filled >= min(n, m):
            break
        d_prev = d_now
        fj = jnp.asarray(filled, jnp.int32)
        Q = _krylov_newdirs(K, Y, fj)
        B, Y = op.power_dev(Q)
        K, M, G = _krylov_update(K, M, G, Q, B, fj)
        filled += l

    Gh = np.asarray(G)[:filled, :filled].astype(np.float64)
    evals, Wh = np.linalg.eigh(Gh)
    order = np.argsort(evals)[::-1][:min(k, filled)]
    d = np.pad(np.sqrt(np.maximum(evals[order], 0.0)),
               (0, k - len(order)))
    W = np.zeros((Lmax, k), np.float32)
    W[:filled, :len(order)] = Wh[:, order]
    u, v = _krylov_extract(K, M, jnp.asarray(W), jnp.asarray(d, jnp.float32))
    return (np.asarray(d, np.float64), np.asarray(u, np.float64),
            np.asarray(v, np.float64), niter)


def _cached_op(pack, ctor, c_f, s_f, ind_row, ind_col, cap=4):
    """Reuse operators across snp_randomSVD calls on the same pack.

    A new operator per call rebuilds the per-op Krylov jits — over the
    tunnel that means recompiling the pallas programs (30-85 s each
    under server load). Keyed by content (scaling + masks), FIFO-capped;
    device memory stays shared through the pack's padded-device cache.

    Keys include id(pack.packed): a replace()'d pack inheriting
    _op_cache, or an in-place mutation swapping the packed array, must
    not serve operators built on stale genotype bytes (in-place edits
    of the SAME array remain the caller's responsibility — GenoPack is
    treated as immutable, like the _device_cache caveat)."""
    import hashlib

    h = hashlib.md5()
    h.update(str(id(pack.packed)).encode())
    for a in (c_f, s_f):
        h.update(np.ascontiguousarray(np.asarray(a, np.float64)).tobytes())
    for idx in (ind_row, ind_col):
        h.update(b"-" if idx is None else
                 np.ascontiguousarray(np.asarray(idx, np.int64)).tobytes())
    key = (ctor.__name__, h.hexdigest())
    cache = pack._op_cache
    if cache is None:
        cache = {}
        try:
            object.__setattr__(pack, "_op_cache", cache)
        except AttributeError:
            return ctor(pack, c_f, s_f, ind_row=ind_row, ind_col=ind_col)
    if key not in cache:
        if len(cache) >= cap:
            cache.pop(next(iter(cache)))
        cache[key] = ctor(pack, c_f, s_f, ind_row=ind_row, ind_col=ind_col)
    return cache[key]


def _ritz_host(G, filled, k):
    # slice the filled corner ON DEVICE before the fetch — the full
    # (Lmax, Lmax) Gram is ~6.5 MB at Lmax=1280, the corner is filled^2
    Gh = np.asarray(G[:filled, :filled]).astype(np.float64)
    evals = np.linalg.eigvalsh(Gh)
    d = np.sqrt(np.maximum(evals[::-1][:k], 0.0))
    return np.pad(d, (0, k - len(d)))  # filled < k at shallow depth


# --- small device programs of the Krylov loop (module-level jits,
# cached across calls/operators by argument shapes). No
# jnp.linalg.{qr,eigh} inside: their XLA programs compiled in MINUTES
# over the tunnel (120 s + 40 s at 32768x8192, vs 60 ms/depth of
# compute). Orthonormalization is CholQR2 (GEMMs + an l x l Cholesky,
# ridge-guarded, backed by the re-orth passes); the tiny Ritz/extract
# eigensolves run on HOST from the fetched (Lmax, Lmax) Gram.

_HP = jax.lax.Precision.HIGHEST


def _cholqr2_body(Y):
    for _ in range(2):
        Gs = jnp.dot(Y.T, Y, precision=_HP)
        # ridge keeps chol finite when directions have collapsed into
        # the existing span; callers' norm-zeroing drops them
        eps = 1e-7 * jnp.trace(Gs) / Gs.shape[0] + 1e-30
        R = jnp.linalg.cholesky(Gs + eps * jnp.eye(Gs.shape[0],
                                                   dtype=Y.dtype))
        Y = jax.lax.linalg.triangular_solve(
            R, Y, left_side=False, lower=True, transpose_a=True)
    return Y


@tpu_jit
def _cholqr2_j(Y):
    return _cholqr2_body(Y)


@tpu_jit(static_argnames=("m", "Lmax"))
def _krylov_init(Q, B, m, Lmax):
    n = Q.shape[0]
    K = jnp.zeros((n, Lmax), jnp.float32)
    M = jnp.zeros((m, Lmax), jnp.float32)
    G = jnp.zeros((Lmax, Lmax), jnp.float32)
    K = jax.lax.dynamic_update_slice(K, Q, (0, 0))
    M = jax.lax.dynamic_update_slice(M, B, (0, 0))
    C = jnp.dot(B.T, B, precision=_HP)
    G = jax.lax.dynamic_update_slice(G, C, (0, 0))
    return K, M, G


@tpu_jit
def _krylov_newdirs(K, Y, filled):
    """Project Y out of span(K[:, :filled]), CholQR2, re-project, and
    zero directions whose survived norm is negligible."""
    Lmax = K.shape[1]
    colmask = (jnp.arange(Lmax) < filled).astype(jnp.float32)
    Km = K * colmask
    for _ in range(2):
        Y = Y - jnp.dot(Km, jnp.dot(Km.T, Y, precision=_HP),
                        precision=_HP)
    Q = _cholqr2_body(Y)
    Q = Q - jnp.dot(Km, jnp.dot(Km.T, Q, precision=_HP), precision=_HP)
    norms = jnp.linalg.norm(Q, axis=0)
    Q = jnp.where(norms > 1e-4, Q / jnp.maximum(norms, 1e-30), 0.0)
    return Q


@tpu_jit
def _krylov_update(K, M, G, Q, B, filled):
    Lmax = K.shape[1]
    colmask = (jnp.arange(Lmax) < filled).astype(jnp.float32)
    K2 = jax.lax.dynamic_update_slice(K, Q, (0, filled))
    Mm = M * colmask
    C = jnp.dot(Mm.T, B, precision=_HP)              # (Lmax, l)
    corner = jnp.dot(B.T, B, precision=_HP)          # (l, l)
    C = jax.lax.dynamic_update_slice(C, corner, (filled, 0))
    G2 = jax.lax.dynamic_update_slice(G, C, (0, filled))
    G2 = jax.lax.dynamic_update_slice(G2, C.T, (filled, 0))
    M2 = jax.lax.dynamic_update_slice(M, B, (0, filled))
    return K2, M2, G2


@tpu_jit
def _krylov_extract(K, M, W, d):
    u = jnp.dot(K, W, precision=_HP)
    v = jnp.dot(M, W, precision=_HP) / jnp.maximum(d, 1e-30)
    return u, v


@check_args()
def snp_randomSVD(
    pack,
    fun_scaling=bed_scaleBinom,
    ind_row=None,
    ind_col=None,
    k: int = 10,
    tol: float = 1e-4,
    max_iter: int = 200,
    oversample: int = 10,
    seed: int = 1,
    verbose: bool = False,
    engine: str = "auto",
    op=None,
) -> BigSVD:
    """Truncated SVD of the standardized genotype matrix.

    Reference: bed_randomSVD (R/autoSVD.R:205-219): needs only
    {scaling stats, X·v, Xᵀ·v}; k=10, tol=1e-4 defaults.

    engine: "auto" uses the fused Pallas operator on TPU for 2-bit packs,
    the XLA blocked path otherwise.
    op: a pre-built operator with the {n, m, cprod, prod[, power]}
    surface (e.g. a multi-host MeshOperator from
    parallel.distributed.distributed_binom_operator); pack may be None
    and fun_scaling must then be a {"center","scale"} dict.
    """
    import jax

    full = ind_col is None and ind_row is None
    has_pack = (op is None and hasattr(pack, "packed")
                and hasattr(pack, "device_packed_padded"))
    on_tpu = jax.default_backend() == "tpu"
    want_mesh = engine in ("mesh", "mesh-device") or (
        engine == "auto" and on_tpu and len(jax.devices()) > 1)
    sub = None
    if op is not None:
        sc = fun_scaling(op) if callable(fun_scaling) else fun_scaling
        center = np.asarray(sc["center"], dtype=np.float64)
        scale = np.asarray(sc["scale"], dtype=np.float64)
        n, m = op.n, op.m

    if has_pack and not want_mesh:
        # Masked-subset path: the packed bytes stay whole (and cached) on
        # device; ind_row/ind_col become on-device scatter/gather inside
        # the operator — no host repack per autoSVD iteration. Scaling is
        # computed over all variants on the row subset, gathered at
        # ind_col (identical values to scaling the physical subset).
        try:
            sc = (fun_scaling(pack, ind_row=ind_row)
                  if callable(fun_scaling) else fun_scaling)
            c_f = np.asarray(sc["center"], dtype=np.float64)
            s_f = np.asarray(sc["scale"], dtype=np.float64)
            if len(c_f) != pack.m:
                raise ValueError("scaling length mismatch")
        except (TypeError, ValueError):
            sc = None
        if sc is not None:
            center = c_f if ind_col is None else c_f[np.asarray(ind_col)]
            scale = s_f if ind_col is None else s_f[np.asarray(ind_col)]
            if engine == "pallas" or (engine == "auto" and on_tpu):
                from bigsnpr_tpu.ops.pallas_kernels import PallasOperator

                op = _cached_op(pack, PallasOperator, c_f, s_f,
                                ind_row, ind_col)
            else:
                from bigsnpr_tpu.ops.matvec import XlaOperator

                op = _cached_op(pack, XlaOperator, c_f, s_f,
                                ind_row, ind_col)
            n, m = op.n, op.m

    if op is None:
        sub = pack if full else pack.subset(ind_row=ind_row, ind_col=ind_col)
        sc = fun_scaling(sub) if callable(fun_scaling) else fun_scaling
        center, scale = np.asarray(sc["center"]), np.asarray(sc["scale"])
        n, m = sub.n, sub.m
        if want_mesh and hasattr(sub, "packed"):
            from bigsnpr_tpu.parallel.mesh import MeshOperator

            op = MeshOperator(sub, center, np.where(scale > 0, scale, 1.0))

    l0 = min(k + oversample, min(n, m))
    if (op is not None and hasattr(op, "power_dev")
            and (engine in ("device", "mesh-device")
                 or (on_tpu and engine == "auto"))):
        # on-chip Krylov: avoids per-depth host-link latency (the
        # dominant cost over a tunneled TPU)
        max_depth = max(2, min(max_iter, -(-min(n, m) // l0), 64))
        d, u, v, niter = _device_krylov(op, n, m, k, l0, tol, max_depth,
                                        seed, verbose)
        signs = np.sign(u[np.argmax(np.abs(u), axis=0), np.arange(k)])
        signs[signs == 0] = 1
        return BigSVD(d=d, u=u * signs, v=v * signs, center=center,
                      scale=scale, niter=niter)

    def cprod_fn(V):
        if op is not None:
            return op.cprod(V)
        return np.asarray(snp_cprodVec(sub, V, center, scale))

    def prod_fn(U):
        if op is not None:
            return op.prod(U)
        return np.asarray(snp_prodVec(sub, U, center, scale))

    def power_fn(Q):
        """(X̃ᵀQ, X̃X̃ᵀQ) — fused into one device program when available."""
        if op is not None and hasattr(op, "power"):
            return op.power(Q)
        B = cprod_fn(Q)
        return B, prod_fn(B)

    # Adaptive randomized block-Krylov (Musco & Musco 2015): grow the
    # Krylov basis K = [Q, (AAᵀ)Q, (AAᵀ)²Q, ...] in the sample space and
    # Rayleigh-Ritz on it — superlinear convergence in the number of
    # matvec passes (the reference's Lanczos-class solver equivalent).
    # Convergence is monitored through the small L×L Gram matrix
    # G = MᵀM (M = X̃ᵀK, maintained incrementally): its eigenvalues are
    # the squared Ritz values, so no O(L²·m) SVD is needed per depth —
    # u/v are recovered once, after convergence, from eigh(G).
    l = min(k + oversample, min(n, m))
    rng = np.random.default_rng(seed)
    Q = _orth(rng.standard_normal((n, l)))
    basis = [Q]
    B, Y = power_fn(Q)                               # fused X̃ᵀQ, X̃X̃ᵀQ
    Ms = [np.asarray(B, dtype=np.float64)]           # cprod blocks
    G = Ms[0].T @ Ms[0]                              # (L, L) Gram
    d_prev = np.zeros(k)
    niter = 0
    max_depth = max(2, min(max_iter, -(-min(n, m) // l)))
    d = None
    for it in range(max_depth):
        niter = it + 1
        L = G.shape[0]
        evals = np.linalg.eigvalsh(G)                 # ascending
        d_now = np.sqrt(np.maximum(evals[::-1][:k], 0.0))
        rel = np.max(np.abs(d_now - d_prev) / np.maximum(d_now, 1e-30))
        if verbose:
            print(f"  randomSVD depth {niter}: rel change {rel:.2e}")
        d = d_now
        if rel < tol or L >= min(n, m):
            break
        d_prev = d_now

        # Y = A Aᵀ Q_last (from the fused power step), (n, l)
        # orthogonalize against the existing basis (twice, for stability)
        for _ in range(2):
            for Bq in basis:
                Y = Y - Bq @ (Bq.T @ Y)
        # drop directions lost to the existing span (QR would otherwise
        # complete them with arbitrary vectors overlapping the basis) and
        # never exceed the space dimension
        norms = np.linalg.norm(Y, axis=0)
        keep = norms > 1e-8 * max(np.max(d), 1.0)
        room = min(n, m) - L
        cols = np.nonzero(keep)[0][:room]
        if len(cols) == 0:
            break
        Q, _ = np.linalg.qr(Y[:, cols])
        basis.append(Q)
        B, Y = power_fn(Q)
        B = np.asarray(B, dtype=np.float64)
        # grow G by the new block: [[G, MᵀB], [BᵀM, BᵀB]]
        C = np.concatenate([Mi.T @ B for Mi in Ms], axis=0)
        G = np.block([[G, C], [C.T, B.T @ B]])
        Ms.append(B)

    # Rayleigh-Ritz extraction (once): SVD of Mᵀ via eigh of G = MᵀM.
    evals, W = np.linalg.eigh(G)
    order = np.argsort(evals)[::-1][:k]
    d = np.sqrt(np.maximum(evals[order], 0.0))
    W = W[:, order]
    K = np.concatenate(basis, axis=1)
    M = np.concatenate(Ms, axis=1)
    u = K @ W
    v = (M @ W) / np.maximum(d, 1e-300)

    # sign convention: largest-|loading| coordinate of each u positive
    signs = np.sign(u[np.argmax(np.abs(u), axis=0), np.arange(k)])
    signs[signs == 0] = 1
    return BigSVD(d=d, u=u * signs, v=v * signs, center=center, scale=scale,
                  niter=niter)


def bed_randomSVD(pack, fun_scaling=bed_scaleBinom, ind_row=None,
                  ind_col=None, k=10, tol=1e-4, **kw) -> BigSVD:
    return snp_randomSVD(pack, fun_scaling=fun_scaling, ind_row=ind_row,
                         ind_col=ind_col, k=k, tol=tol, **kw)
