"""Windowed sparse LD correlation.

Reference semantics (src/corr.cpp:11-97, R/corr.R:3-57): for each variant
j0, scan left neighbors j with pos[j] >= pos[j0] - size; pairwise-complete
Pearson r with NA-aware sums; keep if |r| > max(t-test threshold THR[nona],
sqrt(thr_r2)) OR r is NaN; clamp to [-1, 1]; assemble an upper-triangular
sparse matrix.

TPU re-design: the per-pair O(n) scalar loop becomes a *banded blocked
GEMM*. For a block of B target variants and its left band of width W, the
six NA-aware pairwise sums are 6 of the 9 blocks of one stacked matmul

    [x*mx; x^2*mx; mx] @ [y*my; y^2*my; my]^T      (3B x s)(s x 3(B+W))

accumulated over sample chunks. Because hard-call dosages are small
integers, f32 MXU accumulation (precision=highest) is *exact* up to
2^24 — the final r is then computed in f64, giving bit-level parity with
the reference's double accumulation for n < 4M samples.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from bigsnpr_tpu.utils.assertions import check_args
import scipy.sparse as sp
from scipy import stats as scipy_stats

import bigsnpr_tpu.config as config
from bigsnpr_tpu.core.unpack import unpack_codes


@dataclass
class SparseLD:
    """Sparse symmetric LD matrix, stored upper-triangular CSC.

    The analog of the reference's dsCMatrix / SFBM pair
    (R/corr.R:43-47, bigsparser SFBM). `pos` (scaled positions used for
    windowing) is kept for banded-solver export.
    """

    upper: sp.csc_matrix  # upper triangle incl. diagonal
    pos: np.ndarray | None = None

    @property
    def shape(self):
        return self.upper.shape

    def sym(self) -> sp.csc_matrix:
        """Full symmetric matrix (diagonal counted once)."""
        u = self.upper
        d = sp.diags(u.diagonal())
        return (u + u.T - d).tocsc()

    def col_sums_sq(self, ind_sub=None) -> np.ndarray:
        """Per-column sum of squared entries over the full symmetric matrix,
        diagonal counted once (reference src/sp-colsumssq-sym.cpp:9-32,
        src/ld-scores-sfbm.cpp:10-69).

        Computed straight from the upper COO triplets with bincount —
        no symmetrize / squared-matrix materialization (those cost
        minutes at 1M variants / 470M nnz)."""
        u = self.upper.tocoo()
        i = np.asarray(u.row)
        j = np.asarray(u.col)
        w2 = np.square(np.asarray(u.data, dtype=np.float64))
        m = self.shape[0]
        if ind_sub is not None:
            ind_sub = np.asarray(ind_sub)
            if len(ind_sub) == m and np.array_equal(ind_sub, np.arange(m)):
                ind_sub = None      # full range: no subsetting needed
        if ind_sub is not None:
            posmap = np.full(m, -1, dtype=np.int64)
            posmap[ind_sub] = np.arange(len(ind_sub))
            i = posmap[i]
            j = posmap[j]
            keep = (i >= 0) & (j >= 0)
            i, j, w2 = i[keep], j[keep], w2[keep]
            m = len(ind_sub)
        # column c of the symmetric matrix sums upper entries ending at
        # c plus mirrored entries starting at c; the diagonal appears in
        # both bincounts, subtract it once
        out = np.bincount(j, w2, minlength=m) + np.bincount(i, w2,
                                                            minlength=m)
        diag = i == j
        if diag.any():
            out -= np.bincount(i[diag], w2[diag], minlength=m)
        return out

    def subset(self, ind) -> "SparseLD":
        ind = np.asarray(ind)
        u = self.sym()[ind][:, ind]
        return SparseLD(upper=sp.triu(u).tocsc(),
                        pos=None if self.pos is None else self.pos[ind])

    def to_dense(self) -> np.ndarray:
        return np.asarray(self.sym().todense())

    def save(self, path) -> str:
        """Persist to .npz (the analog of the reference's SFBM .sbk file)."""
        import pathlib

        path = pathlib.Path(path)
        if path.suffix != ".npz":
            path = path.with_suffix(".npz")
        u = self.upper
        np.savez_compressed(
            path, data=u.data, indices=u.indices, indptr=u.indptr,
            shape=np.asarray(u.shape),
            pos=(self.pos if self.pos is not None else np.array([])))
        return str(path)

    @staticmethod
    def load(path) -> "SparseLD":
        z = np.load(path)
        upper = sp.csc_matrix(
            (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"]))
        pos = z["pos"] if len(z["pos"]) else None
        return SparseLD(upper=upper, pos=pos)


# ---------------------------------------------------------------------------
# banded pairwise-complete sums kernel
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n", "precision"))
def _pair_sums_nona_compact(packed_t, packed_b, n, precision):
    """NA-free pair sums, compact form: (Sxy (B, Wb), st (B,), sst (B,),
    sb (Wb,), ssb (Wb,)) — one GEMM plane; per-variant sums replace the
    pairwise-complete planes (Np = n). Integer-exact: dosages {0,1,2}
    are exact in bf16 and the f32 accumulator is exact below 2^24."""
    B = packed_t.shape[0]
    Wb = packed_b.shape[0]
    nb = packed_t.shape[1]
    target = 32 * 1024 * 1024  # elements (see _pair_sums_block)
    cb_bytes = max(256, min(nb, target // max(1, 3 * (B + Wb) * 4)),
                   -(-nb // 16))
    nchunks = -(-nb // cb_bytes)
    pad = nchunks * cb_bytes - nb
    pt = jnp.pad(packed_t, ((0, 0), (0, pad)), constant_values=0b01010101)
    pb = jnp.pad(packed_b, ((0, 0), (0, pad)), constant_values=0b01010101)
    pt = pt.reshape(B, nchunks, cb_bytes).transpose(1, 0, 2)
    pb = pb.reshape(Wb, nchunks, cb_bytes).transpose(1, 0, 2)

    carry = (jnp.zeros((B, Wb), jnp.float32), jnp.zeros(B, jnp.float32),
             jnp.zeros(B, jnp.float32), jnp.zeros(Wb, jnp.float32),
             jnp.zeros(Wb, jnp.float32))
    for c in range(nchunks):   # unrolled: scan = serialized on the tunnel
        G, st, sst, sb, ssb = carry
        ct = unpack_codes(pt[c], cb_bytes * 4)
        cc = unpack_codes(pb[c], cb_bytes * 4)
        # NA decode still maps pad/NA bytes to 0 (tail pads are
        # NA-coded), so they drop out of every sum
        xt = (2 - ((ct + 1) >> 1)).astype(jnp.float32) * (ct != 1)
        xb = (2 - ((cc + 1) >> 1)).astype(jnp.float32) * (cc != 1)
        G = G + jnp.dot(xt.astype(jnp.bfloat16),
                        xb.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
        # per-variant sums are integers <= 4n < 2^24: exact in f32
        carry = (G, st + xt.sum(1), sst + (xt * xt).sum(1),
                 sb + xb.sum(1), ssb + (xb * xb).sum(1))
    return carry


@partial(jax.jit, static_argnames=("n", "precision", "nona"))
def _pair_sums_block(packed_t, packed_b, n, precision, nona=False):
    """Targets (B, nb) x band (Wb, nb) -> six (B, Wb) NA-aware pair sums.

    Returns (Sxy, Sx, Sy, Sxx, Syy, Npair) where e.g. Sx = sum of x over
    jointly-nonmissing samples (x = target dosage, y = band dosage).
    Samples are processed in byte chunks so the decoded planes stay
    ~100 MB regardless of cohort size (the reference streams samples the
    same way, one pass per pair, src/corr.cpp:58-75).

    nona=True (caller-verified NA-free pack): pairwise-complete sums
    collapse to per-variant stats + ONE cross plane, so the MXU does
    1 GEMM plane instead of the 3x3 Gram — 9x fewer cycles. Npair = n
    and Sx/Sxx broadcast per variant; identical integer sums.
    """
    B = packed_t.shape[0]
    Wb = packed_b.shape[0]
    nb = packed_t.shape[1]
    # chunk the byte axis: planes are 3*(B+Wb)*4*cb floats. The chunk
    # loop is unrolled (see below), so also clamp the chunk COUNT: at
    # biobank n the decoded planes grow instead (HBM-resident, fine)
    target = 32 * 1024 * 1024  # elements
    cb_bytes = max(256, min(nb, target // max(1, 3 * (B + Wb) * 4)),
                   -(-nb // 16))
    nchunks = -(-nb // cb_bytes)
    pad = nchunks * cb_bytes - nb
    # pad with NA bytes so chunk tails contribute nothing
    pt = jnp.pad(packed_t, ((0, 0), (0, pad)), constant_values=0b01010101)
    pb = jnp.pad(packed_b, ((0, 0), (0, pad)), constant_values=0b01010101)
    # the true last byte may hold zero pad bits (decode as dosage 2);
    # mask via n: only the first chunk-relative slice containing them
    # matters — handled by unpack's [:, :n] in the unchunked path, here we
    # rewrite the tail byte on host side instead (see snp_cor wrappers).
    pt = pt.reshape(B, nchunks, cb_bytes).transpose(1, 0, 2)
    pb = pb.reshape(Wb, nchunks, cb_bytes).transpose(1, 0, 2)

    def body(acc, pct, pcb):
        # the planes hold only {0, 1, 2, 4} — exact in bf16 — and the
        # f32 accumulator is exact up to 2^24 > 4n, so a SINGLE bf16 MXU
        # pass returns bit-identical integer sums at 1/6 the cycles of
        # precision=highest (`precision` is kept for the signature; the
        # single-pass path is exact regardless)
        ct = unpack_codes(pct, cb_bytes * 4)
        cc = unpack_codes(pcb, cb_bytes * 4)
        mt = (ct != 1).astype(jnp.float32)
        mb = (cc != 1).astype(jnp.float32)
        xt = (2 - ((ct + 1) >> 1)).astype(jnp.float32) * mt
        xb = (2 - ((cc + 1) >> 1)).astype(jnp.float32) * mb
        A = jnp.concatenate([xt, xt * xt, mt], axis=0)
        C = jnp.concatenate([xb, xb * xb, mb], axis=0)
        if 4 * n < 2**24:  # f32 accumulator exact up to 2^24 (n <= 4.1M)
            return acc + jnp.dot(A.astype(jnp.bfloat16),
                                 C.astype(jnp.bfloat16).T,
                                 preferred_element_type=jnp.float32)
        return acc + jnp.dot(A, C.T, preferred_element_type=jnp.float32,
                             precision=precision)

    if nona:
        Sxy, st, sst, sb, ssb = _pair_sums_nona_compact(
            packed_t, packed_b, n, precision)
        nf = jnp.full((B, Wb), float(n), jnp.float32)
        return (Sxy, jnp.broadcast_to(st[:, None], (B, Wb)),
                jnp.broadcast_to(sb[None, :], (B, Wb)),
                jnp.broadcast_to(sst[:, None], (B, Wb)),
                jnp.broadcast_to(ssb[None, :], (B, Wb)), nf)

    # unrolled chunk loop: a lax.scan lowers to an XLA while-loop, which
    # the tunnel-attached TPU runtime serializes (~0.5 s/iteration —
    # the round-3 '59 variants/s' snp_cor pathology was exactly this)
    G = jnp.zeros((3 * B, 3 * Wb), jnp.float32)
    for c in range(nchunks):
        G = body(G, pt[c], pb[c])
    Sxy = G[0:B, 0:Wb]
    Sx = G[0:B, 2 * Wb:3 * Wb]          # x against y-mask
    Sy = G[2 * B:3 * B, 0:Wb]           # x-mask against y
    Sxx = G[B:2 * B, 2 * Wb:3 * Wb]
    Syy = G[2 * B:3 * B, Wb:2 * Wb]
    Np = G[2 * B:3 * B, 2 * Wb:3 * Wb]
    return Sxy, Sx, Sy, Sxx, Syy, Np


# --- error-free f32 transforms (Dekker/Knuth). The pairwise sums are
# exact integers < 2^23-ish, so TwoProd/TwoSum recover the cancelled
# numerators exactly; only the final divide/sqrt rounds (~3e-7 on |r|<=1).
# XLA does not reassociate floats, so these are safe under jit.

def _two_prod(a, b):
    c = a * 4097.0  # Veltkamp split at 2^12+1 for f32
    a_hi = c - (c - a)
    a_lo = a - a_hi
    c = b * 4097.0
    b_hi = c - (c - b)
    b_lo = b - b_hi
    p = a * b
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _cancel_free(pa, ea, pb, eb):
    """(pa+ea) - (pb+eb) to f32 accuracy of the true value."""
    d, ed = _two_sum(pa, -pb)
    return d + (ed + (ea - eb))


@partial(jax.jit, static_argnames=("n", "precision", "nona"))
def _pair_r_device_block(packed_t, packed_b, t0, b0, left_start_t, THR,
                         thr_floor, n, precision, nona=False):
    """Device-finalized kept-r block: (B, Wb) f32 with 0 for dropped pairs
    (NaN r kept, as in the reference). ~12x less host traffic than
    shipping the six sum planes."""
    Sxy, Sx, Sy, Sxx, Syy, Np = _pair_sums_block(packed_t, packed_b, n,
                                                 precision, nona=nona)
    B, Wb = Sxy.shape
    num = _cancel_free(*_two_prod(Np, Sxy), *_two_prod(Sx, Sy))
    dx = _cancel_free(*_two_prod(Np, Sxx), *_two_prod(Sx, Sx))
    dy = _cancel_free(*_two_prod(Np, Syy), *_two_prod(Sy, Sy))
    r = num / jnp.sqrt(dx * dy)

    jj0 = t0 + jax.lax.broadcasted_iota(jnp.int32, (B, Wb), 0)
    jj = b0 + jax.lax.broadcasted_iota(jnp.int32, (B, Wb), 1)
    in_window = (jj < jj0) & (jj >= left_start_t[:, None])

    nona = jnp.clip(Np.astype(jnp.int32), 1, n)
    pair_thr = jnp.maximum(THR[nona - 1], thr_floor)
    keep = in_window & (jnp.isnan(r) | (jnp.abs(r) > pair_thr))
    return jnp.where(keep, jnp.clip(r, -1.0, 1.0), 0.0)


@partial(jax.jit, static_argnames=("n", "cap", "precision", "nona"))
def _pair_r_compact_block(packed_t, packed_b, t0, b0, left_start_t, THR,
                          thr_floor, n, cap, precision, nona=False):
    """Device-compacted kept-r block: (count, lin_idx (cap,), r (cap,)).

    Two-level reduction of host traffic vs the dense kept-r plane: the
    keep mask is turned into a cumsum-scatter compaction ON DEVICE, so
    only ~nnz values + linear indices cross the host link (~40x less for
    typical LD sparsity). lin_idx = ii*Wb + kk into the (B, Wb) block;
    slots beyond count are -1. If count > cap the caller must retry with
    a larger cap (values past cap were dropped)."""
    r_kept = _pair_r_device_block(packed_t, packed_b, t0, b0, left_start_t,
                                  THR, thr_floor, n, precision, nona=nona)
    flat = r_kept.ravel()
    keepf = flat != 0.0                     # kept NaNs compare != 0 too
    pos_k = jnp.cumsum(keepf) - 1
    scatter_idx = jnp.where(keepf, pos_k, cap).astype(jnp.int32)
    vals = jnp.zeros(cap, jnp.float32).at[scatter_idx].set(flat, mode="drop")
    lin = jax.lax.iota(jnp.int32, flat.shape[0])
    idxs = jnp.full(cap, -1, jnp.int32).at[scatter_idx].set(lin, mode="drop")
    count = keepf.sum().astype(jnp.int32)
    # single (1+2cap,) int32 bundle -> exactly one host transfer per block
    return jnp.concatenate([count[None], idxs,
                            jax.lax.bitcast_convert_type(vals, jnp.int32)])


@partial(jax.jit, static_argnames=("precision",))
def _pair_sums_block_bytes(codes_t, codes_b, table, precision):
    """Dosage-pack variant of _pair_sums_block: byte codes + 256-table.

    Dosage values are not small integers, so the f32 sums carry ~1e-6
    relative GEMM error (precision=highest) instead of being exact —
    tolerance-grade, like any dosage-based LD."""
    xt_d = jnp.take(table, codes_t.astype(jnp.int32))
    xb_d = jnp.take(table, codes_b.astype(jnp.int32))
    mt = (~jnp.isnan(xt_d)).astype(jnp.float32)
    mb = (~jnp.isnan(xb_d)).astype(jnp.float32)
    xt = jnp.where(jnp.isnan(xt_d), 0.0, xt_d)
    xb = jnp.where(jnp.isnan(xb_d), 0.0, xb_d)

    A = jnp.concatenate([xt, xt * xt, mt], axis=0)
    C = jnp.concatenate([xb, xb * xb, mb], axis=0)
    G = jnp.dot(A, C.T, preferred_element_type=jnp.float32,
                precision=precision)
    B = codes_t.shape[0]
    Wb = codes_b.shape[0]
    Sxy = G[0:B, 0:Wb]
    Sx = G[0:B, 2 * Wb:3 * Wb]
    Sy = G[2 * B:3 * B, 0:Wb]
    Sxx = G[B:2 * B, 2 * Wb:3 * Wb]
    Syy = G[2 * B:3 * B, Wb:2 * Wb]
    Np = G[2 * B:3 * B, 2 * Wb:3 * Wb]
    return Sxy, Sx, Sy, Sxx, Syy, Np


def _na_pad_tail(packed: np.ndarray, n: int) -> np.ndarray:
    """Rewrite the pad bits of the last partial byte to NA codes (PLINK
    zero-pads, which would decode as dosage 2 in chunked kernels)."""
    rem = n % 4
    if rem == 0:
        return np.asarray(packed)
    out = np.array(packed, copy=True)
    keep = (1 << (2 * rem)) - 1
    na_fill = sum(0b01 << (2 * k) for k in range(rem, 4))
    out[:, -1] = (out[:, -1] & keep) | na_fill
    return out


def _device_packed_nafixed(pack):
    """Device copy of the packed bytes with NA-coded tail pad bits,
    REUSING the pack's cached device copy (the tunnel uploads at
    ~20 MB/s — round-5 measurement; re-shipping a GB-scale pack per
    snp_cor/clumping call costs a minute). The tail fix is a tiny
    device op on the last byte column; when n % 4 != 0 it makes one
    extra on-device copy of the pack."""
    cache = getattr(pack, "_device_pad_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(pack, "_device_pad_cache", cache)
        except AttributeError:
            cache = None
    if cache is not None and "nafix" in cache:
        return cache["nafix"]
    dev = (pack.device_packed() if hasattr(pack, "device_packed")
           else jnp.asarray(np.asarray(pack.packed)))
    rem = pack.n % 4
    if rem:
        keep = (1 << (2 * rem)) - 1
        na_fill = sum(0b01 << (2 * k) for k in range(rem, 4))
        dev = dev.at[:, -1].set((dev[:, -1] & keep) | na_fill)
    if cache is not None:
        cache["nafix"] = dev
    return dev


def _iter_band_blocks(packed, n, m, left_start, block, code256=None,
                      pack=None):
    """Yield (t0, t1, b0, sums) per target block; band cols [b0, t1).

    `packed` is (m, nb) 2-bit bytes, or (m, n) byte codes when a
    `code256` decode table is given (DosagePack). Pass `pack` (the
    owning GenoPack) to reuse its cached device copy instead of
    re-uploading through the ~20 MB/s tunnel."""
    nona = False
    if pack is not None and code256 is None:
        dev_packed = _device_packed_nafixed(pack)
        nona = _pack_is_nona(pack, packed, n)
    else:
        if code256 is None:
            packed = _na_pad_tail(np.asarray(packed), n)
        dev_packed = jnp.asarray(np.asarray(packed))
    table = (None if code256 is None
             else jnp.asarray(code256, dtype=jnp.float32))
    for t0 in range(0, m, block):
        t1 = min(t0 + block, m)
        b0 = int(left_start[t0:t1].min())
        if nona:
            # NA-free: fetch ONE (B, Wb) plane + four per-variant
            # vectors instead of six dense planes (6x less link
            # traffic, 9x fewer MXU cycles); broadcast views keep
            # _pair_r's f64 arithmetic exact and shape-compatible
            Sxy, st, sst, sb, ssb = (
                np.asarray(s, dtype=np.float64)
                for s in _pair_sums_nona_compact(
                    dev_packed[t0:t1], dev_packed[b0:t1], n,
                    config.matmul_precision))
            yield t0, t1, b0, (Sxy, st[:, None], sb[None, :],
                               sst[:, None], ssb[None, :], np.float64(n))
            continue
        if code256 is None:
            sums = _pair_sums_block(
                dev_packed[t0:t1], dev_packed[b0:t1], n,
                config.matmul_precision)
        else:
            sums = _pair_sums_block_bytes(
                dev_packed[t0:t1], dev_packed[b0:t1], table,
                config.matmul_precision)
        yield t0, t1, b0, tuple(np.asarray(s, dtype=np.float64) for s in sums)


_BAND_CHUNK_OVERRIDE = None  # tests set this to force band chunking


def _pack_is_nona(pack, packed, n):
    """True when the pack holds no NA codes (imputed data) — cached on
    the pack. NA byte-code 0b01 is detected per 2-bit field with
    b & ~(b >> 1) & 0x55; real-sample bits only in the tail byte."""
    if pack is not None:
        flag = getattr(pack, "_nona_flag", None)
        if flag is not None:
            return flag
    pb = np.asarray(packed)
    rem = n % 4
    body = pb if not rem else pb[:, :-1]
    flag = True
    flat = body.reshape(-1)
    step = 64 << 20
    for o in range(0, flat.size, step):
        ch = flat[o:o + step]
        if np.any(ch & ~(ch >> 1) & 0x55):
            flag = False
            break
    if flag and rem:
        last = pb[:, -1] & np.uint8((1 << (2 * rem)) - 1)
        flag = not bool(np.any(last & ~(last >> 1) & 0x55))
    if pack is not None:
        try:
            object.__setattr__(pack, "_nona_flag", flag)
        except AttributeError:
            pass
    return flag


def _iter_kept_pairs_device(packed, n, m, left_start, THR, thr_floor,
                            block=512, pack=None):
    """Device-compacted kept pairs: yields (j, i, r) arrays per target
    block (j = target/right member, i = left neighbor). Only ~nnz values
    cross the host link — the at-scale path for snp_cor and clumping
    (the host-finalize path ships six dense f64 sum planes per block:
    ~50 bytes/pair, which is tunnel-bound at millions of variants).
    Pass `pack` to reuse its cached device copy (no re-upload)."""
    from collections import deque

    # HBM-resident when it fits comfortably; otherwise stream the
    # target+band byte rows per block (bands overlap, so streamed
    # upload is < 2x the matrix — the at-scale path).
    resident = np.asarray(packed).nbytes <= 4 * 2**30
    packed_h = None
    dev_packed = None
    if resident and pack is not None:
        dev_packed = _device_packed_nafixed(pack)
    else:
        packed_h = _na_pad_tail(np.asarray(packed), n)
        if resident:
            dev_packed = jnp.asarray(packed_h)
    THR_d = jnp.asarray(np.nan_to_num(THR, nan=np.inf), dtype=jnp.float32)
    cap = 1 << 14
    # NA-free packs (imputed data): 1 GEMM plane instead of the 3x3
    # Gram — 9x fewer MXU cycles on the dominant stage
    nona = _pack_is_nona(pack, packed, n)

    # wide windows (e.g. SCT's base_size/thr.r2 grid can span a whole
    # chromosome) make the band operand huge: the decoded pair-sum
    # planes cost ~100 bytes per (row, packed-byte) element across the
    # f32 planes + bf16 MXU copies, which OOMs HBM when the band is
    # tens of thousands of variants at biobank n. Chunk the band axis
    # so each launch stays under ~1.5 GB of decoded planes; pair sums
    # don't accumulate across band columns, so chunks are independent
    # launches with global (t0, c0) index offsets.
    nb = (n + 3) // 4
    cb_est = max(256, min(nb, (32 << 20) // max(1, 12 * 2 * block)),
                 -(-nb // 16))
    wc = int((1536 << 20) // ((40 if nona else 100) * cb_est)) - block
    wc = max(block, min(1 << 30, wc) // block * block)
    if _BAND_CHUNK_OVERRIDE is not None:        # tests force chunking
        wc = int(_BAND_CHUNK_OVERRIDE)

    def launch(t0, c0, c1, cap):
        t1 = min(t0 + block, m)
        # c0 < 0 (first chunk of a quantized band): pad NA rows on top
        # so EVERY chunk is exactly wc wide — one jit shape for the
        # whole sweep. Server-side XLA compiles over the tunnel cost
        # ~15 s per distinct shape; a per-block partial-chunk width
        # cost the round-5 SCT clumping run ~600 s of pure compiles.
        # Padded rows are all-NA (zero sums -> NaN r) AND carry global
        # indices < 0, which the in-window mask drops.
        if resident:
            pt = dev_packed[t0:t1]
            pb = dev_packed[max(0, c0):c1]
        elif c0 <= t0 and c1 == t1:
            pb = jnp.asarray(packed_h[max(0, c0):c1])
            pt = pb[t0 - max(0, c0):]
        else:
            pb = jnp.asarray(packed_h[max(0, c0):c1])
            pt = jnp.asarray(packed_h[t0:t1])
        if c0 < 0:
            na = jnp.full((-c0, pb.shape[1]), 0b01010101, jnp.uint8)
            pb = jnp.concatenate([na, pb])
        ls_d = jnp.asarray(left_start[t0:t1], dtype=jnp.int32)
        buf = _pair_r_compact_block(
            pt, pb, jnp.int32(t0), jnp.int32(c0), ls_d,
            THR_d, jnp.float32(thr_floor), n, cap,
            config.matmul_precision, nona=nona)
        return (t0, c0, c1 - c0, cap, buf)

    def chunks_for(t0):
        t1 = min(t0 + block, m)
        b0 = int(left_start[t0:t1].min())
        if t1 - b0 <= wc:
            # quantize width up to a block multiple: ragged window
            # geometry otherwise compiles one program per target block
            wq = -(-(t1 - b0) // block) * block
            return [(t0, t1 - wq, t1)]
        # every chunk exactly wc wide (first origin may go negative:
        # launch() pads NA rows) -> a single jit shape across blocks
        nch = -(-(t1 - b0) // wc)
        b0q = t1 - nch * wc
        return [(t0, b0q + k * wc, b0q + (k + 1) * wc)
                for k in range(nch)]

    # pipeline a few blocks of device work ahead of each host fetch —
    # a synchronous fetch per block makes the loop tunnel-latency-bound
    depth = 4
    pending = deque()
    work = deque(c for t0 in range(0, m, block) for c in chunks_for(t0))
    while pending or work:
        while work and len(pending) < depth:
            t0, c0, c1 = work.popleft()
            pending.append(launch(t0, c0, c1, cap))
        t0, c0, Wb, cap_b, buf_d = pending.popleft()
        buf = np.asarray(buf_d)
        cnt = int(buf[0])
        while cnt > cap_b:
            cap = 1 << (cnt - 1).bit_length()   # grow (monotone) & retry
            _, _, _, cap_b, buf_d = launch(t0, c0, c0 + Wb, cap)
            buf = np.asarray(buf_d)
            cnt = int(buf[0])
        if cnt:
            idxs = buf[1:1 + cnt]
            vals = buf[1 + cap_b:1 + cap_b + cnt].view(np.float32)
            ii, kk = np.divmod(idxs, Wb)
            yield t0 + ii, c0 + kk, vals


def _pair_r(sums):
    """f64 pairwise-complete Pearson r from the six sums (may be NaN)."""
    Sxy, Sx, Sy, Sxx, Syy, Np = sums
    with np.errstate(divide="ignore", invalid="ignore"):
        num = Sxy - Sx * Sy / Np
        dx = Sxx - Sx * Sx / Np
        dy = Syy - Sy * Sy / Np
        return num / np.sqrt(dx * dy), Np


def _window_geometry(pos, size):
    """left_start[j] = first index i with pos[i] >= pos[j] - size."""
    pos = np.asarray(pos, dtype=np.float64)
    left_start = np.searchsorted(pos, pos - size, side="left")
    return left_start


def cor_thresholds(n, alpha):
    """THR[nona] for nona = 1..n: t-test threshold on |r| at type-I alpha
    (reference R/corr.R:17-23). THR[0] unused; NaN where df <= 0."""
    df = np.arange(1, n + 1, dtype=np.float64) - 2
    with np.errstate(invalid="ignore"):
        q = scipy_stats.t.isf(alpha / 2, df)
    q[df <= 0] = np.nan
    with np.errstate(invalid="ignore"):
        thr = q / np.sqrt(df + q**2)
    # alpha = 1 -> q = 0 -> thr = 0 (keep all), as in the reference
    return thr


@check_args()
def snp_cor(
    pack,
    ind_row=None,
    ind_col=None,
    size: float = 500,
    alpha: float = 1.0,
    thr_r2: float = 0.0,
    fill_diag: bool = True,
    infos_pos=None,
    block: int = 512,
    finalize: str = "host",
) -> SparseLD:
    """Windowed sparse correlation matrix (reference snp_cor, R/corr.R:95-110).

    size: window in #SNPs if infos_pos is None, else in kb (multiplied by
    1000 internally, so pass cM/1000-style values for genetic distance —
    same contract as the reference).

    finalize: "host" computes r in f64 on host from the exact integer
    sums (bit-level parity); "device" finalizes on device with
    error-free f32 transforms (~3e-7 absolute on r, 12x less host
    traffic — the at-scale path).
    """
    sub = pack
    if ind_col is not None or ind_row is not None:
        sub = pack.subset(ind_row=ind_row, ind_col=ind_col)
    n, m = sub.n, sub.m

    if infos_pos is None:
        pos = 1000.0 * np.arange(1, m + 1)
    else:
        pos = np.asarray(infos_pos, dtype=np.float64)
        assert len(pos) == m, "infos_pos length mismatch"
        assert np.all(np.diff(pos) >= 0), "positions must be sorted"
    size_scaled = size * 1000.0

    left_start = _window_geometry(pos, size_scaled)
    THR = cor_thresholds(n, alpha)
    thr_floor = np.sqrt(thr_r2)

    is_dosage = hasattr(sub, "code256")
    data = sub.codes if is_dosage else sub.packed
    code256 = sub.code256 if is_dosage else None
    if finalize == "device" and is_dosage:
        finalize = "host"  # device EFT finalize assumes integer hard-call sums

    cols_i, cols_j, cols_x = [], [], []
    if finalize == "device":
        for jj, ii, vals in _iter_kept_pairs_device(
                np.asarray(sub.packed), n, m, left_start, THR, thr_floor,
                block, pack=sub):
            cols_j.append(jj)
            cols_i.append(ii)
            cols_x.append(vals.astype(np.float64))
    else:
        for t0, t1, b0, sums in _iter_band_blocks(
                data, n, m, left_start, block, code256=code256,
                pack=None if is_dosage else sub):
            r, Np = _pair_r(sums)
            B, Wb = r.shape
            jj0 = np.arange(t0, t1)[:, None]    # target (column of output)
            jj = np.arange(b0, t1)[None, :]     # neighbor (row of output)
            in_window = (jj < jj0) & (jj >= left_start[jj0])
            nona = np.clip(Np.astype(np.int64), 1, n)
            with np.errstate(invalid="ignore"):
                pair_thr = np.maximum(THR[nona - 1], thr_floor)
                keep = in_window & (np.isnan(r) | (np.abs(r) > pair_thr))
            ii, kk = np.nonzero(keep)
            if ii.size:
                vals = np.clip(r[ii, kk], -1.0, 1.0)
                cols_j.append(jj0[ii, 0])
                cols_i.append(jj[0, kk])
                cols_x.append(vals)

    if fill_diag:
        cols_i.append(np.arange(m))
        cols_j.append(np.arange(m))
        cols_x.append(np.ones(m))

    if cols_i:
        i = np.concatenate(cols_i)
        j = np.concatenate(cols_j)
        x = np.concatenate(cols_x)
    else:
        i = j = np.array([], dtype=np.int64)
        x = np.array([])
    upper = sp.csc_matrix((x, (i, j)), shape=(m, m))
    if np.isnan(upper.data).any():
        import warnings

        warnings.warn("NA or NaN values in the resulting correlation matrix.")
    return SparseLD(upper=upper, pos=pos)


bed_cor = snp_cor
