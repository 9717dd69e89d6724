"""Standardized genotype mat-vec / mat-mat pair.

The {center, scale, X·v, Xᵀ·v} contract that SVD/PCA/PRS consume
(reference R/autoSVD.R:205-219 shows the plug-in surface; hot loops
src/bed-prod-vec.cpp:15-97). TPU design: stream variant blocks, decode
2-bit codes to standardized f32 in VMEM-sized chunks, feed the MXU,
accumulate in f32. NA -> 0 after centering == built-in mean imputation
(reference src/bed-acc.h:86-115).

Conventions (match the reference's G orientation, samples x variants):
  prodVec : X (n x m) @ u (m[, l]) -> (n[, l])
  cprodVec: Xᵀ     @ v (n[, l]) -> (m[, l])
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bigsnpr_tpu.config as config
from bigsnpr_tpu.core.unpack import unpack_standardized
from bigsnpr_tpu.ops.blocks import pick_block, pad_rows


@partial(jax.jit, static_argnames=("n", "block", "precision"))
def _cprod_blocked(packed, V, center, scale, n, block, precision):
    """(m_pad, nb) packed, V (n, l) -> (m_pad, l) = X̃ᵀ V."""
    m_pad, nb = packed.shape
    blocks = packed.reshape(m_pad // block, block, nb)
    c = center.reshape(-1, block)
    s = scale.reshape(-1, block)

    def body(args):
        pb, cb, sb = args
        xt = unpack_standardized(pb, n, cb, sb)  # (block, n)
        return jnp.dot(xt, V, preferred_element_type=jnp.float32,
                       precision=precision)

    out = jax.lax.map(body, (blocks, c, s))  # (nbB, block, l)
    return out.reshape(m_pad, -1)


@partial(jax.jit, static_argnames=("n", "block", "precision"))
def _prod_blocked(packed, U, center, scale, n, block, precision):
    """(m_pad, nb) packed, U (m_pad, l) -> (n, l) = X̃ U."""
    m_pad, nb = packed.shape
    nblocks = m_pad // block
    blocks = packed.reshape(nblocks, block, nb)
    c = center.reshape(nblocks, block)
    s = scale.reshape(nblocks, block)
    Ub = U.reshape(nblocks, block, -1)

    def body(acc, args):
        pb, cb, sb, ub = args
        xt = unpack_standardized(pb, n, cb, sb)  # (block, n)
        acc = acc + jnp.dot(xt.T, ub, preferred_element_type=jnp.float32,
                            precision=precision)
        return acc, None

    acc0 = jnp.zeros((n, U.shape[-1]), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (blocks, c, s, Ub))
    return acc


@partial(jax.jit, static_argnames=("block", "precision"))
def _cprod_bytes_blocked(codes, table, V, center, scale, block, precision):
    """(m_pad, n) byte codes + 256-table -> X̃ᵀ V (code256 decode, NA->0)."""
    m_pad, n = codes.shape
    blocks = codes.reshape(m_pad // block, block, n)
    c = center.reshape(-1, block)
    s = scale.reshape(-1, block)

    def body(args):
        cb_codes, cb, sb = args
        d = jnp.take(table, cb_codes.astype(jnp.int32))
        xt = (d - cb[:, None]) / sb[:, None]
        xt = jnp.where(jnp.isnan(d), 0.0, xt)
        return jnp.dot(xt, V, preferred_element_type=jnp.float32,
                       precision=precision)

    out = jax.lax.map(body, (blocks, c, s))
    return out.reshape(m_pad, -1)


@partial(jax.jit, static_argnames=("block", "precision"))
def _prod_bytes_blocked(codes, table, U, center, scale, block, precision):
    m_pad, n = codes.shape
    nblocks = m_pad // block
    blocks = codes.reshape(nblocks, block, n)
    c = center.reshape(nblocks, block)
    s = scale.reshape(nblocks, block)
    Ub = U.reshape(nblocks, block, -1)

    def body(acc, args):
        cb_codes, cb, sb, ub = args
        d = jnp.take(table, cb_codes.astype(jnp.int32))
        xt = (d - cb[:, None]) / sb[:, None]
        xt = jnp.where(jnp.isnan(d), 0.0, xt)
        return acc + jnp.dot(xt.T, ub, preferred_element_type=jnp.float32,
                             precision=precision), None

    acc, _ = jax.lax.scan(body, jnp.zeros((n, U.shape[-1]), jnp.float32),
                          (blocks, c, s, Ub))
    return acc


@partial(jax.jit, static_argnames=("n", "block", "precision"))
def _xla_cprod_sub(packed, c, s, V, row_idx, col_idx, n, block, precision):
    Vf = jnp.zeros((n, V.shape[1]), jnp.float32).at[row_idx].set(V)
    out = _cprod_blocked(packed, Vf, c, s, n, block, precision)
    return out[col_idx]


@partial(jax.jit, static_argnames=("n", "block", "precision"))
def _xla_prod_sub(packed, c, s, U, row_idx, col_idx, n, block, precision):
    m_pad = packed.shape[0]
    Uf = jnp.zeros((m_pad, U.shape[1]), jnp.float32).at[col_idx].set(U)
    out = _prod_blocked(packed, Uf, c, s, n, block, precision)
    return out[row_idx]


@partial(jax.jit, static_argnames=("n", "block", "precision"))
def _xla_power_sub(packed, c, s, V, row_idx, col_idx, n, block, precision):
    Vf = jnp.zeros((n, V.shape[1]), jnp.float32).at[row_idx].set(V)
    B = _cprod_blocked(packed, Vf, c, s, n, block, precision)  # (m_pad, l)
    Bm = jnp.zeros_like(B).at[col_idx].set(B[col_idx])
    Y = _prod_blocked(packed, Bm, c, s, n, block, precision)
    return B[col_idx], Y[row_idx]


class XlaOperator:
    """Device-resident standardized genotype operator on the XLA blocked
    decode->GEMM path — same surface as PallasOperator {cprod, prod,
    power} with optional ind_row/ind_col masking done by on-device
    scatter/gather (no host repacking between iterative calls).

    Works on any backend (CPU/TPU); the Pallas twin is TPU-only.
    """

    def __init__(self, pack, center, scale, ind_row=None, ind_col=None,
                 block=None):
        n_full = pack.n
        m_full = pack.m
        self.block = block or pick_block(n_full)
        self.packed = pack.device_packed_padded(self.block)
        m_pad = self.packed.shape[0]
        center = np.asarray(center, dtype=np.float64)
        scale = np.asarray(scale, dtype=np.float64)
        good = scale > 0
        c = np.zeros(m_pad, dtype=np.float32)
        s = np.ones(m_pad, dtype=np.float32)
        c[:m_full] = np.where(good, center, 0.0)
        s[:m_full] = np.where(good, scale, 1.0)
        self.c, self.s = jnp.asarray(c), jnp.asarray(s)
        self.n_full = n_full
        rows = np.arange(n_full) if ind_row is None else np.asarray(ind_row)
        cols = np.arange(m_full) if ind_col is None else np.asarray(ind_col)
        self.n, self.m = len(rows), len(cols)
        self.row_idx = jnp.asarray(rows, dtype=jnp.int32)
        self.col_idx = jnp.asarray(cols, dtype=jnp.int32)

    @staticmethod
    def _as_2d(arr):
        arr = jnp.asarray(arr, dtype=jnp.float32)
        squeeze = arr.ndim == 1
        return (arr[:, None] if squeeze else arr), squeeze

    def cprod(self, V):
        V, squeeze = self._as_2d(V)
        out = np.asarray(_xla_cprod_sub(
            self.packed, self.c, self.s, V, self.row_idx, self.col_idx,
            self.n_full, self.block, config.matmul_precision))
        return out[:, 0] if squeeze else out

    def prod(self, U):
        U, squeeze = self._as_2d(U)
        out = np.asarray(_xla_prod_sub(
            self.packed, self.c, self.s, U, self.row_idx, self.col_idx,
            self.n_full, self.block, config.matmul_precision))
        return out[:, 0] if squeeze else out

    def power(self, V):
        B, Y = self.power_dev(self._as_2d(V)[0])
        return np.asarray(B), np.asarray(Y)

    def power_dev(self, V):
        """Device-resident power step (no host transfer)."""
        return _xla_power_sub(
            self.packed, self.c, self.s, V, self.row_idx, self.col_idx,
            self.n_full, self.block, config.matmul_precision)


def _is_dosage(pack):
    return hasattr(pack, "code256")


def _prep(pack, center, scale, block):
    n = pack.n
    m = pack.m
    block = block or pick_block(n)
    center = np.zeros(m) if center is None else np.asarray(center, dtype=np.float64)
    scale = np.ones(m) if scale is None else np.asarray(scale, dtype=np.float64)
    # device-resident padded bytes, uploaded once per (pack, block)
    packed = (pack.device_packed_padded(block)
              if hasattr(pack, "device_packed_padded")
              else pad_rows(np.asarray(pack.packed), block)[0])
    c, _ = pad_rows(center.astype(np.float32), block, fill=0)
    s, _ = pad_rows(scale.astype(np.float32), block, fill=1)
    return packed, c, s, n, m, block


def snp_cprodVec(pack, v, center=None, scale=None, block=None):
    """X̃ᵀ v: per-variant scaled dot products (reference bed_cprodVec,
    R/bed-mult-vec.R:50-75 / src/bed-prod-vec.cpp:59-97)."""
    v = jnp.asarray(v, dtype=jnp.float32)
    if v.shape[0] != pack.n:
        raise ValueError(f"cprodVec: vector length {v.shape[0]} != "
                         f"n_samples {pack.n}")
    squeeze = v.ndim == 1
    V = v[:, None] if squeeze else v
    if _is_dosage(pack):
        m = pack.m
        block = block or pick_block(pack.n)
        codes = pack.device_codes_padded(block)
        c = np.zeros(m) if center is None else np.asarray(center, np.float64)
        s = np.ones(m) if scale is None else np.asarray(scale, np.float64)
        cp, _ = pad_rows(c.astype(np.float32), block, fill=0)
        sp_, _ = pad_rows(s.astype(np.float32), block, fill=1)
        out = _cprod_bytes_blocked(
            codes, jnp.asarray(pack.code256, dtype=jnp.float32),
            V, jnp.asarray(cp), jnp.asarray(sp_), block,
            config.matmul_precision)
        out = out[:m]
        return out[:, 0] if squeeze else out
    packed, c, s, n, m, block = _prep(pack, center, scale, block)
    out = _cprod_blocked(jnp.asarray(packed), V, jnp.asarray(c), jnp.asarray(s),
                         n, block, config.matmul_precision)
    out = out[:m]
    return out[:, 0] if squeeze else out


def snp_prodVec(pack, u, center=None, scale=None, block=None):
    """X̃ u: per-sample scores (reference bed_prodVec,
    R/bed-mult-vec.R:20-49 / src/bed-prod-vec.cpp:15-51)."""
    u = jnp.asarray(u, dtype=jnp.float32)
    if u.shape[0] != pack.m:
        raise ValueError(f"prodVec: vector length {u.shape[0]} != "
                         f"m_variants {pack.m}")
    squeeze = u.ndim == 1
    U = u[:, None] if squeeze else u
    if _is_dosage(pack):
        m = pack.m
        block = block or pick_block(pack.n)
        codes = pack.device_codes_padded(block)
        c = np.zeros(m) if center is None else np.asarray(center, np.float64)
        s = np.ones(m) if scale is None else np.asarray(scale, np.float64)
        cp, _ = pad_rows(c.astype(np.float32), block, fill=0)
        sp_, _ = pad_rows(s.astype(np.float32), block, fill=1)
        U_pad, _ = pad_rows(np.asarray(U), block, fill=0)
        out = _prod_bytes_blocked(
            codes, jnp.asarray(pack.code256, dtype=jnp.float32),
            jnp.asarray(U_pad), jnp.asarray(cp), jnp.asarray(sp_), block,
            config.matmul_precision)
        return out[:, 0] if squeeze else out
    packed, c, s, n, m, block = _prep(pack, center, scale, block)
    U_pad, _ = pad_rows(U, block, fill=0)
    out = _prod_blocked(jnp.asarray(packed), U_pad, jnp.asarray(c), jnp.asarray(s),
                        n, block, config.matmul_precision)
    return out[:, 0] if squeeze else out


bed_prodVec = snp_prodVec
bed_cprodVec = snp_cprodVec
