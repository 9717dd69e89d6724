"""Pallas TPU kernels: fused 2-bit decode + standardized GEMM.

The XLA path materializes the decoded f32 matrix to HBM between the
decode and the matmul (16x the packed bytes, written once and read once
per op). These kernels decode inside VMEM tiles and feed the MXU
directly, so each matvec pass reads only the packed bytes.

Sample-order trick: a byte holds samples {4b, 4b+1, 4b+2, 4b+3}; lane-
interleaving them in-kernel is expensive, so the kernels compute in a
*bit-plane permuted* sample order (all samples = 0 mod 4 of the tile,
then 1 mod 4, ...) and the host permutes Q/V rows to match — valid
because matvec contracts over samples. `sample_perm(n_pad)` gives the
permutation.

Layout per sample-tile of 512 samples: packed bytes tile (TM, 128);
decode yields 4 planes (TM, 128) concatenated -> (TM, 512).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TM = 256          # variant-tile rows
TNB = 128         # byte-tile lanes (= 512 samples)
TN = 4 * TNB

SCOPED_VMEM_KIB = 65536


def _trace_state_clean() -> bool:
    try:
        from jax._src import core as _core
        return bool(_core.trace_state_clean())
    except Exception:
        return True


def tpu_jit(fun=None, **jit_kwargs):
    """jax.jit raising the TPU scoped-VMEM budget (plain jit on CPU).

    XLA pins small pallas-call outputs (f32[2l, m]) into scoped VMEM;
    at m~131K the default 16 MB budget overflows AT COMPILE TIME
    (BENCH_r03/r04 tails: "exceeded scoped vmem limit by 1.30M").
    v5e has 128 MB VMEM/core, so a 64 MB scoped budget is safe for
    these kernels. CPU compiles reject TPU flags, so the option set is
    picked per call by backend."""
    if fun is None:
        return partial(tpu_jit, **jit_kwargs)
    cpu = jax.jit(fun, **jit_kwargs)
    tpu = jax.jit(fun, compiler_options={
        "xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)},
        **jit_kwargs)

    def wrapper(*a, **k):
        # under an outer trace, compiler_options is rejected on nested
        # jits — use the plain jit (it inlines; the OUTER jit's options
        # govern). Ask the trace machinery directly: a call whose args
        # are all concrete closure constants still nests if an outer
        # trace is active (tracer-in-args missed that case).
        if not _trace_state_clean():
            return cpu(*a, **k)
        return (tpu if jax.default_backend() == "tpu" else cpu)(*a, **k)

    wrapper.__wrapped__ = fun
    return wrapper


def sample_perm(n_pad: int, tnb: int = TNB) -> np.ndarray:
    """Permutation p with kernel-sample k == true-sample p[k].

    tnb = byte-tile lanes (the kernels' sample tile is 4*tnb samples);
    the bit-plane order depends on it, so operators must build Q/V
    permutations with the same tnb they pass to the kernels."""
    tn = 4 * tnb
    assert n_pad % tn == 0
    tiles = n_pad // tn
    base = np.arange(tnb)
    perm = []
    for t in range(tiles):
        for k in range(4):
            perm.append(tn * t + 4 * base + k)
    return np.concatenate(perm)


def _decode_tile(pb, c_row, s_row):
    """(TM, TNB) uint8 + per-variant center/scale (TM, 1) -> (TM, TN) f32
    standardized, NA -> 0, in bit-plane order."""
    pb32 = pb.astype(jnp.int32)
    planes = []
    for k in range(4):
        g = (pb32 >> (2 * k)) & 3
        na = g == 1
        d = (2 - ((g + 1) >> 1)).astype(jnp.float32)
        xt = (d - c_row) * s_row
        planes.append(jnp.where(na, 0.0, xt))
    return jnp.concatenate(planes, axis=1)


def _decode_int_planes(pb32):
    """(TM, TNB) int32 bytes -> (T, NA) integer planes (TM, TN) bf16.

    The standardized value decomposes as
        x̃ = A - B·t - A·na,   A = (2-c)/scale, B = 1/scale,
    with t = b1 + (b0 & b1) ∈ {0,1,2} and na = b0 & ~b1 ∈ {0,1} from the
    two PLINK bits — small integers, EXACT in bf16. This turns the
    f32-HIGHEST GEMM (6 MXU passes) into single-pass bf16 GEMMs against
    the integer planes."""
    T_planes, NA_planes = [], []
    for k in range(4):
        b0 = (pb32 >> (2 * k)) & 1
        b1 = (pb32 >> (2 * k + 1)) & 1
        u = b0 & b1
        T_planes.append((b1 + u).astype(jnp.bfloat16))
        NA_planes.append((b0 - u).astype(jnp.bfloat16))
    return (jnp.concatenate(T_planes, axis=1),
            jnp.concatenate(NA_planes, axis=1))


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_t(a, b):
    """(l, TN) x (TM, TN) -> (l, TM), f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cprod_kernel_split(pb_ref, q_ref, cs_ref, out_ref):
    """cprod via exact-integer bf16 bit-plane GEMMs; Q split hi+lo keeps
    ~f32 accuracy. hi/lo are ROW-STACKED into one GEMM per plane: MXU
    cycles depend on (N tiles x K), not on M<=128, so the stacked (2l,·)
    matmul costs the same as a single (l,·) one — 2 narrow GEMMs per
    tile instead of 4."""
    j = pl.program_id(1)
    c_row = cs_ref[0, :]
    s_row = cs_ref[1, :]
    T, NA = _decode_int_planes(pb_ref[...].astype(jnp.int32))
    q = q_ref[...]
    l = q.shape[0]
    q_hi, q_lo = _split_bf16(q)
    qs = jnp.concatenate([q_hi, q_lo], axis=0)  # (2l, TN)
    ptw = _dot_t(qs, T)                         # (2l, TM)
    pnaw = _dot_t(qs, NA)
    pt = ptw[:l] + ptw[l:]
    pna = pnaw[:l] + pnaw[l:]
    qsum = jnp.sum(q, axis=1, keepdims=True)    # (l, 1)
    A = (2.0 - c_row) * s_row                   # (TM,)
    part = (qsum - pna) * A[None, :] - pt * s_row[None, :]

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _prod_kernel_split(pb_ref, z_ref, cs_ref, out_ref):
    i = pl.program_id(1)
    c_row = cs_ref[0, :]
    s_row = cs_ref[1, :]
    T, NA = _decode_int_planes(pb_ref[...].astype(jnp.int32))
    z = z_ref[...]                               # (l, TM)
    l = z.shape[0]
    zA = z * ((2.0 - c_row) * s_row)[None, :]
    zB = z * s_row[None, :]
    zbs = jnp.concatenate(_split_bf16(zB), axis=0)   # (2l, TM)
    zas = jnp.concatenate(_split_bf16(zA), axis=0)
    ptw = jnp.dot(zbs, T, preferred_element_type=jnp.float32)
    pnaw = jnp.dot(zas, NA, preferred_element_type=jnp.float32)
    pt = ptw[:l] + ptw[l:]
    pna = pnaw[:l] + pnaw[l:]
    part = jnp.sum(zA, axis=1, keepdims=True) - pna - pt  # (l, TN)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


# ---------------------------------------------------------------------------
# int8 MXU mode: T/NA planes as int8 (exact), the float operand
# decomposed into NPLANES radix-128 int8 digits row-stacked into ONE
# int8 GEMM per {T, NA} — int8 streams the MXU at 2x the bf16 rate and
# 4x8=32 rows still fit one 128-row M tile, so a full power step costs
# ~1/4 of split2's MXU cycles at ~f32 accuracy (28-bit operand).
# ---------------------------------------------------------------------------

NPLANES = 4


def _decode_int_planes_i8(pb32):
    """Like _decode_int_planes but int8 (for the int8 MXU path)."""
    T_planes, NA_planes = [], []
    for k in range(4):
        b0 = (pb32 >> (2 * k)) & 1
        b1 = (pb32 >> (2 * k + 1)) & 1
        u = b0 & b1
        T_planes.append((b1 + u).astype(jnp.int8))
        NA_planes.append((b0 - u).astype(jnp.int8))
    return (jnp.concatenate(T_planes, axis=1),
            jnp.concatenate(NA_planes, axis=1))


def _decode_t_planes_i8(pb32):
    """T planes only (for NA-free packs): ~40% fewer decode ops."""
    T_planes = []
    for k in range(4):
        b0 = (pb32 >> (2 * k)) & 1
        b1 = (pb32 >> (2 * k + 1)) & 1
        T_planes.append((b1 + (b0 & b1)).astype(jnp.int8))
    return jnp.concatenate(T_planes, axis=1)


def _int8_planes(y):
    """y (l, n) f32 -> (NPLANES*l, n) int8 radix-128 digits + per-row
    scale (l,) f32: y[r] = scale[r] * sum_p planes[p*l+r] / 128**p, with
    relative error ~2^-28 (beyond f32's 24-bit mantissa)."""
    s = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    s = jnp.where(s > 0, s, 1.0)
    x = y * (127.0 / s)
    planes = []
    for _ in range(NPLANES):
        q = jnp.round(x)
        planes.append(q.astype(jnp.int8))
        x = (x - q) * 128.0
    return jnp.concatenate(planes, axis=0), s[:, 0] / 127.0


def _combine_planes(w, l):
    """(NPLANES*l, t) int32 -> (l, t) f32 radix recombination."""
    parts = w.astype(jnp.float32).reshape(NPLANES, l, w.shape[1])
    out = parts[0]
    f = 1.0
    for p in range(1, NPLANES):
        f = f / 128.0
        out = out + parts[p] * f
    return out


def _dot_i8_t(a, b):
    """(M, TN) int8 x (TM, TN) int8 -> (M, TM) int32 (contract lanes)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _cprod_kernel_i8(pb_ref, q8_ref, out_ref):
    """Accumulates raw [pt; pna] (2l, TM) in q-digit units; the
    center/scale epilogue happens outside the kernel on (l, m)."""
    j = pl.program_id(1)
    T, NA = _decode_int_planes_i8(pb_ref[...].astype(jnp.int32))
    q8 = q8_ref[...]                             # (NPLANES*l, TN)
    l = q8.shape[0] // NPLANES
    pt = _combine_planes(_dot_i8_t(q8, T), l)    # (l, TM)
    pna = _combine_planes(_dot_i8_t(q8, NA), l)
    part = jnp.concatenate([pt, pna], axis=0)    # (2l, TM)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _cprod_kernel_i8_nona(pb_ref, q8_ref, out_ref):
    """NA-free variant: T plane only — half the MXU passes, ~40% fewer
    decode ops. Exact when the pack has no missing genotypes (imputed
    data, the required input of the reference's PGS pipelines)."""
    j = pl.program_id(1)
    T = _decode_t_planes_i8(pb_ref[...].astype(jnp.int32))
    q8 = q8_ref[...]
    l = q8.shape[0] // NPLANES
    part = _combine_planes(_dot_i8_t(q8, T), l)  # (l, TM)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _prod_kernel_i8(pb_ref, zb8_ref, za8_ref, out_ref):
    i = pl.program_id(1)
    T, NA = _decode_int_planes_i8(pb_ref[...].astype(jnp.int32))
    zb8 = zb8_ref[...]                           # (NPLANES*l, TM)
    za8 = za8_ref[...]
    l = zb8.shape[0] // NPLANES
    pt = _combine_planes(
        jax.lax.dot_general(zb8, T, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32), l)
    pna = _combine_planes(
        jax.lax.dot_general(za8, NA, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32), l)
    part = jnp.concatenate([pt, pna], axis=0)    # (2l, TN)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _prod_kernel_i8_nona(pb_ref, zb8_ref, out_ref):
    i = pl.program_id(1)
    T = _decode_t_planes_i8(pb_ref[...].astype(jnp.int32))
    zb8 = zb8_ref[...]
    l = zb8.shape[0] // NPLANES
    part = _combine_planes(
        jax.lax.dot_general(zb8, T, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32), l)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _pallas_cprod_i8(packed, Qp, cs, interpret=False, tm=TM, tnb=TNB,
                     nona=False):
    """int8-MXU cprod: (l, n_pad) permuted f32 -> (l, m) f32."""
    m, nb = packed.shape
    l = Qp.shape[0]
    q8, qscale = _int8_planes(Qp)
    grid = (m // tm, nb // tnb)
    ol = l if nona else 2 * l
    raw = pl.pallas_call(
        _cprod_kernel_i8_nona if nona else _cprod_kernel_i8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tnb), lambda i, j: (i, j)),
            pl.BlockSpec((NPLANES * l, 4 * tnb), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((ol, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((ol, m), jnp.float32),
        interpret=interpret,
    )(packed, q8)
    pt = raw[:l] * qscale[:, None]
    pna = 0.0 if nona else raw[l:] * qscale[:, None]
    c_row, s_row = cs[0, :], cs[1, :]
    A = (2.0 - c_row) * s_row
    qsum = jnp.sum(Qp, axis=1, keepdims=True)
    return (qsum - pna) * A[None, :] - pt * s_row[None, :]


def _pallas_prod_i8(packed, Zt, cs, interpret=False, tm=TM, tnb=TNB,
                    nona=False):
    """int8-MXU prod: Zt (l, m) f32 -> (l, n_pad) permuted f32."""
    m, nb = packed.shape
    l = Zt.shape[0]
    c_row, s_row = cs[0, :], cs[1, :]
    zA = Zt * ((2.0 - c_row) * s_row)[None, :]
    zB = Zt * s_row[None, :]
    zb8, zbs = _int8_planes(zB)
    grid = (nb // tnb, m // tm)
    specs = [
        pl.BlockSpec((tm, tnb), lambda j, i: (i, j)),
        pl.BlockSpec((NPLANES * l, tm), lambda j, i: (0, i)),
    ]
    if nona:
        raw = pl.pallas_call(
            _prod_kernel_i8_nona,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((l, 4 * tnb), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((l, nb * 4), jnp.float32),
            interpret=interpret,
        )(packed, zb8)
        pna = 0.0
    else:
        za8, zas = _int8_planes(zA)
        raw = pl.pallas_call(
            _prod_kernel_i8,
            grid=grid,
            in_specs=specs + [
                pl.BlockSpec((NPLANES * l, tm), lambda j, i: (0, i))],
            out_specs=pl.BlockSpec((2 * l, 4 * tnb), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((2 * l, nb * 4), jnp.float32),
            interpret=interpret,
        )(packed, zb8, za8)
        pna = raw[l:] * zas[:, None]
    pt = raw[:l] * zbs[:, None]
    return jnp.sum(zA, axis=1, keepdims=True) - pna - pt


# --- int8m: at-rest materialized int8 planes (round-3 verdict #5).
# The 2-bit decode costs ~36 serialized VPU lane-ops/byte per pass; the
# measured bound of the int8 path is that decode, not HBM or MXU.
# Materializing the T (+NA) planes once as int8 arrays trades 4x (8x
# with NA) HBM bytes for zero per-pass decode: each pass is then a pure
# int8 MXU GEMM streaming the planes.


@tpu_jit(static_argnames=("tnb", "nona"))
def materialize_int8_planes(packed, tnb, nona=False):
    """(m, nb) packed -> (T, NA) int8 planes (m, 4*nb) in the kernels'
    bit-plane sample order (NA is None when nona). One decode pass."""
    m, nb = packed.shape
    # uint8 arithmetic throughout: an int32 cast of the full pack made
    # the peak 4x the pack and OOMed HBM at the 537 MB bench shape
    pb = packed.reshape(m, nb // tnb, 1, tnb)
    one = jnp.uint8(1)
    T, NA = [], []
    for k in range(4):
        b0 = (pb >> (2 * k)) & one
        b1 = (pb >> (2 * k + 1)) & one
        u = b0 & b1
        T.append((b1 + u).astype(jnp.int8))
        if not nona:
            NA.append((b0 - u).astype(jnp.int8))
    Tm = jnp.concatenate(T, axis=2).reshape(m, nb * 4)
    if nona:
        return Tm, None
    return Tm, jnp.concatenate(NA, axis=2).reshape(m, nb * 4)


def materialize_int8_planes_chunked(packed, tnb, nona=False,
                                    chunk=16384):
    """Row-chunked plane build with donated in-place updates: the
    one-shot jit's peak is ~2x the 4-8x-pack output (concat copies) and
    OOMed the shared chip's HBM at a 537 MB pack (round-4); this keeps
    peak ≈ final + one chunk."""
    m, nb = packed.shape
    if m <= chunk:
        return materialize_int8_planes(packed, tnb, nona)

    upd = jax.jit(
        lambda buf, part, i0: jax.lax.dynamic_update_slice(
            buf, part, (i0, 0)), donate_argnums=(0,))
    Tm = jnp.zeros((m, nb * 4), jnp.int8)
    NAm = None if nona else jnp.zeros((m, nb * 4), jnp.int8)
    for i0 in range(0, m, chunk):
        i1 = min(i0 + chunk, m)
        t, na = materialize_int8_planes(packed[i0:i1], tnb, nona)
        i0j = jnp.int32(i0)
        Tm = upd(Tm, t, i0j)
        if not nona:
            NAm = upd(NAm, na, i0j)
    return Tm, NAm


def _cprod_kernel_i8m(t_ref, q8_ref, out_ref):
    j = pl.program_id(1)
    q8 = q8_ref[...]
    l = q8.shape[0] // NPLANES
    part = _combine_planes(_dot_i8_t(q8, t_ref[...]), l)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _cprod_kernel_i8m_na(t_ref, na_ref, q8_ref, out_ref):
    j = pl.program_id(1)
    q8 = q8_ref[...]
    l = q8.shape[0] // NPLANES
    pt = _combine_planes(_dot_i8_t(q8, t_ref[...]), l)
    pna = _combine_planes(_dot_i8_t(q8, na_ref[...]), l)
    part = jnp.concatenate([pt, pna], axis=0)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _prod_kernel_i8m(t_ref, zb8_ref, out_ref):
    i = pl.program_id(1)
    zb8 = zb8_ref[...]
    l = zb8.shape[0] // NPLANES
    part = _combine_planes(
        jax.lax.dot_general(zb8, t_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32), l)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _prod_kernel_i8m_na(t_ref, na_ref, zb8_ref, za8_ref, out_ref):
    i = pl.program_id(1)
    zb8 = zb8_ref[...]
    za8 = za8_ref[...]
    l = zb8.shape[0] // NPLANES
    pt = _combine_planes(
        jax.lax.dot_general(zb8, t_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32), l)
    pna = _combine_planes(
        jax.lax.dot_general(za8, na_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32), l)
    part = jnp.concatenate([pt, pna], axis=0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _pallas_cprod_i8m(planes, Qp, cs, interpret=False, tm=TM, tnb=TNB):
    """int8m cprod: materialized planes, no in-kernel decode."""
    Tm, NAm = planes
    m = Tm.shape[0]
    nb = Tm.shape[1] // 4
    l = Qp.shape[0]
    q8, qscale = _int8_planes(Qp)
    grid = (m // tm, nb // tnb)
    nona = NAm is None
    ol = l if nona else 2 * l
    tspec = pl.BlockSpec((tm, 4 * tnb), lambda i, j: (i, j))
    qspec = pl.BlockSpec((NPLANES * l, 4 * tnb), lambda i, j: (0, j))
    ospec = pl.BlockSpec((ol, tm), lambda i, j: (0, i))
    oshape = jax.ShapeDtypeStruct((ol, m), jnp.float32)
    if nona:
        raw = pl.pallas_call(
            _cprod_kernel_i8m, grid=grid, in_specs=[tspec, qspec],
            out_specs=ospec, out_shape=oshape, interpret=interpret,
        )(Tm, q8)
        pna = 0.0
    else:
        raw = pl.pallas_call(
            _cprod_kernel_i8m_na, grid=grid,
            in_specs=[tspec, tspec, qspec],
            out_specs=ospec, out_shape=oshape, interpret=interpret,
        )(Tm, NAm, q8)
        pna = raw[l:] * qscale[:, None]
    pt = raw[:l] * qscale[:, None]
    c_row, s_row = cs[0, :], cs[1, :]
    A = (2.0 - c_row) * s_row
    qsum = jnp.sum(Qp, axis=1, keepdims=True)
    return (qsum - pna) * A[None, :] - pt * s_row[None, :]


def _pallas_prod_i8m(planes, Zt, cs, interpret=False, tm=TM, tnb=TNB):
    """int8m prod: materialized planes, no in-kernel decode."""
    Tm, NAm = planes
    m = Tm.shape[0]
    nb = Tm.shape[1] // 4
    l = Zt.shape[0]
    c_row, s_row = cs[0, :], cs[1, :]
    zA = Zt * ((2.0 - c_row) * s_row)[None, :]
    zB = Zt * s_row[None, :]
    zb8, zbs = _int8_planes(zB)
    grid = (nb // tnb, m // tm)
    tspec = pl.BlockSpec((tm, 4 * tnb), lambda j, i: (i, j))
    zspec = pl.BlockSpec((NPLANES * l, tm), lambda j, i: (0, i))
    nona = NAm is None
    if nona:
        raw = pl.pallas_call(
            _prod_kernel_i8m, grid=grid, in_specs=[tspec, zspec],
            out_specs=pl.BlockSpec((l, 4 * tnb), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((l, nb * 4), jnp.float32),
            interpret=interpret,
        )(Tm, zb8)
        pna = 0.0
    else:
        za8, zas = _int8_planes(zA)
        raw = pl.pallas_call(
            _prod_kernel_i8m_na, grid=grid,
            in_specs=[tspec, tspec, zspec, zspec],
            out_specs=pl.BlockSpec((2 * l, 4 * tnb), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((2 * l, nb * 4), jnp.float32),
            interpret=interpret,
        )(Tm, NAm, zb8, za8)
        pna = raw[l:] * zas[:, None]
    pt = raw[:l] * zbs[:, None]
    return jnp.sum(zA, axis=1, keepdims=True) - pna - pt


def _cprod_kernel(pb_ref, q_ref, cs_ref, out_ref):
    j = pl.program_id(1)
    c_row = cs_ref[0, :].reshape(-1, 1)
    s_row = cs_ref[1, :].reshape(-1, 1)
    xt = _decode_tile(pb_ref[...], c_row, s_row)      # (TM, TN)
    part = jax.lax.dot_general(
        q_ref[...], xt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (l, TM)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


@tpu_jit(static_argnames=("interpret", "tm", "mxu", "tnb", "nona"))
def pallas_cprod(packed, Qp, cs, interpret=False, tm=TM, mxu="highest",
                 tnb=TNB, nona=False, planes=None):
    """X̃ᵀ-product: (m, nb) packed, Qp (l, n_pad) permuted, cs (2+, m)
    [center; 1/scale] -> (l, m). l must be a multiple of 8; m a multiple
    of the variant tile `tm`; nb a multiple of the byte tile `tnb`
    (bigger tiles amortize per-grid-step overhead — measured ~1 us/step).
    Qp must be permuted with sample_perm(n_pad, tnb).

    mxu: "highest" = f32 6-pass GEMM on the decoded tile; "split2" =
    exact-integer bf16 bit-plane GEMMs with row-stacked hi/lo Q
    (~f32-accurate, 2 narrow passes); "int8" = int8-MXU bit planes with
    radix-128 Q digits (~f32-accurate, 2 double-rate passes)."""
    if mxu == "int8m":
        return _pallas_cprod_i8m(planes, Qp, cs, interpret=interpret,
                                 tm=tm, tnb=tnb)
    if mxu == "int8":
        return _pallas_cprod_i8(packed, Qp, cs, interpret=interpret, tm=tm,
                                tnb=tnb, nona=nona)
    m, nb = packed.shape
    l = Qp.shape[0]
    grid = (m // tm, nb // tnb)
    return pl.pallas_call(
        _cprod_kernel_split if mxu == "split2" else _cprod_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tnb), lambda i, j: (i, j)),
            pl.BlockSpec((l, 4 * tnb), lambda i, j: (0, j)),
            pl.BlockSpec((cs.shape[0], tm), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((l, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((l, m), jnp.float32),
        interpret=interpret,
    )(packed, Qp, cs)


def _prod_kernel(pb_ref, z_ref, cs_ref, out_ref):
    i = pl.program_id(1)
    c_row = cs_ref[0, :].reshape(-1, 1)
    s_row = cs_ref[1, :].reshape(-1, 1)
    xt = _decode_tile(pb_ref[...], c_row, s_row)      # (TM, TN)
    part = jnp.dot(z_ref[...], xt, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (l, TN)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


@tpu_jit(static_argnames=("interpret", "tm", "mxu", "tnb", "nona"))
def pallas_prod(packed, Zt, cs, interpret=False, tm=TM, mxu="highest",
                planes=None,
                tnb=TNB, nona=False):
    """X̃-product: Zt (l, m) -> (l, n_pad) permuted-sample outputs."""
    if mxu == "int8m":
        return _pallas_prod_i8m(planes, Zt, cs, interpret=interpret,
                                tm=tm, tnb=tnb)
    if mxu == "int8":
        return _pallas_prod_i8(packed, Zt, cs, interpret=interpret, tm=tm,
                               tnb=tnb, nona=nona)
    m, nb = packed.shape
    l = Zt.shape[0]
    grid = (nb // tnb, m // tm)
    return pl.pallas_call(
        _prod_kernel_split if mxu == "split2" else _prod_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tnb), lambda j, i: (i, j)),
            pl.BlockSpec((l, tm), lambda j, i: (0, i)),
            pl.BlockSpec((cs.shape[0], tm), lambda j, i: (0, i)),
        ],
        out_specs=pl.BlockSpec((l, 4 * tnb), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((l, nb * 4), jnp.float32),
        interpret=interpret,
    )(packed, Zt, cs)


@tpu_jit(static_argnames=("n_pad", "l_pad", "interpret", "mxu",
                          "tnb", "nona", "m_full"))
def _cprod_sub(packed, cs, V, row_pos, col_idx, n_pad, l_pad, interpret,
               mxu="highest", tnb=TNB, nona=False, m_full=None,
               planes=None):
    """Scatter V (n_sub, l) into kernel sample order, run cprod, gather
    the ind_col rows on device -> (m_sub, l). One device round-trip.

    m_full: when the full variant set is used, slice [:m_full] instead
    of an m-sized gather (saves ~ms-class epilogues at biobank m)."""
    l = V.shape[1]
    Qk = jnp.zeros((n_pad, l_pad), jnp.float32).at[row_pos, :l].set(V)
    out = pallas_cprod(packed, Qk.T, cs, interpret=interpret, mxu=mxu,
                       tnb=tnb, nona=nona, planes=planes)
    if m_full is not None:
        return out[:l, :m_full].T
    return out[:l][:, col_idx].T


@tpu_jit(static_argnames=("l_pad", "interpret", "mxu", "tnb",
                          "nona", "m_full"))
def _prod_sub(packed, cs, U, row_pos, col_idx, l_pad, interpret,
              mxu="highest", tnb=TNB, nona=False, m_full=None,
              planes=None):
    """Scatter U (m_sub, l) into full variant space, run prod, gather
    the ind_row samples on device -> (n_sub, l)."""
    l = U.shape[1]
    m_pad = packed.shape[0]
    if m_full is not None:
        Zk = jnp.zeros((m_pad, l_pad), jnp.float32).at[:m_full, :l].set(U)
    else:
        Zk = jnp.zeros((m_pad, l_pad), jnp.float32).at[col_idx, :l].set(U)
    out = pallas_prod(packed, Zk.T, cs, interpret=interpret, mxu=mxu,
                      tnb=tnb, nona=nona, planes=planes)
    return out[:l].T[row_pos]


@tpu_jit(static_argnames=("n_pad", "l_pad", "interpret", "mxu",
                          "tnb", "nona", "m_full"))
def _power_sub(packed, cs, V, row_pos, col_idx, n_pad, l_pad, interpret,
               mxu="highest", tnb=TNB, nona=False, m_full=None,
               planes=None):
    """Fused power step: one device program computing B = X̃ᵀV (gathered
    to ind_col) and Y = X̃·mask(B) (gathered to ind_row); the wide
    intermediate never crosses the host link.

    m_full: full-variant fast path — padded cprod output columns are
    exactly zero (pad rows have A = s = 0), so B feeds prod directly
    with no m-sized mask gather/scatter."""
    l = V.shape[1]
    Qk = jnp.zeros((n_pad, l_pad), jnp.float32).at[row_pos, :l].set(V)
    B = pallas_cprod(packed, Qk.T, cs, interpret=interpret, mxu=mxu, tnb=tnb,
                     nona=nona, planes=planes)
    if m_full is not None:
        Y = pallas_prod(packed, B, cs, interpret=interpret, mxu=mxu,
                        tnb=tnb, nona=nona, planes=planes)
        return B[:l, :m_full].T, Y[:l].T[row_pos]
    m_pad = packed.shape[0]
    Bm = jnp.zeros((m_pad, l_pad), jnp.float32).at[col_idx].set(B.T[col_idx])
    Y = pallas_prod(packed, Bm.T, cs, interpret=interpret, mxu=mxu, tnb=tnb,
                    nona=nona, planes=planes)
    return B[:l][:, col_idx].T, Y[:l].T[row_pos]


class PallasOperator:
    """Device-resident standardized genotype operator with fused kernels.

    Handles padding (variants to TM, samples to TN with NA bytes) and the
    bit-plane sample permutation. Optional ind_row/ind_col make the
    operator act as the physically subsetted matrix would, while the
    packed bytes stay whole (and cached) on device: inputs are scattered
    and outputs gathered on device, so iterative drivers (autoSVD's
    outlier loop) never repack or re-upload genotypes per iteration.
    """

    def __init__(self, pack, center, scale, interpret: bool | None = None,
                 ind_row=None, ind_col=None, mxu: str | None = None,
                 tnb: int | None = None, nona: bool | None = None):
        from bigsnpr_tpu import config

        m, nb = pack.packed.shape
        n = pack.n
        if nona is None:
            # NA-free packs (imputed data — the required input of the
            # reference's PGS pipelines) skip the NA plane entirely:
            # half the MXU passes. One vectorized host scan; the partial
            # last byte's PLINK zero-pad bits decode as code 0 (not NA).
            pb = np.asarray(pack.packed)
            nona = not bool(np.any(pb & ~(pb >> 1) & 0x55))
        self.nona = bool(nona)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        # "highest" | "split2" (exact-int bf16 bit planes) | "int8"
        # (int8-MXU bit planes, radix-128 digits); default from
        # config.pallas_mxu (env BIGSNPR_PALLAS_MXU)
        self.mxu = mxu if mxu is not None else config.pallas_mxu
        # byte-tile lanes: bigger sample tiles amortize the ~1 us
        # per-grid-step overhead (measured); small packs keep one tile
        self.tnb = tnb if tnb is not None else int(
            min(512, max(TNB, 1 << (max(nb, 1) - 1).bit_length())))

        m_pad = -(-m // TM) * TM
        nb_pad = -(-nb // self.tnb) * self.tnb
        self.n_pad = nb_pad * 4
        base = (pack.device_packed() if hasattr(pack, "device_packed")
                else jnp.asarray(np.asarray(pack.packed)))
        buf = jnp.pad(base, ((0, m_pad - m), (0, nb_pad - nb)),
                      constant_values=0b01010101)  # NA pad
        # partial last byte: force pad bits to NA
        rem = n % 4
        if rem:
            keep = (1 << (2 * rem)) - 1
            na_fill = sum(0b01 << (2 * k) for k in range(rem, 4))
            buf = buf.at[:m, nb - 1].set(
                (buf[:m, nb - 1] & keep) | np.uint8(na_fill))
        self.packed = buf

        center = np.asarray(center, dtype=np.float64)
        scale = np.asarray(scale, dtype=np.float64)
        inv = np.zeros(m_pad, dtype=np.float32)
        ctr = np.full(m_pad, 2.0, dtype=np.float32)
        good = scale > 0
        inv[:m][good] = 1.0 / scale[good]
        ctr[:m] = np.where(good, center, 2.0)
        # rows 2..7 pad the sublane tile
        cs = np.zeros((8, m_pad), dtype=np.float32)
        cs[0] = ctr
        cs[1] = inv
        self.cs = jnp.asarray(cs)

        self.perm = sample_perm(self.n_pad, tnb=self.tnb)
        self.inv_perm = np.argsort(self.perm)
        rows = np.arange(n) if ind_row is None else np.asarray(ind_row)
        cols = np.arange(m) if ind_col is None else np.asarray(ind_col)
        self.n, self.m = len(rows), len(cols)
        self.row_pos = jnp.asarray(self.inv_perm[rows], dtype=jnp.int32)
        self.col_idx = jnp.asarray(cols, dtype=jnp.int32)
        # full-variant fast path: slice instead of m-sized gathers
        self.m_full = m if ind_col is None else None
        # int8m: at-rest materialized int8 planes (4x packed bytes, 8x
        # with NA) — zero per-pass decode; built once on device
        self.planes = (materialize_int8_planes_chunked(
            self.packed, self.tnb, self.nona)
            if self.mxu == "int8m" else None)

    @staticmethod
    def _as_2d(arr):
        arr = jnp.asarray(arr, dtype=jnp.float32)
        squeeze = arr.ndim == 1
        return (arr[:, None] if squeeze else arr), squeeze

    def cprod(self, V):
        """X̃ᵀ V: V (n, l) -> (m, l)."""
        V, squeeze = self._as_2d(V)
        l_pad = V.shape[1] + (-V.shape[1]) % 8
        out = np.asarray(_cprod_sub(self.packed, self.cs, V, self.row_pos,
                                    self.col_idx, self.n_pad, l_pad,
                                    self.interpret, self.mxu, self.tnb,
                                    self.nona, self.m_full, self.planes))
        return out[:, 0] if squeeze else out

    def prod(self, U):
        """X̃ U: U (m, l) -> (n, l)."""
        U, squeeze = self._as_2d(U)
        l_pad = U.shape[1] + (-U.shape[1]) % 8
        out = np.asarray(_prod_sub(self.packed, self.cs, U, self.row_pos,
                                   self.col_idx, l_pad, self.interpret,
                                   self.mxu, self.tnb, self.nona,
                                   self.m_full, self.planes))
        return out[:, 0] if squeeze else out

    def power(self, V):
        """One fused Krylov step: returns (X̃ᵀV, X̃X̃ᵀV) with a single
        host round-trip."""
        B, Y = self.power_dev(self._as_2d(V)[0])
        return np.asarray(B), np.asarray(Y)

    def power_dev(self, V):
        """Device-resident power step: V (n, l) jnp -> (B, Y) jnp arrays,
        no host transfer (for fully on-device Krylov drivers)."""
        l_pad = V.shape[1] + (-V.shape[1]) % 8
        return _power_sub(self.packed, self.cs, V, self.row_pos,
                          self.col_idx, self.n_pad, l_pad, self.interpret,
                          self.mxu, self.tnb, self.nona, self.m_full,
                          self.planes)
