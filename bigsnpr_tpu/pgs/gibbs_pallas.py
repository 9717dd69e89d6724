"""Pallas TPU kernel for the blocked Gibbs sweep.

The XLA `lax.scan` formulation of the lockstep sweep costs ~0.5 ms per
scan step on the chip (measured round 3: 90 variant-steps/ms at 100K
variants — ~60x off the reference's C++ loops,
src/ldpred2-auto.cpp:109-159). This kernel gives the step its true
cost: the dotprod accumulator `dp` lives in VMEM scratch across grid
steps (DMA'd from/to HBM once per sweep), each grid step j gets one
band row block auto-pipelined by Mosaic via the BlockSpec index map,
and performs the (wk, Bk) vector-AXPY update in VMEM.

Layout matches gibbs_blocked's device layout: blocks in lanes, band
width in sublanes — bands_t (mbk, wk, Bk), dp (mbk + wk - 1, Bk).

Inputs are stacked per step: xin (mbk, NIN, Bk) rows
[bh, C2, C4, sqrt1pC1, sqrtC4, u, z, cb, inv_odd_p, p, shrink_corr,
sparse_flag, pad...]; outputs ys (mbk, NOUT, Bk) rows [new_beta, causal, postp_inc,
beta_inc, dotprod_shrunk, pad...] plus (2, Bk) per-lane accumulators
[h2_inc, gap] — identical math to
gibbs_blocked._sweep_gibbs_batched (the correctness twin, which also
serves the CPU / f64 / sharded paths).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NIN = 16   # 8 per-variant rows + 3 broadcast scalars + pad to sublanes
NOUT = 8   # new_beta, causal, postp_inc, beta_inc, dps (+3 pad rows)


def _sweep_kernel(band_ref, xin_ref, dp_in_ref, ys_ref, dp_out_ref,
                  acc_ref, dp_ref, sem_in, sem_out, W: int,
                  no_jump_sign: bool):
    j = pl.program_id(0)
    mb = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        cp = pltpu.make_async_copy(dp_in_ref, dp_ref, sem_in)
        cp.start()
        cp.wait()
        acc_ref[...] = jnp.zeros_like(acc_ref)

    band = band_ref[0]                     # (wk8, Bk) — row shifted by j%8
    wk8 = band.shape[0]
    x = xin_ref[0]                         # (NIN, Bk)
    bh_j, c2, c4, s1c1, sc4, u_j, z_j, cb_j = [x[i] for i in range(8)]
    inv_odd_p = x[8]
    p = x[9]
    shrink_corr = x[10]
    sp_flag = x[11]

    # rows are pre-shifted by j % 8 so the dp slice starts at a
    # provably-aligned sublane offset (Mosaic requirement)
    j0 = pl.multiple_of((j // 8) * 8, 8)
    dp_slice = dp_ref[pl.ds(j0, wk8), :]   # (wk8, Bk)
    # center = dp[j + W] = slice row W + (j % 8): one-hot mask reduce
    # (dynamic row extraction from a vector value is not lowerable)
    rows = jax.lax.broadcasted_iota(jnp.int32, (wk8, 1), 0)
    center = jnp.where(rows == W + (j - j0), 1.0, 0.0)
    dotprod = jnp.sum(dp_slice * center, axis=0)   # (Bk,)
    res = bh_j - shrink_corr * (dotprod - cb_j)
    C3 = c2 * res
    postp = 1.0 / (1.0 + inv_odd_p * s1c1 * jnp.exp(-C3 * C3 / c4 * 0.5))
    samp = C3 + z_j * sc4
    accept = postp > u_j
    sparse_skip = (postp < p) & (sp_flag > 0)
    if no_jump_sign:
        sampled = accept & ~sparse_skip & ~(samp * cb_j < 0)
    else:
        sampled = accept & ~sparse_skip
    new_beta = jnp.where(sampled, samp, 0.0)

    dotprod_shrunk = shrink_corr * dotprod + (1 - shrink_corr) * cb_j
    diff = new_beta - cb_j
    dp_ref[pl.ds(j0, wk8), :] = dp_slice + diff[None, :] * band

    acc_ref[0, :] += diff * (2 * dotprod_shrunk + diff)    # h2_inc
    acc_ref[1, :] += jnp.where(sampled, samp * samp, 0.0)  # gap

    fz = jnp.zeros_like(new_beta)
    ys_ref[0, 0, :] = new_beta
    ys_ref[0, 1, :] = sampled.astype(new_beta.dtype)
    ys_ref[0, 2, :] = jnp.where(sparse_skip, fz, postp)
    ys_ref[0, 3, :] = jnp.where(sparse_skip, fz, C3 * postp)
    ys_ref[0, 4, :] = dotprod_shrunk

    @pl.when(j == mb - 1)
    def _():
        cp = pltpu.make_async_copy(dp_ref, dp_out_ref, sem_out)
        cp.start()
        cp.wait()


@partial(jax.jit, static_argnames=("W", "no_jump_sign", "interpret"))
def sweep_bucket_pallas(bands_t, xin, dp, W, no_jump_sign,
                        interpret=False):
    """One lockstep Gibbs sweep over a bucket.

    bands_t (mbk, wk, Bk) f32; xin (mbk, NIN, Bk); dp (mbk+wk-1, Bk).
    Returns (ys (mbk, NOUT, Bk), dp2, h2_inc scalar, gap scalar)."""
    mbk, wk, Bk = bands_t.shape
    L = dp.shape[0]
    kern = partial(_sweep_kernel, W=W, no_jump_sign=no_jump_sign)
    ys, dp2, acc = pl.pallas_call(
        kern,
        grid=(mbk,),
        in_specs=[
            pl.BlockSpec((1, wk, Bk), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, NIN, Bk), lambda j: (j, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, NOUT, Bk), lambda j: (j, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, Bk), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mbk, NOUT, Bk), dp.dtype),
            jax.ShapeDtypeStruct((L, Bk), dp.dtype),
            jax.ShapeDtypeStruct((2, Bk), dp.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((L, Bk), dp.dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(bands_t, xin, dp)
    h2_inc = jnp.sum(acc[0])
    gap = jnp.sum(acc[1])
    return ys, dp2, h2_inc, gap


def build_xin(bh, C2, C4, s1, u, z, cb, inv_odd_p, p, shrink_corr,
              sparse):
    """Stack per-variant rows + broadcast scalars -> (mbk, NIN, Bk).

    All per-variant args are (mbk, Bk) in bucket layout; inv_odd_p, p,
    shrink_corr, sparse are (traced) scalars."""
    sqrtC4 = jnp.sqrt(C4)
    mbk, Bk = bh.shape
    dt = bh.dtype
    ones = jnp.ones((mbk, Bk), dt)
    rows = [bh, C2, C4, s1, sqrtC4, u, z, cb,
            ones * inv_odd_p, ones * p, ones * shrink_corr,
            ones * jnp.asarray(sparse, dt)]
    rows += [jnp.zeros((mbk, Bk), dt)] * (NIN - len(rows))
    return jnp.stack(rows, axis=1)


# ---------------------------------------------------------------------------
# Multi-chain kernel: chains/grid-cells batched into one sweep
# ---------------------------------------------------------------------------
#
# The reference runs 30 auto chains / 21 grid models as concurrent
# processes (R/LDpred2.R:100-114,233-236) — that process-grid is its
# main parallelism. Here the chains share the band tiles exactly (only
# xin, dp, and per-variant state differ), so a leading chain axis NC
# rides along for near-free throughput: each grid step DMAs one band
# row-group once and applies it to every chain. Additionally RG rows
# are processed per grid step (sequentially in-kernel, preserving the
# exact sweep order), amortizing the ~us-class per-grid-step overhead
# that bounds the single-row kernel.


def _sweep_kernel_mc(band_ref, xin_ref, dp_in_ref, ys_ref, dp_out_ref,
                     acc_ref, dp_ref, sem_in, sem_out, W: int, RG: int,
                     no_jump_sign: bool):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(dp_in_ref, dp_ref, sem_in)
        cp.start()
        cp.wait()
        acc_ref[...] = jnp.zeros_like(acc_ref)

    band = band_ref[...]          # (RG, wk8, LT) — rows pre-shifted by j%8
    x = xin_ref[...]              # (RG, NC, NIN, LT)
    wk8 = band.shape[1]
    base = t * RG                 # multiple of 8 (RG is a multiple of 8)

    for r in range(RG):
        off = pl.multiple_of(base + (r // 8) * 8, 8)
        xr = x[r]                 # (NC, NIN, LT)
        bh_j, c2, c4, s1c1, sc4, u_j, z_j, cb_j = [xr[:, i] for i in range(8)]
        inv_odd_p = xr[:, 8]
        p = xr[:, 9]
        shrink = xr[:, 10]
        spf = xr[:, 11]

        # center row dp[j + W]: read the aligned 8-row slab containing it
        # and reduce with a STATIC one-hot (row index W + r%8 is static
        # within the unrolled r-loop — no dynamic sublane extraction)
        cw = W + (r % 8)
        cbase = pl.multiple_of(base + (r // 8) * 8 + (cw // 8) * 8, 8)
        slab = dp_ref[:, pl.ds(cbase, 8), :]           # (NC, 8, LT)
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
        dotprod = jnp.sum(jnp.where(rows == cw % 8, slab, 0.0), axis=1)

        res = bh_j - shrink * (dotprod - cb_j)
        C3 = c2 * res
        postp = 1.0 / (1.0 + inv_odd_p * s1c1 * jnp.exp(-C3 * C3 / c4 * 0.5))
        samp = C3 + z_j * sc4
        accept = postp > u_j
        sparse_skip = (postp < p) & (spf > 0)
        if no_jump_sign:
            sampled = accept & ~sparse_skip & ~(samp * cb_j < 0)
        else:
            sampled = accept & ~sparse_skip
        new_beta = jnp.where(sampled, samp, 0.0)

        dps = shrink * dotprod + (1 - shrink) * cb_j
        diff = new_beta - cb_j
        dsl = dp_ref[:, pl.ds(off, wk8), :]            # (NC, wk8, LT)
        dp_ref[:, pl.ds(off, wk8), :] = dsl + diff[:, None, :] * band[r][None]

        acc_ref[:, pl.ds(0, 1), :] += (diff * (2 * dps + diff))[:, None, :]
        acc_ref[:, pl.ds(1, 1), :] += \
            jnp.where(sampled, samp * samp, 0.0)[:, None, :]

        fz = jnp.zeros_like(new_beta)
        outs = [new_beta, sampled.astype(new_beta.dtype),
                jnp.where(sparse_skip, fz, postp),
                jnp.where(sparse_skip, fz, C3 * postp), dps]
        for i, v in enumerate(outs):
            ys_ref[pl.ds(r, 1), :, pl.ds(i, 1), :] = v[None, :, None, :]

    @pl.when(t == nt - 1)
    def _():
        cp = pltpu.make_async_copy(dp_ref, dp_out_ref, sem_out)
        cp.start()
        cp.wait()


@partial(jax.jit, static_argnames=("W", "RG", "no_jump_sign", "interpret"))
def sweep_bucket_pallas_mc(bands_t, xin, dp, W, RG, no_jump_sign,
                           interpret=False):
    """One lockstep Gibbs sweep over a bucket for NC chains at once.

    bands_t (mbk, wk8, LT) f32 (shared across chains); xin
    (mbk, NC, NIN, LT); dp (NC, L, LT). Returns
    (ys (mbk, NC, NOUT, LT), dp2, h2_inc (NC, LT), gap (NC, LT)) — the
    caller sums the per-lane accumulators."""
    mbk, wk8, LT = bands_t.shape
    NC = xin.shape[1]
    L = dp.shape[1]
    assert mbk % RG == 0 and RG % 8 == 0
    kern = partial(_sweep_kernel_mc, W=W, RG=RG, no_jump_sign=no_jump_sign)
    ys, dp2, acc = pl.pallas_call(
        kern,
        grid=(mbk // RG,),
        in_specs=[
            pl.BlockSpec((RG, wk8, LT), lambda t: (t, 0, 0)),
            pl.BlockSpec((RG, NC, NIN, LT), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((RG, NC, NOUT, LT), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NC, 8, LT), lambda t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mbk, NC, NOUT, LT), dp.dtype),
            jax.ShapeDtypeStruct((NC, L, LT), dp.dtype),
            jax.ShapeDtypeStruct((NC, 8, LT), dp.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((NC, L, LT), dp.dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(bands_t, xin, dp)
    return ys, dp2, acc[:, 0, :], acc[:, 1, :]


# ---------------------------------------------------------------------------
# v3 kernel: width-paneled band streaming + sliding-window dp
# ---------------------------------------------------------------------------
#
# The v2 multi-chain kernel holds the full per-chain dp and a full band
# row-group in VMEM, which caps chains/pass at ~1 for realistic HM3
# bandwidths (wk8 ~ 2048). v3 exploits two structural facts:
#  - the sweep's intra-group sequential dependency lives in exactly 8
#    band columns [ck, ck+8) (the center strip): row r's center read
#    dp[j + ck] only depends on rows r' < r through stored column
#    ck + (r - r') — so pass A runs the 8 rows sequentially on the
#    strip alone, and pass B applies the remaining width in panels of
#    WP columns with the strip masked out (any order);
#  - dp rows outside the active window [t*8, t*8 + wk8) are dead for
#    the rest of the sweep — a sliding VMEM window with 8-row DMA
#    retire/load per group replaces the full-dp scratch.
# VMEM per chain drops from (L + 2*RG*wk8/NC...) to ~wk8 rows, so ~25
# chains ride one band pass at wk8=640 and ~7 at wk8=2048.


def _sweep_kernel_v3(bandp_ref, bandc_ref, xin_ref, dp_in_ref,
                     ys_ref, dp_out_ref, acc_ref,
                     dpw_ref, diffs_ref, sem_in, sem_out,
                     ck: int, WP: int, no_jump_sign: bool):
    t = pl.program_id(0)
    p = pl.program_id(1)
    T = pl.num_programs(0)
    P = pl.num_programs(1)
    wk8 = dpw_ref.shape[1]
    L = dp_in_ref.shape[1]

    @pl.when((t == 0) & (p == 0))
    def _():
        cp = pltpu.make_async_copy(dp_in_ref.at[:, pl.ds(0, wk8), :],
                                   dpw_ref, sem_in)
        cp.start()
        cp.wait()
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when((t > 0) & (p == 0))
    def _():
        base = pl.multiple_of(t * 8, 8)
        # retire rows [base-8, base) — final after group t-1 completed
        cp = pltpu.make_async_copy(
            dpw_ref.at[:, pl.ds(0, 8), :],
            dp_out_ref.at[:, pl.ds(pl.multiple_of(base - 8, 8), 8), :],
            sem_out)
        cp.start()
        cp.wait()
        # slide the window down 8 rows, load the 8 incoming rows
        dpw_ref[:, pl.ds(0, wk8 - 8), :] = dpw_ref[:, pl.ds(8, wk8 - 8), :]
        cp = pltpu.make_async_copy(
            dp_in_ref.at[:, pl.ds(pl.multiple_of(base + wk8 - 8, 8), 8), :],
            dpw_ref.at[:, pl.ds(wk8 - 8, 8), :], sem_in)
        cp.start()
        cp.wait()

    # pass A: the 8 rows sequentially, center strip only
    @pl.when(p == 0)
    def _():
        bc = bandc_ref[...]            # (8, 8, LT) strip cols [ck, ck+8)
        x = xin_ref[...]               # (8, NC, NIN, LT)
        for r in range(8):
            xr = x[r]
            bh_j, c2, c4, s1c1, sc4, u_j, z_j, cb_j = \
                [xr[:, i] for i in range(8)]
            inv_odd_p = xr[:, 8]
            pp = xr[:, 9]
            shrink = xr[:, 10]
            spf = xr[:, 11]
            dotprod = dpw_ref[:, ck + r, :]           # (NC, LT) static row
            res = bh_j - shrink * (dotprod - cb_j)
            C3 = c2 * res
            postp = 1.0 / (1.0 + inv_odd_p * s1c1 *
                           jnp.exp(-C3 * C3 / c4 * 0.5))
            samp = C3 + z_j * sc4
            accept = postp > u_j
            sparse_skip = (postp < pp) & (spf > 0)
            if no_jump_sign:
                sampled = accept & ~sparse_skip & ~(samp * cb_j < 0)
            else:
                sampled = accept & ~sparse_skip
            new_beta = jnp.where(sampled, samp, 0.0)
            dps = shrink * dotprod + (1 - shrink) * cb_j
            diff = new_beta - cb_j
            dpw_ref[:, pl.ds(ck, 8), :] += diff[:, None, :] * bc[r][None]
            diffs_ref[:, pl.ds(r, 1), :] = diff[:, None, :]
            acc_ref[:, pl.ds(0, 1), :] += (diff * (2 * dps + diff))[:, None, :]
            acc_ref[:, pl.ds(1, 1), :] += \
                jnp.where(sampled, samp * samp, 0.0)[:, None, :]
            fz = jnp.zeros_like(new_beta)
            outs = [new_beta, sampled.astype(new_beta.dtype),
                    jnp.where(sparse_skip, fz, postp),
                    jnp.where(sparse_skip, fz, C3 * postp), dps]
            for i, v in enumerate(outs):
                ys_ref[pl.ds(r, 1), :, pl.ds(i, 1), :] = v[None, :, None, :]

    # pass B: this width panel for all 8 rows, strip masked out
    bp = bandp_ref[...]                # (8, WP, LT)
    cols = p * WP + jax.lax.broadcasted_iota(jnp.int32, (1, WP, 1), 1)
    instrip = (cols >= ck) & (cols < ck + 8)
    upd = diffs_ref[:, 0, :][:, None, :] * jnp.where(instrip, 0.0, bp[0][None])
    for r in range(1, 8):
        upd += diffs_ref[:, r, :][:, None, :] * \
            jnp.where(instrip, 0.0, bp[r][None])
    off = pl.multiple_of(p * WP, 8)
    dpw_ref[:, pl.ds(off, WP), :] += upd

    @pl.when((t == T - 1) & (p == P - 1))
    def _():
        base = pl.multiple_of(t * 8, 8)
        cp = pltpu.make_async_copy(
            dpw_ref, dp_out_ref.at[:, pl.ds(base, wk8), :], sem_out)
        cp.start()
        cp.wait()
        # tail rows [L-8, L) are never touched by any window: carry the
        # previous sweep's (zero) values through
        cp = pltpu.make_async_copy(
            dp_in_ref.at[:, pl.ds(L - 8, 8), :],
            dp_out_ref.at[:, pl.ds(L - 8, 8), :], sem_out)
        cp.start()
        cp.wait()


@partial(jax.jit, static_argnames=("ck", "WP", "no_jump_sign", "interpret"))
def sweep_bucket_pallas_v3(bands_t, band_center, xin, dp, ck, WP,
                           no_jump_sign, interpret=False):
    """One lockstep sweep over a bucket, NC chains, v3 layout.

    bands_t (mbk, wk8, LT) with wk8 % WP == 0 and center column
    ck = wk8 // 2; band_center (mbk, 8, LT) = bands_t[:, ck:ck+8, :];
    xin (mbk, NC, NIN, LT); dp (NC, mbk + wk8, LT). Returns
    (ys (mbk, NC, NOUT, LT), dp2, h2_inc (NC, LT), gap (NC, LT))."""
    mbk, wk8, LT = bands_t.shape
    NC = xin.shape[1]
    L = dp.shape[1]
    assert mbk % 8 == 0 and wk8 % WP == 0 and ck == wk8 // 2
    kern = partial(_sweep_kernel_v3, ck=ck, WP=WP,
                   no_jump_sign=no_jump_sign)
    ys, dp2, acc = pl.pallas_call(
        kern,
        grid=(mbk // 8, wk8 // WP),
        in_specs=[
            pl.BlockSpec((8, WP, LT), lambda t, p: (t, p, 0)),
            pl.BlockSpec((8, 8, LT), lambda t, p: (t, 0, 0)),
            pl.BlockSpec((8, NC, NIN, LT), lambda t, p: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((8, NC, NOUT, LT), lambda t, p: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NC, 8, LT), lambda t, p: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mbk, NC, NOUT, LT), dp.dtype),
            jax.ShapeDtypeStruct((NC, L, LT), dp.dtype),
            jax.ShapeDtypeStruct((NC, 8, LT), dp.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((NC, wk8, LT), dp.dtype),
                        pltpu.VMEM((NC, 8, LT), dp.dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(bands_t, band_center, xin, dp)
    return ys, dp2, acc[:, 0, :], acc[:, 1, :]


def v3_width(Wb):
    """v3 band padding rule: width = smallest multiple of WP covering
    2*Wb + 16 (room for the j%8 pre-shift on both flanks of the center
    column ck = wk8 // 2). WP scales with the band so panel count stays
    small while narrow buckets don't over-pad."""
    need = 2 * Wb + 16
    WP = 256 if need > 1024 else (128 if need > 256 else 64)
    wk8 = -(-need // WP) * WP
    return wk8, WP


def plan_v3(mbk, wk8, Bk, L, NC, WP, itemsize=4, budget=12 * 2**20):
    """(LT, NCT) for the v3 kernel under the VMEM budget (physical,
    lane-padded sizes), or None if even one chain cannot fit or the
    bucket's lane count is not 128-aligned (v3's sliding-window DMAs
    slice rows, and Mosaic requires sliced refs' lane extent to be a
    multiple of 128 — such buckets run the v2 kernel instead)."""
    if Bk % 128:
        return None
    best = None
    lts = [lt for lt in (128, 256) if Bk % lt == 0]
    for LT in lts:
        ltp = LT
        fixed = (2 * 8 * WP * ltp + 2 * 8 * 8 * ltp) * itemsize
        per_chain = (wk8 * ltp + 8 * ltp          # dpw + diffs
                     + 2 * 8 * (NIN + NOUT) * ltp  # xin + ys buffers
                     + 8 * ltp) * itemsize         # acc
        nct = min(NC, (budget - fixed) // per_chain)
        if nct < 1:
            continue
        passes = -(-NC // nct)
        steps = passes * (Bk // LT) * (mbk // 8) * (wk8 // WP)
        score = (passes, steps)
        if best is None or score < best[0]:
            best = (score, (LT, int(nct)))
    return None if best is None else best[1]


def plan_mc(mbk, wk8, Bk, L, NC, itemsize=4, budget=12 * 2**20):
    """Choose (LT lane-tile, RG rows/step, NCT chains/call) for the
    multi-chain kernel under the scoped-VMEM budget (round-3 verdict:
    clamp before compile, never discover limits by compile-OOM).

    Buffer estimates use the PHYSICAL (Mosaic-padded) sizes: the minor
    (lane) dim is padded to 128, so a Bk=8 bucket costs 16x its logical
    bytes (measured: an unpadded estimate compile-OOM'd at 18.5M/16M on
    a Bk=8 bucket). Primary objective: fewest chain passes (each pass
    re-reads the whole band from HBM); secondary: fewest grid steps
    (per-step overhead)."""
    best = None
    lts = [Bk] if Bk <= 128 else [lt for lt in (128, 64, 32) if Bk % lt == 0]
    for LT in lts:
        ltp = -(-LT // 128) * 128        # physical lanes (Mosaic padding)
        for RG in (32, 16, 8):
            if mbk % RG:
                continue
            band_buf = 2 * RG * wk8 * ltp * itemsize
            if band_buf > budget:
                continue
            per_chain = (L * ltp + 2 * RG * (NIN + NOUT) * ltp
                         + 8 * ltp) * itemsize
            nct = min(NC, (budget - band_buf) // per_chain)
            if nct < 1:
                continue
            passes = -(-NC // nct)
            steps = passes * (Bk // LT) * (mbk // RG)
            score = (passes, steps)
            if best is None or score < best[0]:
                best = (score, (LT, RG, int(nct)))
    if best is None:
        # even one chain at the smallest tile exceeds VMEM (giant
        # monolithic bucket): signal the caller to use the XLA twin
        # for this bucket instead of compile-OOMing
        return None
    return best[1]
