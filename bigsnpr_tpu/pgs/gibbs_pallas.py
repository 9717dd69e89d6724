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
