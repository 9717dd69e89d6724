"""Block-parallel LDpred2 / lassosum2 over ragged LD blocks.

The reference's Gibbs/CD chains are strictly sequential over all m
variants (src/ldpred2-auto.cpp:109-159) — the #1 hard part for a TPU port
(SURVEY.md §7). When the LD matrix is block-diagonal (the recommended
practice: snp_ldsplit blocks), variants in different blocks never
interact through dotprods, so the sequential chain factorizes exactly:
one `lax.scan` per block, `vmap`-ped across blocks, with the global
hyper-parameter updates (p, h2, MLE) reduced across blocks per sweep.

Memory layout (round-2 redesign): blocks are **bucketed by shape** —
each block keeps its own bandwidth W_b and is padded only to its
bucket's (mb, 2W+1); buckets are separate arrays vmapped independently
inside one jitted sweep. This removes the round-1 global-W dense band
whose single long-range pair inflated every row (VERDICT missing #1):
at HM3 scale the LD fits in a few GB instead of 12-24 GB.

On a block-diagonal LD matrix the blocked samplers consume the same RNG
layout and perform the same arithmetic as the unblocked chains (extra
zero-adds only), so results agree to f32 round-off — tested. Sequential
depth drops from m to max(block size). Cross-block LD entries (nonzero
when `blocks` comes from snp_ldsplit with cost > 0) are dropped — the
same approximation the reference recommends when making the SFBM
block-diagonal from ldsplit output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bigsnpr_tpu.pgs.gibbs import (_beta_draw, _mle_alpha_profile,
                                   _poisson1, MIN_H2)
from bigsnpr_tpu.pgs.band import build_band


def _round_up(x: int, candidates=(8, 16, 32, 64, 128)) -> int:
    """Round up to a small set of bucket sizes: powers of two up to 128,
    then multiples of 128 (TPU lane width)."""
    for c in candidates:
        if x <= c:
            return c
    return -(-x // 128) * 128


class BlockBands:
    """Bucketed per-block banded LD.

    Attributes
    ----------
    buckets : list of (bands, gidx) with
        bands (Bk, mbk, 2Wk+1) float — band[b, j, Wk+d] = R[j, j+d] within
        block b; gidx (Bk, mbk) int32 — global variant index of each slot,
        -1 at padding.
    m : total number of variants across blocks.
    dropped_r2 / kept_r2 : sum of squared off-diagonal LD entries dropped
        at block boundaries / kept inside blocks (the block-diagonal
        approximation's cost; the reference drops the same mass when it
        makes the SFBM block-diagonal from ldsplit output).
    dropped_r2_frac : dropped_r2 / (dropped_r2 + kept_r2), 0.0 when
        there is no off-diagonal mass.
    """

    def __init__(self, buckets, m, dropped_r2=0.0, kept_r2=0.0):
        self.buckets = buckets
        self.m = m
        self.dropped_r2 = float(dropped_r2)
        self.kept_r2 = float(kept_r2)
        self._dev_cache = {}

    @property
    def dropped_r2_frac(self):
        tot = self.dropped_r2 + self.kept_r2
        return self.dropped_r2 / tot if tot > 0 else 0.0

    @property
    def nbytes(self):
        return sum(b.nbytes for b, _ in self.buckets)

    def device_put(self, shard=False, mesh=None):
        """Move bands to device in the samplers' TPU-native layout:
        bands_t (mbk, wk + 8, Bk) — band width in sublanes, blocks in
        lanes — and gidx_t (mbk, Bk). Two alignment transforms (both
        measured ~100x on chip):
        - row j is pre-shifted by j % 8 sublanes, so every dp slice
          starts at a multiple-of-8 offset (Mosaic requires provably
          aligned sublane offsets; the XLA twin uses the same layout);
        - Bk is padded to aligned lanes (64-multiples) with inert dead
          blocks (zero band, gidx -1).
        With shard=True partition each bucket's block (lane) axis over
        a 1-D device mesh (GSPMD then runs per-block scans on separate
        chips and all-reduces the per-sweep hyper-parameter sums over
        ICI). Results are cached per shard mode (the host transform +
        upload costs ~10 s at 100K variants — pay it once)."""
        ck_key = (shard, id(mesh))
        if ck_key in self._dev_cache:
            return self._dev_cache[ck_key]
        host = []
        for b, g in self.buckets:
            Bk0, mbk, wk = b.shape              # wk = 2*Wb + 1 (odd)
            Wb = (wk - 1) // 2
            BkP = 8 if Bk0 <= 8 else -(-Bk0 // 64) * 64
            # width padded to (8-multiple) + 8 so every slice has an
            # aligned SIZE as well as an aligned offset; the center sits
            # at CK + (j % 8) with CK = (wk8 - 8) // 2 — consumers
            # recover CK from shape alone
            wk8 = -(-wk // 8) * 8 + 8
            ck = (wk8 - 8) // 2
            band8 = np.zeros((mbk, wk8, BkP), dtype=b.dtype)
            r = np.arange(mbk) % 8
            band8[np.arange(mbk)[:, None],
                  (ck - Wb) + r[:, None] + np.arange(wk)[None, :], :Bk0] = \
                b.transpose(1, 2, 0)
            gP = np.full((mbk, BkP), -1, dtype=g.dtype)
            gP[:, :Bk0] = g.T
            host.append((band8, gP))
        if not shard:
            bands = tuple(jnp.asarray(b) for b, _ in host)
        else:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            if mesh is None:
                mesh = Mesh(np.asarray(jax.devices()), axis_names=("b",))
            nd = mesh.devices.size
            bands = []
            for b, g in host:
                pad = (-b.shape[2]) % nd
                if pad:
                    b = np.concatenate(
                        [b, np.zeros(b.shape[:2] + (pad,), b.dtype)], axis=2)
                bands.append(jax.device_put(
                    jnp.asarray(b), NamedSharding(mesh, P(None, None, "b"))))
            bands = tuple(bands)
        gidx = tuple(self._pad_gidx(host[i][1], bands[i].shape[2])
                     for i in range(len(host)))
        self._dev_cache[ck_key] = (bands, gidx)
        return bands, gidx

    @staticmethod
    def _pad_gidx(g, Bk):
        if Bk > g.shape[1]:
            g = np.concatenate(
                [g, np.full((g.shape[0], Bk - g.shape[1]), -1, g.dtype)],
                axis=1)
        return jnp.asarray(g)

    def device_put_mc(self):
        """v3 device layout for the width-paneled sliding-window kernel:
        width padded to a multiple of the panel size WP with the center
        column at ck = wk8 // 2 (a multiple of 8), rows pre-shifted by
        j % 8 as in device_put. Returns (bands, band_centers, gidx,
        meta) with meta[k] = (ck, WP); band_centers[k] is the 8-column
        center strip bands[k][:, ck:ck+8, :] (the only columns with
        intra-group sequential dependencies). Cached."""
        if "v3" in self._dev_cache:
            return self._dev_cache["v3"]
        from bigsnpr_tpu.pgs import gibbs_pallas as gp

        bands, centers, gidxs, meta = [], [], [], []
        for b, g in self.buckets:
            Bk0, mbk, wk = b.shape
            Wb = (wk - 1) // 2
            # v3's sliding-window DMAs slice rows of (NC, L, Bk) refs —
            # Mosaic requires the (full) lane extent of a sliced DMA to
            # be a multiple of 128. Pad wide buckets to 128-lane
            # multiples; tiny buckets keep the cheap padding and run
            # through the v2 kernel (full-dp scratch, whole-ref DMAs)
            if Bk0 > 32:
                BkP = -(-Bk0 // 128) * 128
            else:
                BkP = 8 if Bk0 <= 8 else -(-Bk0 // 64) * 64
            wk8, WP = gp.v3_width(Wb)
            ck = wk8 // 2
            band8 = np.zeros((mbk, wk8, BkP), dtype=b.dtype)
            r = np.arange(mbk) % 8
            band8[np.arange(mbk)[:, None],
                  (ck - Wb) + r[:, None] + np.arange(wk)[None, :], :Bk0] = \
                b.transpose(1, 2, 0)
            gP = np.full((mbk, BkP), -1, dtype=g.dtype)
            gP[:, :Bk0] = g.T
            bands.append(jnp.asarray(band8))
            centers.append(jnp.asarray(band8[:, ck:ck + 8, :]))
            gidxs.append(jnp.asarray(gP))
            meta.append((ck, WP))
        out = (tuple(bands), tuple(centers), tuple(gidxs), tuple(meta))
        self._dev_cache["v3"] = out
        return out


def block_layout(block_sizes):
    """(slot_of_global (m,), global_of_slot (B, mb), valid (B, mb)).

    Uniform layout helper kept for the dense single-bucket path and
    tests; the samplers use BlockBands."""
    sizes = np.asarray(block_sizes, dtype=np.int64)
    B, mb = len(sizes), int(sizes.max())
    m = int(sizes.sum())
    slot = np.empty(m, dtype=np.int64)
    gos = np.full((B, mb), -1, dtype=np.int64)
    start = 0
    for b, sz in enumerate(sizes):
        slot[start:start + sz] = b * mb + np.arange(sz)
        gos[b, :sz] = start + np.arange(sz)
        start += sz
    valid = gos >= 0
    return slot, gos, valid


def build_block_bands(corr, block_sizes, ind_corr=None, dtype=np.float32,
                      engine="coo"):
    """Per-block banded LD bucketed by (padded size, padded width).

    Returns a BlockBands. Each block keeps its own bandwidth; blocks are
    grouped so only a handful of array shapes get compiled.

    engine="coo" (default) builds the bands straight from the upper
    COO triplets with O(nnz) vectorized passes — no symmetrize, no
    per-block sparse slicing (the scipy path cost 340 s at 1M variants
    / 470M nnz, the COO path seconds). engine="scipy" keeps the old
    construction for parity testing."""
    if engine == "coo":
        return _build_block_bands_coo(corr, block_sizes, ind_corr, dtype)
    import scipy.sparse as sp

    sizes = np.asarray(block_sizes, dtype=np.int64)
    m2 = corr.shape[0]
    ind_corr = np.arange(m2) if ind_corr is None else np.asarray(ind_corr)
    assert sizes.sum() == len(ind_corr)
    # symmetrize ONCE, then contiguous csr slices per block (the old
    # per-block corr.subset() re-symmetrized the whole matrix for every
    # block: 342 s at 200K variants, ~1 s after this)
    S_all = corr.sym().tocsr()
    if len(ind_corr) != m2 or (np.diff(ind_corr) != 1).any():
        S_all = S_all[ind_corr][:, ind_corr].tocsr()
    # off-diagonal r^2 mass bookkeeping: what the block-diagonal
    # approximation drops at block boundaries (round-2 verdict #4)
    total_sq = float((S_all.data.astype(np.float64) ** 2).sum())
    diag_sq = float((S_all.diagonal().astype(np.float64) ** 2).sum())
    kept_sq = 0.0
    per_block = []
    start = 0
    for sz in sizes:
        blk = S_all[start:start + sz, start:start + sz].tocoo()
        kept_sq += float((blk.data.astype(np.float64) ** 2).sum())
        offs = blk.col - blk.row
        W = int(np.abs(offs).max()) if blk.nnz else 0
        band = np.zeros((int(sz), 2 * W + 1), dtype=dtype)
        band[blk.row, W + offs] = blk.data
        per_block.append((band, W, start))
        start += sz
    dropped_r2 = max(total_sq - kept_sq, 0.0)
    kept_r2 = max(kept_sq - diag_sq, 0.0)
    if dropped_r2 < 1e-9 * total_sq:
        # summation-order float noise, not real boundary mass: total_sq
        # and kept_sq sum the same entries in different orders (~1e-5
        # absolute at 470M-nnz bands) — boundary-aligned blocks must
        # report exactly 0.0
        dropped_r2 = 0.0

    groups = {}
    for band, W, gstart in per_block:
        key = (_round_up(band.shape[0]), _round_up(2 * W + 1))
        groups.setdefault(key, []).append((band, W, gstart))

    buckets = []
    for (mbk, wk), blocks_k in sorted(groups.items()):
        Wk = (wk - 1) // 2
        Bk = len(blocks_k)
        bands = np.zeros((Bk, mbk, 2 * Wk + 1), dtype=dtype)
        gidx = np.full((Bk, mbk), -1, dtype=np.int32)
        for b, (band, W, gstart) in enumerate(blocks_k):
            sz = band.shape[0]
            bands[b, :sz, Wk - W:Wk + W + 1] = band
            gidx[b, :sz] = gstart + np.arange(sz)
        buckets.append((bands, gidx))
    return BlockBands(buckets, int(sizes.sum()),
                      dropped_r2=dropped_r2, kept_r2=kept_r2)


def _build_block_bands_coo(corr, block_sizes, ind_corr=None,
                           dtype=np.float32):
    """COO-direct band build: O(nnz) vectorized passes over the upper
    triplets. Replaces symmetrize + per-block sparse slicing (340 s at
    1M variants) with block ids from the CSC column order, one
    segmented max (per-block widths), and ONE flat scatter into a
    single arena holding every bucket (dropped cross-block entries are
    routed to a sacrificial dump slot — no filtering pass). The whole
    build runs at host memory bandwidth."""
    sizes = np.asarray(block_sizes, dtype=np.int64)
    m2 = corr.shape[0]
    u = corr.upper.tocoo()          # CSC -> COO: column-sorted, i <= j
    lo = np.asarray(u.row)
    hi = np.asarray(u.col)
    x = np.asarray(u.data)
    del u
    if lo.size and (lo > hi).any():  # tolerate non-upper storage
        lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)

    if ind_corr is not None:
        ind_corr = np.asarray(ind_corr)
        assert sizes.sum() == len(ind_corr)
        if len(ind_corr) != m2 or (np.diff(ind_corr) != 1).any():
            posmap = np.full(m2, -1, dtype=lo.dtype)
            posmap[ind_corr] = np.arange(len(ind_corr), dtype=lo.dtype)
            lo = posmap[lo]
            hi = posmap[hi]
            keepm = (lo >= 0) & (hi >= 0)
            lo, hi, x = lo[keepm], hi[keepm], x[keepm]
            # a reordering subset can flip an upper entry to lower
            lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
    else:
        assert sizes.sum() == m2

    nb = len(sizes)
    starts = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(sizes, out=starts[1:])
    if lo.size == 0 or (np.diff(hi) >= 0).all():
        # CSC order: hi ascending -> block ids by boundary search over
        # nb values, expanded with one repeat (no 100M-wide searchsorted)
        bounds_e = np.searchsorted(hi, starts)
        bid = np.repeat(np.arange(nb, dtype=np.int32),
                        np.diff(bounds_e))
    else:                            # reordering subset scrambled hi: sort
        order = np.argsort(hi, kind="stable")
        lo, hi, x = lo[order], hi[order], x[order]
        bounds_e = np.searchsorted(hi, starts)
        bid = np.repeat(np.arange(nb, dtype=np.int32),
                        np.diff(bounds_e))
    inblk = lo >= starts[bid]       # same block iff lo past hi's start

    # off-diagonal r^2 bookkeeping over the SYMMETRIC matrix (off-diag
    # mass counted twice), matching the scipy path's semantics
    w2 = np.square(x)
    diagm = hi == lo
    total2 = 2.0 * float(w2.sum())
    diag_sq = float(w2[diagm].sum())
    kept2 = 2.0 * float(w2[inblk].sum())
    kept_diag = float(w2[inblk & diagm].sum())   # == diag_sq normally
    total_sq = total2 - diag_sq
    kept_sq = kept2 - kept_diag
    dropped_r2 = max(total_sq - kept_sq, 0.0)
    kept_r2 = max(kept_sq - kept_diag, 0.0)
    del w2, diagm

    off = hi - lo                    # index dtype (int32/int64 per scipy)

    # per-block bandwidth: segmented max over the contiguous per-block
    # entry ranges; dropped entries contribute 0
    Wb_arr = np.zeros(nb, dtype=np.int64)
    if off.size:
        offm = np.where(inblk, off, 0)
        cnt = np.diff(bounds_e)
        segmax = np.maximum.reduceat(
            offm, np.minimum(bounds_e[:-1], off.size - 1))
        Wb_arr[cnt > 0] = segmax[cnt > 0]
        del offm

    groups = {}
    for b in range(nb):
        key = (_round_up(int(sizes[b])), _round_up(2 * int(Wb_arr[b]) + 1))
        groups.setdefault(key, []).append(b)
    keys_sorted = sorted(groups.items())

    # one arena for all buckets + a trailing dump slot; per-block
    # gather tables stay cache-resident (nb entries)
    blk_base = np.empty(nb, dtype=np.int64)   # flat index of band[b, 0, Wk]
    blk_wk = np.empty(nb, dtype=np.int64)     # row stride (stored width)
    arena_off = []
    total = 0
    for (mbk, wk_key), blks in keys_sorted:
        Wk = (wk_key - 1) // 2
        wk = 2 * Wk + 1             # stored width is odd (center + W each way)
        arena_off.append(total)
        for b_loc, b in enumerate(blks):
            blk_base[b] = total + (b_loc * mbk) * wk + Wk
            blk_wk[b] = wk
        total += len(blks) * mbk * wk
    flat = np.zeros(total + 1, dtype=dtype)

    if off.size:
        x32 = x.astype(dtype, copy=False)
        # band[b, j, Wk + d] = R[j, j+d]: entry (lo, hi) lands at row hi
        # offset -off and mirrored at row lo offset +off (diagonal
        # entries write the same slot twice — harmless)
        stride = blk_wk[bid]
        base = blk_base[bid]
        base += (hi - starts[bid]) * stride
        dump = np.int64(total)
        np.subtract(base, off, where=inblk, out=base)
        base[~inblk] = dump
        flat[base] = x32
        base += np.multiply(2 * off, inblk)  # mirror; dump slot unmoved...
        base += (lo.astype(np.int64) - hi) * stride  # row hi -> row lo
        base[~inblk] = dump
        flat[base] = x32
    flat[total] = 0.0

    buckets = []
    for k, ((mbk, wk_key), blks) in enumerate(keys_sorted):
        Wk = (wk_key - 1) // 2
        wk = 2 * Wk + 1
        Bk = len(blks)
        bands = flat[arena_off[k]:arena_off[k] + Bk * mbk * wk] \
            .reshape(Bk, mbk, wk)
        gidx = np.full((Bk, mbk), -1, dtype=np.int32)
        for b_loc, b in enumerate(blks):
            sz = int(sizes[b])
            gidx[b_loc, :sz] = starts[b] + np.arange(sz)
        buckets.append((bands, gidx))
    return BlockBands(buckets, int(sizes.sum()),
                      dropped_r2=dropped_r2, kept_r2=kept_r2)


def auto_blocks(corr, ind_corr=None, max_block: int = 4096,
                thr_r2: float = 0.02, min_size: int = 32):
    """Derive LD-block sizes for the blocked samplers.

    1. Exact cuts: positions where no kept LD entry crosses — free and
       lossless (the band's running max reach closes).
    2. Oversized exact blocks are split with snp_ldsplit (dropping the
       small cross-block r², the reference's recommended practice for
       making LD block-diagonal before LDpred2-auto).
    Returns an int array of block sizes summing to len(ind_corr).
    """
    from bigsnpr_tpu.ops.corr import SparseLD
    from bigsnpr_tpu.ops.splitld import snp_ldsplit
    import scipy.sparse as sp

    m2 = corr.shape[0]
    ind_corr = np.arange(m2) if ind_corr is None else np.asarray(ind_corr)
    sub = corr.subset(ind_corr)
    S = sub.sym().tocoo()
    m = len(ind_corr)
    # furthest right-neighbor per column
    reach = np.zeros(m, dtype=np.int64)
    np.maximum.at(reach, S.row, S.col)
    np.maximum.at(reach, S.col, S.row)
    reach = np.maximum(reach, np.arange(m))
    run = np.maximum.accumulate(reach)
    cuts = np.nonzero(run == np.arange(m))[0] + 1  # exact block ends
    sizes = np.diff(np.r_[0, cuts])

    out = []
    start = 0
    for sz in sizes:
        if sz <= max_block:
            out.append(int(sz))
        else:
            blk = sub.subset(np.arange(start, start + sz))
            res = None
            err = None
            try:
                res = snp_ldsplit(
                    blk, thr_r2=thr_r2, min_size=min(min_size, sz),
                    max_size=max_block,
                    max_K=max(2, -(-sz // min(min_size, sz))),
                    max_cost=np.inf, max_r2=1.0)
            except Exception as e:  # noqa: BLE001 — surfaced below
                err = e
            if res is not None:
                best = res.iloc[int(np.argmin(res["cost"].to_numpy()))]
                out.extend(int(s) for s in best["all_size"])
            else:
                # fixed slabs cut straight through real LD — surface it
                # instead of failing silently (round-2 verdict #4)
                import warnings

                warnings.warn(
                    f"snp_ldsplit failed on a {sz}-variant LD block "
                    f"({type(err).__name__ if err else 'no result'}: {err}); "
                    f"falling back to fixed {max_block}-slabs that may cut "
                    f"through LD. Check dropped_r2_frac on the returned "
                    f"BlockBands.", RuntimeWarning, stacklevel=2)
                nb = -(-sz // max_block)
                slab = -(-sz // nb)
                rem = sz
                while rem > 0:
                    out.append(int(min(slab, rem)))
                    rem -= slab
        start += sz
    out = np.asarray(out, dtype=np.int64)
    assert out.sum() == m
    return out


# ---------------------------------------------------------------------------
# scatter / gather between global (m,) vectors and bucket slots
# ---------------------------------------------------------------------------

def _scatter_b(vals, gidx, fill=0.0):
    """(m,) global -> (mbk, Bk) bucket slots; `fill` at padding."""
    valid = gidx >= 0
    return jnp.where(valid, vals[jnp.clip(gidx, 0)], fill)


def _gather_set(out, vals, gidx):
    """Write bucket values (mbk, Bk) into global (m,) at valid slots."""
    m = out.shape[0]
    safe = jnp.where(gidx >= 0, gidx, m).reshape(-1)
    return out.at[safe].set(vals.reshape(-1), mode="drop")


def _sweep_gibbs_batched(dp, curr_beta, bands_t, bh, C2, C4, sqrt1pC1,
                         inv_odd_p, p, sparse, shrink_corr, no_jump_sign,
                         u, z, W):
    """One lockstep Gibbs sweep over a bucket in TPU-native layout.

    Layout: blocks live in the LANE axis, the band width in sublanes —
    bands_t (mbk, wk, Bk), dp (mbk + wk - 1, Bk), all per-variant
    vectors (mbk, Bk). The scan then slices its leading axis natively
    and dp updates are leading-dim dynamic slices; the previous
    vmap-over-blocks layout made every step a lane-dim dynamic
    slice/update — measured ~1.6 ms/step on chip vs ~us-class here
    (the round-3 Gibbs TPU measurement: 31 variant-steps/ms, ~200x off
    the reference's CPU loops — this layout is the fix)."""
    sqrtC4 = jnp.sqrt(C4)
    mbk = bands_t.shape[0]
    ind = jnp.arange(mbk, dtype=jnp.int32)

    def step(carry, xs):
        dp, cur_h2_inc, gap = carry
        j2, bh_j, c2, c4, s1c1, sc4, band_row, u_j, z_j, cb_j = xs
        width = band_row.shape[0]                    # (wk8, Bk)
        j0 = (j2 // 8) * 8                           # row j shifted by j%8
        dp_slice = jax.lax.dynamic_slice(
            dp, (j0, 0), (width, dp.shape[1]))       # (wk8, Bk)
        dotprod = jax.lax.dynamic_slice(
            dp, (j2 + W, 0), (1, dp.shape[1]))[0]    # (Bk,)
        res = bh_j - shrink_corr * (dotprod - cb_j)
        C3 = c2 * res
        postp = 1.0 / (1.0 + inv_odd_p * s1c1 *
                       jnp.exp(-C3 * C3 / c4 * 0.5))
        samp = C3 + z_j * sc4
        accept = postp > u_j
        sparse_skip = sparse & (postp < p)
        jump = no_jump_sign & (samp * cb_j < 0)
        sampled = accept & ~sparse_skip & ~jump
        new_beta = jnp.where(sampled, samp, 0.0)

        dotprod_shrunk = shrink_corr * dotprod + (1 - shrink_corr) * cb_j
        diff = new_beta - cb_j
        dp = jax.lax.dynamic_update_slice(
            dp, dp_slice + diff[None, :] * band_row, (j0, 0))
        cur_h2_inc = cur_h2_inc + jnp.sum(diff * (2 * dotprod_shrunk + diff))
        gap = gap + jnp.sum(jnp.where(sampled, samp * samp, 0.0))

        avg_postp_inc = jnp.where(sparse_skip, 0.0, postp)
        avg_beta_inc = jnp.where(sparse_skip, 0.0, C3 * postp)
        ys = (new_beta, sampled, avg_postp_inc, avg_beta_inc, dotprod_shrunk)
        return (dp, cur_h2_inc, gap), ys

    xs = (ind, bh, C2, C4, sqrt1pC1, sqrtC4, bands_t, u, z, curr_beta)
    (dp, h2_inc, gap), (new_beta, causal, postp_inc, beta_inc,
                        dps) = jax.lax.scan(
        step, (dp, jnp.asarray(0.0, dp.dtype), jnp.asarray(0.0, dp.dtype)),
        xs)
    return dp, new_beta, (gap, causal, h2_inc, postp_inc, beta_inc, dps)


def _sweeps_bucketed(bands, gidx, dp_pads, curr_beta, consts, u, z,
                     inv_odd_p, p, sparse, shrink_corr, no_jump_sign, m,
                     use_pallas=False):
    """One full Gibbs sweep over all buckets.

    bands/gidx are device_put's transposed buckets: bands_t
    (mbk, wk, Bk), gidx_t (mbk, Bk). consts = (bh, C2, C4, s1) as
    global (m,) vectors; per-variant ys are gathered back into global
    (m,) vectors, scalar aux summed.

    use_pallas: run each bucket's sweep as the Pallas TPU kernel
    (gibbs_pallas) — same math, dp resident in VMEM."""
    bh, C2, C4, s1 = consts
    gap = jnp.asarray(0.0, bands[0].dtype)
    h2_inc = jnp.asarray(0.0, bands[0].dtype)
    flats = {"nb": [], "postp": [], "beta": [], "dps": [], "causal": []}
    dp2 = []
    for k, (bk, gk) in enumerate(zip(bands, gidx)):
        Wk = (bk.shape[1] - 8) // 2      # center offset CK (see device_put)
        if use_pallas:
            from bigsnpr_tpu.pgs import gibbs_pallas as gp

            xin = gp.build_xin(
                _scatter_b(bh, gk), _scatter_b(C2, gk),
                _scatter_b(C4, gk, 1.0), _scatter_b(s1, gk, 1.0),
                _scatter_b(u, gk, 2.0), _scatter_b(z, gk),
                _scatter_b(curr_beta, gk), inv_odd_p, p, shrink_corr,
                sparse)
            ys, dpk, h2k, gapk = gp.sweep_bucket_pallas(
                bk, xin, dp_pads[k], Wk, bool(no_jump_sign))
            nbk = ys[:, 0, :]
            causalk = ys[:, 1, :] != 0
            postpk = ys[:, 2, :]
            betak = ys[:, 3, :]
            dpsk = ys[:, 4, :]
        else:
            dpk, nbk, aux = _sweep_gibbs_batched(
                dp_pads[k], _scatter_b(curr_beta, gk), bk,
                _scatter_b(bh, gk), _scatter_b(C2, gk),
                _scatter_b(C4, gk, 1.0), _scatter_b(s1, gk, 1.0),
                inv_odd_p, p, sparse, shrink_corr, no_jump_sign,
                _scatter_b(u, gk, 2.0), _scatter_b(z, gk), Wk)
            gapk, causalk, h2k, postpk, betak, dpsk = aux
        dp2.append(dpk)
        flats["nb"].append(nbk.reshape(-1))
        flats["postp"].append(postpk.reshape(-1))
        flats["beta"].append(betak.reshape(-1))
        flats["dps"].append(dpsk.reshape(-1))
        flats["causal"].append(causalk.reshape(-1))
        gap = gap + gapk
        h2_inc = h2_inc + h2k
    # slot -> global via one inverse-permutation gather per array (TPU
    # scatters dominated the sweep wall; see _sweeps_bucketed_mc)
    idx_all = jnp.concatenate([gk.reshape(-1) for gk in gidx])
    safe = jnp.where(idx_all >= 0, idx_all, m)
    pos = jnp.zeros((m + 1,), jnp.int32).at[safe].set(
        jnp.arange(idx_all.shape[0], dtype=jnp.int32), mode="drop")[:m]
    take = (lambda name: jnp.concatenate(flats[name])[pos]
            if len(flats[name]) > 1 else flats[name][0][pos])
    nb_g = take("nb")
    postp_g = take("postp")
    beta_g = take("beta")
    dps_g = take("dps")
    causal_g = take("causal")
    return tuple(dp2), nb_g, (gap, causal_g, h2_inc, postp_g, beta_g, dps_g)


def _dp0(bands):
    """Zero dp state per transposed bucket: (mbk + wk8, Bk)."""
    return tuple(jnp.zeros((b.shape[0] + b.shape[1], b.shape[2]),
                           b.dtype) for b in bands)


# ---------------------------------------------------------------------------
# Chain-batched sweeps: NC auto chains / grid cells in one program
# ---------------------------------------------------------------------------
#
# The reference's main parallelism is the process grid over chains /
# grid models (R/LDpred2.R:100-114,233-236: 30 auto chains, 21 grid
# cells via %dopar%). Here the chains share the LD band exactly — only
# xin/dp/per-variant state differ — so a leading chain axis NC batches
# them through the same band tiles: Pallas multi-chain kernel on TPU,
# vmap over chains on the XLA twin. RNG streams per chain are identical
# to the per-chain loop (same fold_in(keys[c], k) key chain), so the
# batched samplers agree with the serial ones bit-for-bit.


def _dp0_mc(bands, NC):
    """Zero dp state per bucket, chain-batched: (NC, mbk + wk8, Bk)."""
    return tuple(jnp.zeros((NC, b.shape[0] + b.shape[1], b.shape[2]),
                           b.dtype) for b in bands)


def _sweeps_bucketed_mc(bands, gidx, dp_pads, curr_beta, consts, u, z,
                        inv_odd_p, p, sparse_vec, shrink_corr,
                        no_jump_sign, m, use_pallas=False, bcs=None,
                        meta=None):
    """One full Gibbs sweep over all buckets for NC chains at once.

    curr_beta/u/z: (NC, m); consts = (bh (m,), C2, C4, s1 each (NC, m));
    inv_odd_p/p: (NC,); sparse_vec: bool (NC,). With bcs/meta (from
    BlockBands.device_put_mc) the v3 width-paneled kernel runs;
    otherwise the v2 full-dp kernel (device_put layout). Returns
    per-bucket dp2 (NC, L, Bk), nb (NC, m), and aux with per-chain
    reductions."""
    bh, C2, C4, s1 = consts
    NC = curr_beta.shape[0]
    dt = bands[0].dtype
    gap = jnp.zeros((NC,), dt)
    h2_inc = jnp.zeros((NC,), dt)
    scat = jax.vmap(_scatter_b, in_axes=(0, None))
    scat1 = jax.vmap(lambda v, g: _scatter_b(v, g, 1.0), in_axes=(0, None))
    scat2 = jax.vmap(lambda v, g: _scatter_b(v, g, 2.0), in_axes=(0, None))
    flats = {"nb": [], "postp": [], "beta": [], "dps": [], "causal": []}
    dp2 = []
    for k, (bk, gk) in enumerate(zip(bands, gidx)):
        # center column: ck in the v3 layout, (wk8-8)//2 in device_put's
        Wk = meta[k][0] if meta is not None else (bk.shape[1] - 8) // 2
        cbk = scat(curr_beta, gk)        # (NC, mbk, Bk)
        plan = None
        v3 = False
        if use_pallas:
            from bigsnpr_tpu.pgs import gibbs_pallas as gp

            mbk, wk8, Bk = bk.shape
            L = dp_pads[k].shape[1]
            dtb = bk.dtype
            isz = jnp.dtype(dtb).itemsize
            if meta is not None:
                plan = gp.plan_v3(mbk, wk8, Bk, L, NC, meta[k][1],
                                  itemsize=isz)
                v3 = plan is not None
            if plan is None:
                # small/unaligned bucket: v2 kernel works on either
                # layout given the explicit center column Wk
                plan = gp.plan_mc(mbk, wk8, Bk, L, NC, itemsize=isz)
        if plan is not None:
            ones = jnp.ones((NC, mbk, Bk), dtb)
            c4b = scat1(C4, gk)
            rows = [scat(jnp.broadcast_to(bh, (NC, m)), gk), scat(C2, gk),
                    c4b, scat1(s1, gk), jnp.sqrt(c4b),
                    scat2(u, gk), scat(z, gk), cbk,
                    ones * inv_odd_p[:, None, None],
                    ones * p[:, None, None],
                    ones * jnp.asarray(shrink_corr, dtb),
                    ones * sparse_vec.astype(dtb)[:, None, None]]
            rows += [jnp.zeros((NC, mbk, Bk), dtb)] * (gp.NIN - len(rows))
            # (NIN, NC, mbk, Bk) -> (mbk, NC, NIN, Bk)
            xin = jnp.stack(rows, axis=0).transpose(2, 1, 0, 3)
            interp = jax.default_backend() != "tpu"
            if v3:
                LT, NCT = plan

                def call(bsl, xsl, dsl, lt0, k=k, LT=LT):
                    csl = jax.lax.slice(
                        bcs[k], (0, 0, lt0), (mbk, 8, lt0 + LT))
                    return gp.sweep_bucket_pallas_v3(
                        bsl, csl, xsl, dsl, meta[k][0], meta[k][1],
                        bool(no_jump_sign), interpret=interp)
            else:
                LT, RG, NCT = plan

                def call(bsl, xsl, dsl, lt0, RG=RG):
                    return gp.sweep_bucket_pallas_mc(
                        bsl, xsl, dsl, Wk, RG, bool(no_jump_sign),
                        interpret=interp)

            lane_parts = []
            for lt0 in range(0, Bk, LT):
                chain_parts = []
                for c0 in range(0, NC, NCT):
                    c1 = min(c0 + NCT, NC)
                    ys_p, dp_p, h2_p, gap_p = call(
                        jax.lax.slice(bk, (0, 0, lt0),
                                      (mbk, wk8, lt0 + LT)),
                        jax.lax.slice(xin, (0, c0, 0, lt0),
                                      (mbk, c1, gp.NIN, lt0 + LT)),
                        jax.lax.slice(dp_pads[k], (c0, 0, lt0),
                                      (c1, L, lt0 + LT)),
                        lt0)
                    chain_parts.append((ys_p, dp_p, h2_p, gap_p))
                lane_parts.append(tuple(
                    jnp.concatenate([cp[i] for cp in chain_parts],
                                    axis=1 if i == 0 else 0)
                    for i in range(4)))
            ys = jnp.concatenate([lp[0] for lp in lane_parts], axis=3)
            dpk = jnp.concatenate([lp[1] for lp in lane_parts], axis=2)
            h2k = sum(jnp.sum(lp[2], axis=1) for lp in lane_parts)
            gapk = sum(jnp.sum(lp[3], axis=1) for lp in lane_parts)
            yst = ys.transpose(1, 0, 2, 3)       # (NC, mbk, NOUT, Bk)
            nbk = yst[:, :, 0, :]
            causalk = yst[:, :, 1, :] != 0
            postpk = yst[:, :, 2, :]
            betak = yst[:, :, 3, :]
            dpsk = yst[:, :, 4, :]
        else:
            run = jax.vmap(
                _sweep_gibbs_batched,
                in_axes=(0, 0, None, None, 0, 0, 0, 0, 0, 0, None, None,
                         0, 0, None))
            dpk, nbk, aux = run(
                dp_pads[k], cbk, bk, _scatter_b(bh, gk), scat(C2, gk),
                scat1(C4, gk), scat1(s1, gk), inv_odd_p, p, sparse_vec,
                shrink_corr, no_jump_sign, scat2(u, gk), scat(z, gk), Wk)
            gapk, causalk, h2k, postpk, betak, dpsk = aux
        dp2.append(dpk)
        flats["nb"].append(nbk.reshape(NC, -1))
        flats["postp"].append(postpk.reshape(NC, -1))
        flats["beta"].append(betak.reshape(NC, -1))
        flats["dps"].append(dpsk.reshape(NC, -1))
        flats["causal"].append(causalk.reshape(NC, -1))
        gap = gap + gapk
        h2_inc = h2_inc + h2k
    # slot -> global via ONE inverse-permutation GATHER per array instead
    # of five per-chain scatters per bucket: TPU scatter ran ~65 ms/sweep
    # at 30 x 131K slots and was the entire auto-vs-grid batched gap
    # (round-5 on-chip isolation: grid 56 / auto-noMLE 121 ms/sweep);
    # pos costs one m-sized scatter, the five (NC, m) takes are
    # vectorized loads
    idx_all = jnp.concatenate([gk.reshape(-1) for gk in gidx])
    safe = jnp.where(idx_all >= 0, idx_all, m)
    pos = jnp.zeros((m + 1,), jnp.int32).at[safe].set(
        jnp.arange(idx_all.shape[0], dtype=jnp.int32), mode="drop")[:m]
    take = (lambda name: jnp.concatenate(flats[name], axis=1)[:, pos]
            if len(flats[name]) > 1 else flats[name][0][:, pos])
    nb_g = take("nb")
    postp_g = take("postp")
    beta_g = take("beta")
    dps_g = take("dps")
    causal_g = take("causal")
    # barrier: returning the raw gather results from the per-sweep jit
    # triggers a pathological XLA rewrite on the tunnel runtime (measured
    # 925 ms vs 14 ms per NC=1 sweep, round-4); the barrier pins them as
    # ordinary materialized outputs
    nb_g, postp_g, beta_g, dps_g, causal_g = jax.lax.optimization_barrier(
        (nb_g, postp_g, beta_g, dps_g, causal_g))
    return tuple(dp2), nb_g, (gap, causal_g, h2_inc, postp_g, beta_g, dps_g)


def gibbs_one_blocked(bands, gidx, beta_hat, n_vec, h2, p, sparse, key,
                      burn_in, num_iter, m, use_pallas=False):
    """Block-parallel ldpred2_gibbs_one. bands/gidx from
    BlockBands.device_put(); beta_hat/n_vec are (m,) in global order.
    Returns (m,) avg betas (NaN on divergence).

    use_pallas runs a host-driven loop of async-chained per-sweep
    programs: the tunnel-attached TPU runtime serializes XLA while-loop
    iterations around custom calls (~0.5 s/sweep measured), while
    chained dispatches pipeline at the true ~13 ms/sweep."""
    if not use_pallas:
        return _gibbs_one_blocked_xla(
            bands, gidx, beta_hat, n_vec, h2, p, sparse, key,
            burn_in=burn_in, num_iter=num_iter, m=m)
    dt = beta_hat.dtype
    # k lives in device state: per-sweep host->device puts sync on the
    # tunnel runtime (~0.5 s each measured) and would serialize the loop
    state = (_dp0(bands), jnp.zeros(m, dt), jnp.zeros(m, dt),
             jnp.asarray(False), jnp.asarray(0, jnp.int32))
    burn_in_d = jnp.asarray(burn_in, jnp.int32)
    for _ in range(burn_in + num_iter):
        state = _one_sweep_prog(
            bands, gidx, state, beta_hat, n_vec, h2, p, sparse, key,
            burn_in_d, m=m)
    _, _, avg, diverged, _ = state
    return jnp.where(diverged, jnp.nan, avg / num_iter)


@partial(jax.jit, static_argnames=("m",))
def _one_sweep_prog(bands, gidx, state, beta_hat, n_vec, h2, p, sparse,
                    key, burn_in, m):
    """One Gibbs sweep for the host-driven loop (k carried in device
    state: one compile, no per-sweep host transfers). Divergence
    freezing is mask-based instead of lax.cond — identical results
    (post-divergence values are discarded as NaN anyway)."""
    dp_pads, curr_beta, avg_beta, diverged, k = state
    h2_per_var = h2 / (m * p)
    inv_odd_p = (1 - p) / p
    C1 = h2_per_var * n_vec
    C2 = 1.0 / (1.0 + 1.0 / C1)
    C4 = C2 / n_vec
    s1 = jnp.sqrt(1 + C1)
    gap0 = 2.0 * jnp.sum(beta_hat**2)

    ku, kz = jax.random.split(jax.random.fold_in(key, k))
    u = jax.random.uniform(ku, (m,), dtype=beta_hat.dtype)
    z = jax.random.normal(kz, (m,), dtype=beta_hat.dtype)
    dp2, nb, aux = _sweeps_bucketed(
        bands, gidx, dp_pads, curr_beta, (beta_hat, C2, C4, s1), u, z,
        inv_odd_p, p, sparse, 1.0, False, m, use_pallas=True)
    gap, _, _, _, beta_inc, _ = aux
    post = (k >= burn_in) & ~diverged
    avg2 = avg_beta + jnp.where(post, beta_inc, 0.0)
    return dp2, nb, avg2, diverged | (gap > gap0), k + 1


@partial(jax.jit, static_argnames=("burn_in", "num_iter", "m"))
def _gibbs_one_blocked_xla(bands, gidx, beta_hat, n_vec, h2, p, sparse, key,
                           burn_in, num_iter, m, use_pallas=False):
    """Block-parallel ldpred2_gibbs_one. bands/gidx from
    BlockBands.device_put(); beta_hat/n_vec are (m,) in global order.
    Returns (m,) avg betas (NaN on divergence)."""
    h2_per_var = h2 / (m * p)
    inv_odd_p = (1 - p) / p
    C1 = h2_per_var * n_vec
    C2 = 1.0 / (1.0 + 1.0 / C1)
    C4 = C2 / n_vec
    s1 = jnp.sqrt(1 + C1)
    gap0 = 2.0 * jnp.sum(beta_hat**2)
    consts = (beta_hat, C2, C4, s1)

    def body(k, state):
        dp_pads, curr_beta, avg_beta, diverged = state

        def run(_):
            ku, kz = jax.random.split(jax.random.fold_in(key, k))
            u = jax.random.uniform(ku, (m,), dtype=beta_hat.dtype)
            z = jax.random.normal(kz, (m,), dtype=beta_hat.dtype)
            dp2, nb, aux = _sweeps_bucketed(
                bands, gidx, dp_pads, curr_beta, consts, u, z,
                inv_odd_p, p, sparse, 1.0, False, m,
                use_pallas=use_pallas)
            gap, _, _, _, beta_inc, _ = aux
            post = k >= burn_in
            avg2 = avg_beta + jnp.where(post, beta_inc, 0.0)
            return dp2, nb, avg2, gap > gap0

        return jax.lax.cond(diverged, lambda _: state, run, operand=None)

    dt = beta_hat.dtype
    state0 = (_dp0(bands), jnp.zeros(m, dt), jnp.zeros(m, dt), False)
    _, _, avg, diverged = jax.lax.fori_loop(0, burn_in + num_iter, body,
                                            state0)
    return jnp.where(diverged, jnp.nan, avg / num_iter)


def _multi_sweep_body(bands, gidx, state, beta_hat, n_vec, h2, p, sparse_vec,
                      keys, burn_in, m, use_pallas, bcs=None, meta=None):
    """One chain-batched grid-cell sweep: h2/p/sparse_vec are (NC,) —
    each cell runs its own (h2, p, sparse) with its own key stream,
    bit-identical to the per-cell gibbs_one_blocked loop."""
    dp_pads, curr_beta, avg_beta, diverged, k = state
    dt = beta_hat.dtype
    h2_per_var = h2 / (m * p)                         # (NC,)
    inv_odd_p = (1 - p) / p
    C1 = h2_per_var[:, None] * n_vec[None, :]         # (NC, m)
    C2 = 1.0 / (1.0 + 1.0 / C1)
    C4 = C2 / n_vec[None, :]
    s1 = jnp.sqrt(1 + C1)
    gap0 = 2.0 * jnp.sum(beta_hat**2)

    def draw(kc):
        ku, kz = jax.random.split(jax.random.fold_in(kc, k))
        return (jax.random.uniform(ku, (m,), dtype=dt),
                jax.random.normal(kz, (m,), dtype=dt))

    u, z = jax.vmap(draw)(keys)
    dp2, nb, aux = _sweeps_bucketed_mc(
        bands, gidx, dp_pads, curr_beta, (beta_hat, C2, C4, s1), u, z,
        inv_odd_p, p, sparse_vec, 1.0, False, m, use_pallas=use_pallas,
        bcs=bcs, meta=meta)
    gap, _, _, _, beta_inc, _ = aux
    post = (k >= burn_in) & ~diverged                 # (NC,)
    avg2 = avg_beta + jnp.where(post[:, None], beta_inc, 0.0)
    return dp2, nb, avg2, diverged | (gap > gap0), k + 1


@partial(jax.jit, static_argnames=("m", "use_pallas", "meta"))
def _multi_sweep_prog(bands, gidx, state, beta_hat, n_vec, h2, p, sparse_vec,
                      keys, burn_in, bcs, m, use_pallas, meta):
    return _multi_sweep_body(bands, gidx, state, beta_hat, n_vec, h2, p,
                             sparse_vec, keys, burn_in, m, use_pallas,
                             bcs=bcs, meta=meta)


@partial(jax.jit, static_argnames=("burn_in", "num_iter", "m"))
def _gibbs_multi_blocked_xla(bands, gidx, beta_hat, n_vec, h2, p, sparse_vec,
                             keys, burn_in, num_iter, m):
    NC = h2.shape[0]
    dt = beta_hat.dtype
    state0 = (_dp0_mc(bands, NC), jnp.zeros((NC, m), dt),
              jnp.zeros((NC, m), dt), jnp.zeros((NC,), bool),
              jnp.asarray(0, jnp.int32))

    def body(_, state):
        return _multi_sweep_body(bands, gidx, state, beta_hat, n_vec, h2, p,
                                 sparse_vec, keys,
                                 jnp.asarray(burn_in, jnp.int32), m,
                                 use_pallas=False)

    _, _, avg, diverged, _ = jax.lax.fori_loop(0, burn_in + num_iter, body,
                                               state0)
    return jnp.where(diverged[:, None], jnp.nan, avg / num_iter)


def gibbs_multi_blocked(bands, gidx, beta_hat, n_vec, h2_vec, p_vec,
                        sparse_vec, keys, burn_in, num_iter, m,
                        use_pallas=False, bcs=None, meta=None):
    """Chain-batched gibbs_one_blocked over NC grid cells: h2_vec/p_vec
    (NC,) float, sparse_vec (NC,) bool, keys (NC,) PRNG keys. Returns
    (NC, m) avg betas (NaN rows on divergence). On TPU (use_pallas) the
    cells run through one host-driven loop of Pallas multi-chain sweeps;
    otherwise one XLA fori_loop with chains vmapped."""
    if not use_pallas:
        return _gibbs_multi_blocked_xla(
            bands, gidx, beta_hat, n_vec, h2_vec, p_vec, sparse_vec, keys,
            burn_in=burn_in, num_iter=num_iter, m=m)
    NC = h2_vec.shape[0]
    dt = beta_hat.dtype
    state = (_dp0_mc(bands, NC), jnp.zeros((NC, m), dt),
             jnp.zeros((NC, m), dt), jnp.zeros((NC,), bool),
             jnp.asarray(0, jnp.int32))
    burn_in_d = jnp.asarray(burn_in, jnp.int32)
    for _ in range(burn_in + num_iter):
        state = _multi_sweep_prog(bands, gidx, state, beta_hat, n_vec,
                                  h2_vec, p_vec, sparse_vec, keys,
                                  burn_in_d, bcs, m=m, use_pallas=True,
                                  meta=meta)
    _, _, avg, diverged, _ = state
    return jnp.where(diverged[:, None], jnp.nan, avg / num_iter)


def _multi_auto_sweep_body(bands, gidx, state, beta_hat, n_vec, log_var,
                           keys, shrink_corr, p_bounds, alpha_bounds,
                           mean_ld, burn_in, m, report_step, num_reports,
                           use_mle, no_jump_sign, use_pallas, bcs=None,
                           meta=None):
    """One chain-batched auto sweep: all hyper-parameters are (NC,),
    per-variant state (NC, m); beta/Poisson/MLE draws vmapped over the
    per-chain key streams (bit-identical to the per-chain loop)."""
    (dp_pads, curr_beta, p, cur_h2_est, par_alpha, par_sigma2,
     avg_postp, avg_beta, avg_bhat, samples, paths, diverged, k) = state
    dt = beta_hat.dtype
    NC = curr_beta.shape[0]
    gap0 = 2.0 * jnp.sum(beta_hat**2)

    inv_odd_p = (1 - p) / p
    scale_freq = (jnp.exp(par_alpha[:, None] * log_var[None, :]) if use_mle
                  else jnp.ones((NC, m), dt))
    C1 = scale_freq * par_sigma2[:, None] * n_vec[None, :]
    C2 = 1.0 / (1.0 + 1.0 / C1)
    C4 = C2 / n_vec[None, :]
    s1 = jnp.sqrt(1 + C1)

    def draw(kc):
        ku, kz, kp, kb = jax.random.split(jax.random.fold_in(kc, k), 4)
        return (jax.random.uniform(ku, (m,), dtype=dt),
                jax.random.normal(kz, (m,), dtype=dt), kp, kb)

    u, z, kps, kbs = jax.vmap(draw)(keys)
    dp2, nb, aux = _sweeps_bucketed_mc(
        bands, gidx, dp_pads, curr_beta, (beta_hat, C2, C4, s1), u, z,
        inv_odd_p, p, jnp.zeros((NC,), bool), shrink_corr, no_jump_sign,
        m, use_pallas=use_pallas, bcs=bcs, meta=meta)
    gap, causal, h2_inc, postp_inc, beta_inc, dps = aux
    ok = ~diverged                                    # prior-sweep state
    div2 = diverged | (gap > gap0)

    post = (k >= burn_in) & ok
    pm = post[:, None]
    avg_postp2 = avg_postp + jnp.where(pm, postp_inc, 0.0)
    avg_beta2 = avg_beta + jnp.where(pm, beta_inc, 0.0)
    avg_bhat2 = avg_bhat + jnp.where(pm, dps, 0.0)

    nb_causal = jnp.sum(causal, axis=1)               # (NC,)
    p2 = jax.vmap(lambda kc, a, b: _beta_draw(kc, a, b, dtype=dt))(
        kps, 1 + nb_causal / mean_ld, 1 + (m - nb_causal) / mean_ld)
    p2 = jnp.clip(p2, p_bounds[0], p_bounds[1])
    p2 = jnp.where(ok, p2, p)
    h2_est2 = jnp.where(ok, cur_h2_est + h2_inc, cur_h2_est)
    h2 = jnp.maximum(h2_est2, MIN_H2)

    if use_mle:
        def mle(kb, ca, beta2, pa0, ps0):
            wts = _poisson1(kb, (m,), dt) * ca
            return _mle_alpha_profile(pa0, ps0, wts, log_var, beta2,
                                      alpha_bounds)

        pa, ps = jax.vmap(mle)(kbs, causal.astype(dt), nb * nb,
                               par_alpha, par_sigma2)
        # barrier: without it XLA fuses the O(m)-reduction MLE into its
        # scalar consumers (paths update) and recomputes it per element
        # (measured 1,615 -> 18 ms/sweep on chip, round-4)
        pa, ps = jax.lax.optimization_barrier((pa, ps))
        pa = jnp.where(ok, pa, par_alpha)
        ps = jnp.where(ok, ps, par_sigma2)
    else:
        pa = par_alpha
        ps = jnp.where(ok, h2 / (m * p2), par_sigma2)

    vals = jnp.stack([p2, h2, pa - 1.0], axis=1)[:, :, None]  # (NC, 3, 1)
    paths2 = jax.lax.dynamic_update_slice(
        paths, vals.astype(paths.dtype), (0, 0, k))
    paths2 = jnp.where(div2[:, None, None], paths, paths2)

    if num_reports > 0:
        rep_idx = (k - burn_in + 1) // report_step - 1
        do_rep = (k >= burn_in) & ((k - burn_in + 1) % report_step == 0)
        row = jnp.where(causal & ~div2[:, None], nb, 0.0)[:, None, :]
        samples2 = jax.lax.cond(
            do_rep,
            lambda s: jnp.where(
                div2[:, None, None], s,
                jax.lax.dynamic_update_slice(
                    s, row, (0, jnp.clip(rep_idx, 0, num_reports - 1), 0))),
            lambda s: s, samples)
    else:
        samples2 = samples

    return (dp2, nb, p2, h2_est2, pa, ps, avg_postp2, avg_beta2,
            avg_bhat2, samples2, paths2, div2, k + 1)


@partial(jax.jit, static_argnames=("m", "report_step", "num_reports",
                                   "use_mle", "no_jump_sign", "use_pallas",
                                   "meta"))
def _multi_auto_sweep_prog(bands, gidx, state, beta_hat, n_vec, log_var,
                           keys, shrink_corr, p_bounds, alpha_bounds,
                           mean_ld, burn_in, bcs, m, report_step,
                           num_reports, use_mle, no_jump_sign, use_pallas,
                           meta):
    return _multi_auto_sweep_body(
        bands, gidx, state, beta_hat, n_vec, log_var, keys, shrink_corr,
        p_bounds, alpha_bounds, mean_ld, burn_in, m, report_step,
        num_reports, use_mle, no_jump_sign, use_pallas, bcs=bcs,
        meta=meta)


def gibbs_auto_blocked_multi(bands, gidx, beta_hat, n_vec, log_var, p_inits,
                             h2_init, keys, shrink_corr, p_bounds,
                             alpha_bounds, mean_ld, burn_in, num_iter, m,
                             report_step=None, use_mle=True,
                             no_jump_sign=False, use_pallas=False,
                             bcs=None, meta=None, chain_mesh=None):
    """Chain-batched ldpred2_gibbs_auto: p_inits (NC,), keys (NC,) PRNG
    keys. All NC chains advance through one program per sweep (the
    reference's 30-process chain grid, R/LDpred2.R:233-236, collapsed
    onto one chip). Returns a dict of (NC, ...) arrays.

    chain_mesh: optional 1-D Mesh with axis 'c' — the chain axis of all
    state is sharded over its devices (chains are embarrassingly
    parallel; per-chain reductions stay on-shard, so GSPMD inserts no
    sweep-loop collectives and results agree with the single-device
    chain-batched program to f32 round-off — fusion-level rounding only,
    identical sweep trajectories). Uses the XLA sweep twin."""
    NC = p_inits.shape[0]
    num_iter_tot = burn_in + num_iter
    if report_step is None:
        report_step = num_iter + 1
    num_reports = num_iter // report_step if report_step <= num_iter else 0
    dt = beta_hat.dtype
    h2_0 = jnp.maximum(jnp.asarray(h2_init, dt), MIN_H2)
    p_0 = jnp.clip(jnp.asarray(p_inits, dt), p_bounds[0], p_bounds[1])
    state = (
        _dp0_mc(bands, NC), jnp.zeros((NC, m), dt), p_0,
        jnp.zeros((NC,), dt), jnp.zeros((NC,), dt), h2_0 / (m * p_0),
        jnp.zeros((NC, m), dt), jnp.zeros((NC, m), dt),
        jnp.zeros((NC, m), dt),
        jnp.zeros((NC, max(num_reports, 1), m), dt),
        jnp.full((NC, 3, num_iter_tot), jnp.nan, dt),
        jnp.zeros((NC,), bool), jnp.asarray(0, jnp.int32),
    )
    burn_in_d = jnp.asarray(burn_in, jnp.int32)
    if chain_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert not use_pallas, "chain sharding uses the XLA sweep twin"
        assert NC % chain_mesh.devices.size == 0, (
            f"{NC} chains must divide the {chain_mesh.devices.size}-device "
            "chain mesh")

        def _shard(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == NC:
                spec = P("c", *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(chain_mesh, spec))
            return x

        state = jax.tree_util.tree_map(_shard, state)
        keys = jax.device_put(keys, NamedSharding(chain_mesh, P("c", None)))
    args = (beta_hat, n_vec, log_var, keys, shrink_corr, p_bounds,
            alpha_bounds, mean_ld)
    kw = dict(m=m, report_step=report_step, num_reports=num_reports,
              use_mle=use_mle, no_jump_sign=no_jump_sign)
    if use_pallas:
        for _ in range(num_iter_tot):
            state = _multi_auto_sweep_prog(bands, gidx, state, *args,
                                           burn_in_d, bcs, use_pallas=True,
                                           meta=meta, **kw)
    else:
        state = _gibbs_auto_blocked_xla_mc(
            bands, gidx, state, *args, burn_in_d,
            num_iter_tot=num_iter_tot, **kw)
    (_, _, _, _, _, _, avg_postp, avg_beta, avg_bhat, samples, paths,
     diverged, _) = state
    nan = jnp.where(diverged[:, None], jnp.nan, 0.0)
    return {
        "beta_est": avg_beta / num_iter + nan,
        "postp_est": avg_postp / num_iter + nan,
        "corr_est": avg_bhat / num_iter + nan,
        "sample_beta": samples,
        "path_p_est": paths[:, 0], "path_h2_est": paths[:, 1],
        "path_alpha_est": paths[:, 2],
    }


@partial(jax.jit, static_argnames=("m", "report_step", "num_reports",
                                   "use_mle", "no_jump_sign",
                                   "num_iter_tot"))
def _gibbs_auto_blocked_xla_mc(bands, gidx, state, beta_hat, n_vec, log_var,
                               keys, shrink_corr, p_bounds, alpha_bounds,
                               mean_ld, burn_in, num_iter_tot, m,
                               report_step, num_reports, use_mle,
                               no_jump_sign):
    def body(_, st):
        return _multi_auto_sweep_body(
            bands, gidx, st, beta_hat, n_vec, log_var, keys, shrink_corr,
            p_bounds, alpha_bounds, mean_ld, burn_in, m, report_step,
            num_reports, use_mle, no_jump_sign, use_pallas=False)

    return jax.lax.fori_loop(0, num_iter_tot, body, state)


def gibbs_auto_blocked(bands, gidx, beta_hat, n_vec, log_var, p_init, h2_init,
                       key, shrink_corr, p_bounds, alpha_bounds, mean_ld,
                       burn_in, num_iter, m,
                       report_step=None, use_mle=True, no_jump_sign=False,
                       use_pallas=False):
    """Block-parallel ldpred2_gibbs_auto. Global (p, h2, MLE) updates are
    cross-block reductions each sweep; all per-variant state is global.

    use_pallas: host-driven loop of async-chained per-sweep programs
    (see gibbs_one_blocked)."""
    if use_pallas:
        return _gibbs_auto_blocked_hostloop(
            bands, gidx, beta_hat, n_vec, log_var, p_init, h2_init, key,
            shrink_corr, p_bounds, alpha_bounds, mean_ld, burn_in,
            num_iter, m, report_step, use_mle, no_jump_sign)
    return _gibbs_auto_blocked_xla(
        bands, gidx, beta_hat, n_vec, log_var, p_init, h2_init, key,
        shrink_corr, p_bounds, alpha_bounds, mean_ld,
        burn_in=burn_in, num_iter=num_iter, m=m, report_step=report_step,
        use_mle=use_mle, no_jump_sign=no_jump_sign)


def _gibbs_auto_blocked_hostloop(bands, gidx, beta_hat, n_vec, log_var,
                                 p_init, h2_init, key, shrink_corr, p_bounds,
                                 alpha_bounds, mean_ld, burn_in, num_iter, m,
                                 report_step, use_mle, no_jump_sign):
    num_iter_tot = burn_in + num_iter
    if report_step is None:
        report_step = num_iter + 1
    num_reports = num_iter // report_step if report_step <= num_iter else 0
    dt = beta_hat.dtype
    h2_0 = jnp.maximum(h2_init, MIN_H2)
    p_0 = jnp.clip(p_init, p_bounds[0], p_bounds[1])
    state = (
        _dp0(bands), jnp.zeros(m, dt), p_0,
        jnp.asarray(0.0, dt), jnp.asarray(0.0, dt), h2_0 / (m * p_0),
        jnp.zeros(m, dt), jnp.zeros(m, dt), jnp.zeros(m, dt),
        jnp.zeros((max(num_reports, 1), m), dt),
        jnp.full((3, num_iter_tot), jnp.nan, dt), jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
    )
    burn_in_d = jnp.asarray(burn_in, jnp.int32)
    for _ in range(num_iter_tot):
        state = _one_auto_sweep_prog(
            bands, gidx, state, beta_hat, n_vec, log_var, key,
            shrink_corr, p_bounds, alpha_bounds, mean_ld,
            burn_in_d, m=m,
            report_step=report_step, num_reports=num_reports,
            use_mle=use_mle, no_jump_sign=no_jump_sign)
    (_, _, _, _, _, _, avg_postp, avg_beta, avg_bhat, samples, paths,
     diverged, _) = state
    nan = jnp.where(diverged, jnp.nan, 0.0)
    return {
        "beta_est": avg_beta / num_iter + nan,
        "postp_est": avg_postp / num_iter + nan,
        "corr_est": avg_bhat / num_iter + nan,
        "sample_beta": samples,
        "path_p_est": paths[0], "path_h2_est": paths[1],
        "path_alpha_est": paths[2],
    }


@partial(jax.jit, static_argnames=("m", "report_step", "num_reports",
                                   "use_mle", "no_jump_sign"))
def _one_auto_sweep_prog(bands, gidx, state, beta_hat, n_vec, log_var, key,
                         shrink_corr, p_bounds, alpha_bounds, mean_ld,
                         burn_in, m, report_step, num_reports,
                         use_mle, no_jump_sign):
    """One auto sweep for the host-driven loop (k carried in device
    state). Divergence is mask-based (see _one_sweep_prog)."""
    (dp_pads, curr_beta, p, cur_h2_est, par_alpha, par_sigma2,
     avg_postp, avg_beta, avg_bhat, samples, paths, diverged, k) = state
    dt = beta_hat.dtype
    gap0 = 2.0 * jnp.sum(beta_hat**2)

    inv_odd_p = (1 - p) / p
    scale_freq = (jnp.exp(par_alpha * log_var) if use_mle
                  else jnp.ones_like(log_var))
    C1 = scale_freq * par_sigma2 * n_vec
    C2 = 1.0 / (1.0 + 1.0 / C1)
    C4 = C2 / n_vec
    s1 = jnp.sqrt(1 + C1)

    ku, kz, kp, kb = jax.random.split(jax.random.fold_in(key, k), 4)
    u = jax.random.uniform(ku, (m,), dtype=dt)
    z = jax.random.normal(kz, (m,), dtype=dt)
    dp2, nb, aux = _sweeps_bucketed(
        bands, gidx, dp_pads, curr_beta, (beta_hat, C2, C4, s1),
        u, z, inv_odd_p, p, False, shrink_corr, no_jump_sign, m,
        use_pallas=True)
    gap, causal, h2_inc, postp_inc, beta_inc, dps = aux
    ok = ~diverged                                # prior-sweep state
    div2 = diverged | (gap > gap0)

    post = (k >= burn_in) & ok
    avg_postp2 = avg_postp + jnp.where(post, postp_inc, 0.0)
    avg_beta2 = avg_beta + jnp.where(post, beta_inc, 0.0)
    avg_bhat2 = avg_bhat + jnp.where(post, dps, 0.0)

    nb_causal = jnp.sum(causal)
    p2 = _beta_draw(kp, 1 + nb_causal / mean_ld,
                    1 + (m - nb_causal) / mean_ld, dtype=dt)
    p2 = jnp.clip(p2, p_bounds[0], p_bounds[1])
    p2 = jnp.where(ok, p2, p)
    h2_est2 = jnp.where(ok, cur_h2_est + h2_inc, cur_h2_est)
    h2 = jnp.maximum(h2_est2, MIN_H2)

    if use_mle:
        wts = _poisson1(kb, (m,), dt) * causal
        pa, ps = _mle_alpha_profile(
            par_alpha, par_sigma2, wts, log_var, nb * nb, alpha_bounds)
        pa, ps = jax.lax.optimization_barrier((pa, ps))  # see multi body
        pa = jnp.where(ok, pa, par_alpha)
        ps = jnp.where(ok, ps, par_sigma2)
    else:
        pa, ps = par_alpha, jnp.where(ok, h2 / (m * p2), par_sigma2)

    paths2 = jax.lax.dynamic_update_slice(
        paths, jnp.array([[p2], [h2], [pa - 1.0]], dtype=paths.dtype),
        (0, k))
    paths2 = jnp.where(div2, paths, paths2)

    if num_reports > 0:
        rep_idx = (k - burn_in + 1) // report_step - 1
        do_rep = post & ((k - burn_in + 1) % report_step == 0) & ~div2
        row = jnp.where(do_rep & causal, nb, 0.0)[None]
        samples2 = jax.lax.cond(
            do_rep,
            lambda s: jax.lax.dynamic_update_slice(
                s, row, (jnp.clip(rep_idx, 0, num_reports - 1), 0)),
            lambda s: s, samples)
    else:
        samples2 = samples

    # dp/curr_beta keep evolving post-divergence (results are NaN anyway)
    return (dp2, nb, p2, h2_est2, pa, ps, avg_postp2, avg_beta2,
            avg_bhat2, samples2, paths2, div2, k + 1)


@partial(jax.jit,
         static_argnames=("burn_in", "num_iter", "report_step", "m",
                          "use_mle", "no_jump_sign", "use_pallas"))
def _gibbs_auto_blocked_xla(bands, gidx, beta_hat, n_vec, log_var, p_init,
                            h2_init, key, shrink_corr, p_bounds,
                            alpha_bounds, mean_ld, burn_in, num_iter, m,
                            report_step=None, use_mle=True,
                            no_jump_sign=False, use_pallas=False):
    """XLA fori_loop twin (CPU / f64 / sharded paths)."""
    gap0 = 2.0 * jnp.sum(beta_hat**2)
    num_iter_tot = burn_in + num_iter
    if report_step is None:
        report_step = num_iter + 1
    num_reports = num_iter // report_step if report_step <= num_iter else 0

    dt = beta_hat.dtype
    h2_0 = jnp.maximum(h2_init, MIN_H2)
    p_0 = jnp.clip(p_init, p_bounds[0], p_bounds[1])

    def body(k, state):
        (dp_pads, curr_beta, p, cur_h2_est, par_alpha, par_sigma2,
         avg_postp, avg_beta, avg_bhat, samples, paths, diverged) = state

        def run(_):
            inv_odd_p = (1 - p) / p
            scale_freq = (jnp.exp(par_alpha * log_var) if use_mle
                          else jnp.ones_like(log_var))
            C1 = scale_freq * par_sigma2 * n_vec
            C2 = 1.0 / (1.0 + 1.0 / C1)
            C4 = C2 / n_vec
            s1 = jnp.sqrt(1 + C1)

            ku, kz, kp, kb = jax.random.split(jax.random.fold_in(key, k), 4)
            u = jax.random.uniform(ku, (m,), dtype=dt)
            z = jax.random.normal(kz, (m,), dtype=dt)
            dp2, nb, aux = _sweeps_bucketed(
                bands, gidx, dp_pads, curr_beta, (beta_hat, C2, C4, s1),
                u, z, inv_odd_p, p, False, shrink_corr, no_jump_sign, m,
                use_pallas=use_pallas)
            gap, causal, h2_inc, postp_inc, beta_inc, dps = aux
            div2 = gap > gap0

            post = k >= burn_in
            avg_postp2 = avg_postp + jnp.where(post, postp_inc, 0.0)
            avg_beta2 = avg_beta + jnp.where(post, beta_inc, 0.0)
            avg_bhat2 = avg_bhat + jnp.where(post, dps, 0.0)

            nb_causal = jnp.sum(causal)
            p2 = _beta_draw(kp, 1 + nb_causal / mean_ld,
                            1 + (m - nb_causal) / mean_ld, dtype=dt)
            p2 = jnp.clip(p2, p_bounds[0], p_bounds[1])
            h2_est2 = cur_h2_est + h2_inc
            h2 = jnp.maximum(h2_est2, MIN_H2)

            if use_mle:
                wts = _poisson1(kb, (m,), dt) * causal
                pa, ps = _mle_alpha_profile(
                    par_alpha, par_sigma2, wts, log_var, nb * nb,
                    alpha_bounds)
            else:
                pa, ps = par_alpha, h2 / (m * p2)

            paths2 = paths.at[:, k].set(
                jnp.array([p2, h2, pa - 1.0], dtype=paths.dtype))
            paths2 = jnp.where(div2, paths, paths2)

            if num_reports > 0:
                rep_idx = (k - burn_in + 1) // report_step - 1
                do_rep = post & ((k - burn_in + 1) % report_step == 0) & ~div2
                samples2 = jax.lax.cond(
                    do_rep,
                    lambda s: jax.lax.dynamic_update_slice(
                        s, jnp.where(causal, nb, 0.0)[None],
                        (jnp.clip(rep_idx, 0, num_reports - 1), 0)),
                    lambda s: s, samples)
            else:
                samples2 = samples

            return (dp2, nb, p2, h2_est2, pa, ps, avg_postp2, avg_beta2,
                    avg_bhat2, samples2, paths2, div2)

        return jax.lax.cond(diverged, lambda _: state, run, operand=None)

    state0 = (
        _dp0(bands), jnp.zeros(m, dt), p_0,
        jnp.asarray(0.0, dt), jnp.asarray(0.0, dt), h2_0 / (m * p_0),
        jnp.zeros(m, dt), jnp.zeros(m, dt), jnp.zeros(m, dt),
        jnp.zeros((max(num_reports, 1), m), dt),
        jnp.full((3, num_iter_tot), jnp.nan, dt), False,
    )
    (_, _, _, _, _, _, avg_postp, avg_beta, avg_bhat, samples, paths,
     diverged) = jax.lax.fori_loop(0, num_iter_tot, body, state0)

    nan = jnp.where(diverged, jnp.nan, 0.0)
    return {
        "beta_est": avg_beta / num_iter + nan,
        "postp_est": avg_postp / num_iter + nan,
        "corr_est": avg_bhat / num_iter + nan,
        "sample_beta": samples,
        "path_p_est": paths[0], "path_h2_est": paths[1],
        "path_alpha_est": paths[2],
    }


@partial(jax.jit, static_argnames=("maxiter", "m"))
def lassosum_cd_blocked(bands, gidx, beta_hat, lam, delta_plus_one,
                        dfmax, tol, maxiter, m):
    """Block-parallel lassosum2 CD; identical to the unblocked kernel on
    block-diagonal LD (deterministic)."""
    gap0 = 2.0 * jnp.sum(beta_hat**2)
    dt = beta_hat.dtype

    def sweep_bucket(dp, cb, bands_t, bh_b, lam_b, dp1_b, Wk):
        """Lockstep CD sweep, TPU-native layout (see _sweep_gibbs_batched)."""
        mbk = bands_t.shape[0]
        ind = jnp.arange(mbk, dtype=jnp.int32)

        def step(carry, xs):
            dp, gap, df, maxshift = carry
            j2, bh_j, lam_j, dp1_j, band_row, cb_j = xs
            width = band_row.shape[0]
            j0 = (j2 // 8) * 8           # row j shifted by j%8
            dp_slice = jax.lax.dynamic_slice(
                dp, (j0, 0), (width, dp.shape[1]))
            dprod = jax.lax.dynamic_slice(
                dp, (j2 + Wk, 0), (1, dp.shape[1]))[0]
            u_j = bh_j - (dprod - cb_j)
            nm = jnp.where(u_j > 0, u_j - lam_j, u_j + lam_j)
            new_beta = jnp.where(u_j * nm > 0, nm / dp1_j, 0.0)
            new_beta = jnp.where(jnp.abs(u_j) > lam_j, new_beta, 0.0)
            shift = new_beta - cb_j
            dp = jax.lax.dynamic_update_slice(
                dp, dp_slice + shift[None, :] * band_row, (j0, 0))
            gap = gap + jnp.sum(jnp.where(new_beta != 0, new_beta**2, 0.0))
            df = df + jnp.sum((new_beta != 0).astype(jnp.int32))
            maxshift = jnp.maximum(maxshift, jnp.max(jnp.abs(shift)))
            return (dp, gap, df, maxshift), new_beta

        xs = (ind, bh_b, lam_b, dp1_b, bands_t, cb)
        (dp2, gap, df, ms), nb = jax.lax.scan(
            step, (dp, jnp.asarray(0.0, dt), 0, jnp.asarray(0.0, dt)),
            xs)
        return dp2, nb, gap, df, ms

    def cond(state):
        _, _, k, done, _ = state
        return (~done) & (k < maxiter)

    idx_all = jnp.concatenate([gk.reshape(-1) for gk in gidx])
    safe_idx = jnp.where(idx_all >= 0, idx_all, m)
    pos = jnp.zeros((m + 1,), jnp.int32).at[safe_idx].set(
        jnp.arange(idx_all.shape[0], dtype=jnp.int32), mode="drop")[:m]

    def body(state):
        dp_pads, curr_beta, k, done, diverged = state
        gap = jnp.asarray(0.0, dt)
        df = 0
        maxshift = jnp.asarray(0.0, dt)
        dp2 = []
        nbs = []
        for i, (bk, gk) in enumerate(zip(bands, gidx)):
            Wk = (bk.shape[1] - 8) // 2  # center offset CK
            dpk, nbk, gapk, dfk, msk = sweep_bucket(
                dp_pads[i], _scatter_b(curr_beta, gk), bk,
                _scatter_b(beta_hat, gk), _scatter_b(lam, gk, 1.0),
                _scatter_b(delta_plus_one, gk, 1.0), Wk)
            dp2.append(dpk)
            nbs.append(nbk.reshape(-1))
            gap = gap + gapk
            df = df + dfk
            maxshift = jnp.maximum(maxshift, msk)
        # slot -> global via inverse-permutation gather (TPU scatters
        # dominated the sweep wall; see _sweeps_bucketed_mc)
        nb_g = (jnp.concatenate(nbs) if len(nbs) > 1 else nbs[0])[pos]
        div2 = gap > gap0
        done2 = (maxshift <= tol) | (df > dfmax) | div2
        return tuple(dp2), nb_g, k + 1, done2, div2

    state0 = (_dp0(bands), jnp.zeros(m, dt), 0, False, False)
    _, beta, k, _, diverged = jax.lax.while_loop(cond, body, state0)
    return jnp.where(diverged, jnp.nan, beta), k
