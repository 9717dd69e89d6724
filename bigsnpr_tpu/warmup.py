"""Deliberate pre-compilation of the standard program set.

Over the tunnel-attached TPU the first call at a new shape pays a
server-side XLA compile (measured 28-169 s for the randomSVD program
set at 32768x8192 under load; the client disk cache cannot capture it —
BENCH_NOTES round-4). `warmup(...)` compiles the canonical programs at
the shapes a later real call will use, so interactive users pay the
cost once, up front, instead of at the first real call of each shape.

No genotype data is shipped: the matvec/SVD warm-ups run on a
device-side zeros pack (jnp.zeros allocated on device, injected into
the GenoPack device cache), and the Gibbs warm-up on zero bands — the
compiled executables are shape-keyed, so they serve the real data
afterwards.

Reference context: the reference has no compile step (R/C++ are AOT),
so this is a TPU-specific subsystem with no reference twin.
"""

from __future__ import annotations

import time

import numpy as np


def _zeros_pack(m: int, n: int):
    """GenoPack of shape (m, n) whose device copy is created on device
    (no host->device transfer of the packed bytes)."""
    import jax.numpy as jnp

    from bigsnpr_tpu.core.genotypes import GenoPack

    nb = (n + 3) // 4
    pack = GenoPack(packed=np.zeros((m, nb), np.uint8), n=n)
    object.__setattr__(pack, "_device_cache",
                       jnp.zeros((m, nb), jnp.uint8))
    return pack


def warmup_matvec(m: int, n: int, l: int = 8, mxu=None, tm=None, tnb=None,
                  nona: bool = False, verbose: bool = False) -> float:
    """Compile the fused Pallas power-step (and its XLA twin) at the
    padded shapes of an (m, n) pack. Returns seconds spent."""
    import jax
    import jax.numpy as jnp

    from bigsnpr_tpu.ops import pallas_kernels as pk

    t0 = time.perf_counter()
    pack = _zeros_pack(m, n)
    center = np.zeros(m, np.float32)
    scale = np.ones(m, np.float32)
    kw = {"nona": nona}
    if mxu is not None:
        kw["mxu"] = mxu
    if tm is not None:
        kw["tm"] = tm
    if tnb is not None:
        kw["tnb"] = tnb
    op = pk.PallasOperator(pack, center, scale, **kw)
    Q = jnp.zeros((n, l), jnp.float32)
    if hasattr(op, "power_dev"):
        jax.block_until_ready(op.power_dev(Q)[1])
    else:
        jax.block_until_ready(op.power(Q))
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[warmup] matvec power {m}x{n} l={l}: {dt:.1f}s")
    return dt


def warmup_svd(m: int, n: int, k: int = 10, oversample: int = 10,
               max_iter: int = 200, nona: bool = False,
               verbose: bool = False) -> float:
    """Compile the full device-Krylov randomSVD program set for an
    (m, n) pack at the exact shapes snp_randomSVD(k, oversample,
    max_iter) will use. Returns seconds spent."""
    import jax
    import jax.numpy as jnp

    from bigsnpr_tpu.linalg import randomsvd as rsvd
    from bigsnpr_tpu.ops import pallas_kernels as pk

    t0 = time.perf_counter()
    pack = _zeros_pack(m, n)
    center = np.zeros(m, np.float32)
    scale = np.ones(m, np.float32)
    op = pk.PallasOperator(pack, center, scale, nona=nona)

    # mirror snp_randomSVD's shape derivation (randomsvd.py)
    l0 = min(k + oversample, min(n, m))
    max_depth = max(2, min(max_iter, -(-min(n, m) // l0), 64))
    Lmax = l0 * max_depth

    Y = jnp.zeros((n, l0), jnp.float32)
    Q = rsvd._cholqr2_j(Y)
    B, Y2 = op.power_dev(Q)
    K, M, G = rsvd._krylov_init(Q, B, m, Lmax)
    fj = jnp.asarray(l0, jnp.int32)
    Q2 = rsvd._krylov_newdirs(K, Y2, fj)
    K2, M2, G2 = rsvd._krylov_update(K, M, G, Q2, B, fj)
    W = jnp.zeros((Lmax, k), jnp.float32)
    d = jnp.ones(k, jnp.float32)
    u, v = rsvd._krylov_extract(K2, M2, W, d)
    jax.block_until_ready(u)
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[warmup] randomSVD {m}x{n} k={k} (Lmax={Lmax}): {dt:.1f}s")
    return dt


def warmup_gibbs(m: int, block: int = 4096, W: int = 250, chains: int = 30,
                 grid_cells: int = 0, use_mle: bool = True,
                 verbose: bool = False) -> float:
    """Compile the chain-batched LDpred2 sweep programs for a
    (m variants, `block`-sized blocks, bandwidth W) banded LD at NC
    chains (auto) and optionally NG grid cells. Uses zero bands of the
    bucketed shapes build_block_bands would produce. Returns seconds."""
    import jax
    import jax.numpy as jnp

    from bigsnpr_tpu.pgs import gibbs_blocked as gb

    t0 = time.perf_counter()
    nb = max(m // block, 1)
    mbk = gb._round_up(block)
    wk = gb._round_up(2 * W + 1)
    Wk = (wk - 1) // 2
    bands = np.zeros((nb, mbk, 2 * Wk + 1), np.float32)
    bands[:, :, Wk] = 1.0                      # unit diagonal
    gidx = np.full((nb, mbk), -1, np.int32)
    for b in range(nb):
        sz = min(block, m - b * block)
        gidx[b, :sz] = b * block + np.arange(sz)
    bb = gb.BlockBands([(bands, gidx)], m)

    dt32 = np.float32
    bh = jnp.zeros(m, dt32)
    nv = jnp.full(m, 1e5, dt32)
    lv = jnp.zeros(m, dt32)
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    p_inits = jnp.full(chains, 0.1, dt32)

    from bigsnpr_tpu.pgs.ldpred2 import _blocked_setup

    gb2, bands_d, gidx_d, bb2, use_pallas, bcs, meta = _blocked_setup(
        None, bb, None, dt32, mc=True)
    out = gb2.gibbs_auto_blocked_multi(
        bands_d, gidx_d, bh, nv, lv, p_inits, jnp.asarray(0.3, dt32), keys,
        jnp.asarray(1.0, dt32), jnp.asarray([1e-5, 1.0], dt32),
        jnp.asarray([-0.5, 1.5], dt32), jnp.asarray(5.0, dt32),
        burn_in=1, num_iter=1, m=m, use_mle=use_mle,
        use_pallas=use_pallas, bcs=bcs, meta=meta)
    jax.block_until_ready(out["beta_est"])
    if grid_cells:
        gkeys = jax.random.split(jax.random.PRNGKey(1), grid_cells)
        avg = gb2.gibbs_multi_blocked(
            bands_d, gidx_d, bh, nv,
            jnp.full(grid_cells, 0.3, dt32),
            jnp.full(grid_cells, 0.1, dt32),
            jnp.zeros(grid_cells, bool), gkeys, burn_in=1, num_iter=1,
            m=m, use_pallas=use_pallas, bcs=bcs, meta=meta)
        jax.block_until_ready(avg)
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[warmup] gibbs m={m} block={block} W={W} x{chains} chains"
              f"{f' + {grid_cells} cells' if grid_cells else ''}: {dt:.1f}s")
    return dt


def warmup(m: int | None = None, n: int | None = None, k: int = 10,
           gibbs_m: int | None = None, gibbs_block: int = 4096,
           gibbs_W: int = 250, chains: int = 30, grid_cells: int = 21,
           nona: bool = False, verbose: bool = True) -> dict:
    """Compile the canonical program set, deliberately.

    warmup(m, n, k=10) covers the PCA path (matvec power step + device
    Krylov); gibbs_m adds the chain-batched LDpred2 sweep programs.
    nona=True warms the NA-free kernel variants (imputed packs) instead
    of the NA-plane ones — match it to your data, the compiled
    executables are keyed on it. Returns {section: seconds}. Run once
    per server session / process.
    """
    from bigsnpr_tpu import config as btconfig

    btconfig.enable_compilation_cache()
    out = {}
    if m is not None and n is not None:
        out["svd"] = warmup_svd(m, n, k=k, nona=nona, verbose=verbose)
    if gibbs_m is not None:
        out["gibbs"] = warmup_gibbs(gibbs_m, block=gibbs_block, W=gibbs_W,
                                    chains=chains, grid_cells=grid_cells,
                                    verbose=verbose)
    return out
