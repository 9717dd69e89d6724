"""Block-parallel LDpred2 / lassosum2.

The reference's Gibbs/CD chains are strictly sequential over all m
variants (src/ldpred2-auto.cpp:109-159) — the #1 hard part for a TPU port
(SURVEY.md §7). When the LD matrix is block-diagonal (the recommended
practice: snp_ldsplit blocks), variants in different blocks never
interact through dotprods, so the sequential chain factorizes exactly:
this module runs one `lax.scan` per block, `vmap`-ped across blocks, with
the global hyper-parameter updates (p, h2, MLE) reduced across blocks
between sweeps.

On a block-diagonal LD matrix the blocked samplers consume the same RNG
layout and perform the same arithmetic as the unblocked chains (extra
zero-adds only), so results agree to f32 round-off — tested. Sequential
depth drops from m to max(block size).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bigsnpr_tpu.pgs.gibbs import _sweep_gibbs, _mle_alpha_profile, MIN_H2
from bigsnpr_tpu.pgs.band import build_band


def shard_blocked_arrays(bands, slot, mesh=None):
    """Place the block-axis arrays on a device mesh ('v' axis): GSPMD then
    partitions the vmapped per-block scans across chips and turns the
    per-sweep global reductions (gap, nb_causal, h2, MLE sums) into
    all-reduces over ICI — multi-chip LDpred2 without code changes.

    Pads the block axis to a multiple of the device count (empty blocks
    are all-padding slots and contribute nothing)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs, axis_names=("b",))
    nd = mesh.devices.size
    B = bands.shape[0]
    pad = (-B) % nd
    if pad:
        bands = np.concatenate(
            [bands, np.zeros((pad,) + bands.shape[1:], bands.dtype)], axis=0)
    bands_s = jax.device_put(
        jnp.asarray(bands), NamedSharding(mesh, P("b", None, None)))
    return bands_s, jnp.asarray(slot), B + pad


def block_layout(block_sizes):
    """(slot_of_global (m,), global_of_slot (B, mb), valid (B, mb))."""
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


def build_block_bands(corr, block_sizes, ind_corr=None, dtype=np.float32):
    """Per-block banded LD, padded to a common (B, mb, 2W+1)."""
    sizes = np.asarray(block_sizes, dtype=np.int64)
    m2 = corr.shape[0]
    ind_corr = np.arange(m2) if ind_corr is None else np.asarray(ind_corr)
    assert sizes.sum() == len(ind_corr)
    bands, Ws = [], []
    start = 0
    for sz in sizes:
        sub = corr.subset(ind_corr[start:start + sz])
        band, W = build_band(sub, dtype=dtype)
        bands.append(band)
        Ws.append(W)
        start += sz
    W = max(Ws)
    B, mb = len(sizes), int(sizes.max())
    out = np.zeros((B, mb, 2 * W + 1), dtype=dtype)
    for b, band in enumerate(bands):
        w = Ws[b]
        out[b, :band.shape[0], W - w:W + w + 1] = band
    return out, W


def _scatter(vals, slot, B, mb, fill=0.0):
    """(m,) -> (B, mb) with `fill` at padding slots."""
    out = jnp.full((B * mb,), fill, dtype=vals.dtype)
    return out.at[slot].set(vals).reshape(B, mb)


def _sweep_blocked(dp_pads, curr_beta, bands, beta_hat, C2, C4, sqrt1pC1,
                   inv_odd_p, p, sparse, shrink_corr, no_jump_sign, u, z, W):
    """vmap of the banded Gibbs sweep over blocks. All (B, mb[, .])."""
    B, mb = beta_hat.shape
    ind = jnp.broadcast_to(jnp.arange(mb, dtype=jnp.int32), (B, mb))

    def one(dp_pad, cb, band, bh, c2, c4, s1, u_b, z_b):
        return _sweep_gibbs(dp_pad, cb, band, ind[0], bh, c2, c4, s1,
                            inv_odd_p, p, sparse, shrink_corr,
                            no_jump_sign, u_b, z_b, W)

    return jax.vmap(one)(dp_pads, curr_beta, bands, beta_hat, C2, C4,
                         sqrt1pC1, u, z)


@partial(jax.jit, static_argnames=("burn_in", "num_iter", "W", "m", "B", "mb"))
def gibbs_one_blocked(bands, slot, beta_hat, n_vec, h2, p, sparse, key,
                      burn_in, num_iter, W, m, B, mb):
    """Block-parallel ldpred2_gibbs_one. beta_hat/n_vec are (m,) in global
    order; `slot` maps global -> (B*mb) slots. Returns (m,) avg betas."""
    h2_per_var = h2 / (m * p)
    inv_odd_p = (1 - p) / p
    C1 = h2_per_var * n_vec
    C2g = 1.0 / (1.0 + 1.0 / C1)
    C4g = C2g / n_vec
    gap0 = 2.0 * jnp.sum(beta_hat**2)

    bh = _scatter(beta_hat, slot, B, mb)
    C2 = _scatter(C2g, slot, B, mb)
    C4 = _scatter(C4g, slot, B, mb, fill=1.0)
    s1 = _scatter(jnp.sqrt(1 + C1), slot, B, mb, fill=1.0)

    def body(k, state):
        dp_pads, curr_beta, avg_beta, diverged = state

        def run(_):
            ku, kz = jax.random.split(jax.random.fold_in(key, k))
            u = _scatter(jax.random.uniform(ku, (m,), dtype=bands.dtype),
                         slot, B, mb, fill=2.0)
            z = _scatter(jax.random.normal(kz, (m,), dtype=bands.dtype),
                         slot, B, mb)
            dp2, nb, aux = _sweep_blocked(
                dp_pads, curr_beta, bands, bh, C2, C4, s1,
                inv_odd_p, p, sparse, 1.0, False, u, z, W)
            gap = jnp.sum(aux[0])
            beta_inc = aux[4]
            post = k >= burn_in
            avg2 = avg_beta + jnp.where(post, beta_inc, 0.0)
            return dp2, nb, avg2, gap > gap0

        return jax.lax.cond(diverged, lambda _: state, run, operand=None)

    dt = bands.dtype
    state0 = (jnp.zeros((B, mb + 2 * W), dt), jnp.zeros((B, mb), dt),
              jnp.zeros((B, mb), dt), False)
    _, _, avg, diverged = jax.lax.fori_loop(0, burn_in + num_iter, body, state0)
    out = (avg / num_iter).reshape(-1)[slot]
    return jnp.where(diverged, jnp.nan, out)


@partial(jax.jit,
         static_argnames=("burn_in", "num_iter", "report_step", "W", "m",
                          "B", "mb", "use_mle", "no_jump_sign"))
def gibbs_auto_blocked(bands, slot, beta_hat, n_vec, log_var, p_init, h2_init,
                       key, shrink_corr, p_bounds, alpha_bounds, mean_ld,
                       burn_in, num_iter, W, m, B, mb,
                       report_step=None, use_mle=True, no_jump_sign=False):
    """Block-parallel ldpred2_gibbs_auto. Global (p, h2, MLE) updates are
    cross-block reductions each sweep."""
    gap0 = 2.0 * jnp.sum(beta_hat**2)
    num_iter_tot = burn_in + num_iter
    if report_step is None:
        report_step = num_iter + 1
    num_reports = num_iter // report_step if report_step <= num_iter else 0

    bh = _scatter(beta_hat, slot, B, mb)
    nv = _scatter(n_vec, slot, B, mb, fill=1.0)
    lv = _scatter(log_var, slot, B, mb)
    lv_flat = lv.reshape(-1)
    bh_flat = bh.reshape(-1)

    h2_0 = jnp.maximum(h2_init, MIN_H2)
    p_0 = jnp.clip(p_init, p_bounds[0], p_bounds[1])

    def body(k, state):
        (dp_pads, curr_beta, p, cur_h2_est, par_alpha, par_sigma2,
         avg_postp, avg_beta, avg_bhat, samples, paths, diverged) = state

        def run(_):
            inv_odd_p = (1 - p) / p
            scale_freq = jnp.exp(par_alpha * lv) if use_mle else jnp.ones_like(lv)
            C1 = scale_freq * par_sigma2 * nv
            C2 = 1.0 / (1.0 + 1.0 / C1)
            C4 = C2 / nv
            s1 = jnp.sqrt(1 + C1)

            ku, kz, kp, kb = jax.random.split(jax.random.fold_in(key, k), 4)
            u = _scatter(jax.random.uniform(ku, (m,), dtype=bands.dtype),
                         slot, B, mb, fill=2.0)
            z = _scatter(jax.random.normal(kz, (m,), dtype=bands.dtype),
                         slot, B, mb)
            dp2, nb, aux = _sweep_blocked(
                dp_pads, curr_beta, bands, bh, C2, C4, s1,
                inv_odd_p, p, False, shrink_corr, no_jump_sign, u, z, W)
            gap, causal, h2_inc, postp_inc, beta_inc, dps = aux
            gap = jnp.sum(gap)
            div2 = gap > gap0

            post = k >= burn_in
            avg_postp2 = avg_postp + jnp.where(post, postp_inc, 0.0)
            avg_beta2 = avg_beta + jnp.where(post, beta_inc, 0.0)
            avg_bhat2 = avg_bhat + jnp.where(post, dps, 0.0)

            nb_causal = jnp.sum(causal)
            p2 = jax.random.beta(kp, 1 + nb_causal / mean_ld,
                                 1 + (m - nb_causal) / mean_ld,
                                 dtype=bands.dtype)
            p2 = jnp.clip(p2, p_bounds[0], p_bounds[1])
            h2_est2 = cur_h2_est + jnp.sum(h2_inc)
            h2 = jnp.maximum(h2_est2, MIN_H2)

            if use_mle:
                wts = jax.random.poisson(kb, 1.0, (B * mb,)).astype(bands.dtype)
                wts = wts * causal.reshape(-1)
                pa, ps = _mle_alpha_profile(
                    par_alpha, par_sigma2, wts, lv_flat,
                    nb.reshape(-1) ** 2, alpha_bounds)
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
                        (jnp.clip(rep_idx, 0, num_reports - 1), 0, 0)),
                    lambda s: s, samples)
            else:
                samples2 = samples

            return (dp2, nb, p2, h2_est2, pa, ps, avg_postp2, avg_beta2,
                    avg_bhat2, samples2, paths2, div2)

        return jax.lax.cond(diverged, lambda _: state, run, operand=None)

    dt = bands.dtype
    state0 = (
        jnp.zeros((B, mb + 2 * W), dt), jnp.zeros((B, mb), dt), p_0,
        jnp.asarray(0.0, dt), jnp.asarray(0.0, dt), h2_0 / (m * p_0),
        jnp.zeros((B, mb), dt), jnp.zeros((B, mb), dt), jnp.zeros((B, mb), dt),
        jnp.zeros((max(num_reports, 1), B, mb), dt),
        jnp.full((3, num_iter_tot), jnp.nan, dt), False,
    )
    (_, _, _, _, _, _, avg_postp, avg_beta, avg_bhat, samples, paths,
     diverged) = jax.lax.fori_loop(0, num_iter_tot, body, state0)

    nan = jnp.where(diverged, jnp.nan, 0.0)

    def g(x):
        return x.reshape(-1)[slot] / num_iter + nan

    return {
        "beta_est": g(avg_beta),
        "postp_est": g(avg_postp),
        "corr_est": g(avg_bhat),
        "sample_beta": samples.reshape(samples.shape[0], -1)[:, slot],
        "path_p_est": paths[0], "path_h2_est": paths[1],
        "path_alpha_est": paths[2],
    }


@partial(jax.jit, static_argnames=("maxiter", "W", "m", "B", "mb"))
def lassosum_cd_blocked(bands, slot, beta_hat, lam, delta_plus_one,
                        dfmax, tol, maxiter, W, m, B, mb):
    """Block-parallel lassosum2 CD; identical to the unblocked kernel on
    block-diagonal LD (deterministic)."""
    gap0 = 2.0 * jnp.sum(beta_hat**2)
    bh = _scatter(beta_hat, slot, B, mb)
    lm = _scatter(lam, slot, B, mb, fill=1.0)
    dp1 = _scatter(delta_plus_one, slot, B, mb, fill=1.0)
    ind = jnp.arange(mb, dtype=jnp.int32)

    def sweep_one(dp_pad, cb, band, bh_b, lam_b, dp1_b):
        def step(carry, xs):
            dp_pad, gap, df, maxshift = carry
            j2, bh_j, lam_j, dp1_j, band_row, cb_j = xs
            width = band_row.shape[0]
            dp_slice = jax.lax.dynamic_slice(dp_pad, (j2,), (width,))
            u_j = bh_j - (dp_slice[W] - cb_j)
            nm = jnp.where(u_j > 0, u_j - lam_j, u_j + lam_j)
            new_beta = jnp.where(u_j * nm > 0, nm / dp1_j, 0.0)
            shift = new_beta - cb_j
            dp_pad = jax.lax.dynamic_update_slice(
                dp_pad, dp_slice + shift * band_row, (j2,))
            gap = gap + jnp.where(new_beta != 0, new_beta**2, 0.0)
            df = df + (new_beta != 0)
            maxshift = jnp.maximum(maxshift, jnp.abs(shift))
            return (dp_pad, gap, df, maxshift), new_beta

        xs = (ind, bh_b, lam_b, dp1_b, band, cb)
        (dp2, gap, df, ms), nb = jax.lax.scan(step, (dp_pad, 0.0, 0, 0.0), xs)
        return dp2, nb, gap, df, ms

    def cond(state):
        _, _, k, done, _ = state
        return (~done) & (k < maxiter)

    def body(state):
        dp_pads, curr_beta, k, done, diverged = state
        dp2, nb, gap, df, ms = jax.vmap(sweep_one)(
            dp_pads, curr_beta, bands, bh, lm, dp1)
        gap = jnp.sum(gap)
        df = jnp.sum(df)
        maxshift = jnp.max(ms)
        div2 = gap > gap0
        done2 = (maxshift <= tol) | (df > dfmax) | div2
        return dp2, nb, k + 1, done2, div2

    dt = bands.dtype
    state0 = (jnp.zeros((B, mb + 2 * W), dt), jnp.zeros((B, mb), dt),
              0, False, False)
    _, beta, k, _, diverged = jax.lax.while_loop(cond, body, state0)
    out = beta.reshape(-1)[slot]
    return jnp.where(diverged, jnp.nan, out), k
