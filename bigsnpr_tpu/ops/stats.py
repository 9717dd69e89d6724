"""Columnwise statistics, counts, and scaling.

TPU re-design of the reference's single-pass C++/OpenMP column kernels:
  - snp_colstats: per-column sum & centered SSQ (reference src/colstats.cpp:8-35)
  - bed_counts:   4-level histograms (reference src/bed-fun.cpp:51-98)
  - snp_MAF / bed_MAF / scaling (reference R/binom-scaling.R)

Here each is a blocked decode + VPU reduction under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bigsnpr_tpu.core.unpack import unpack_codes
from bigsnpr_tpu.ops.blocks import pick_block, pad_rows


@partial(jax.jit, static_argnames=("n",))
def _counts_block_one(pb, ind_row, n):
    """4-level histogram of one packed block. One shared program,
    dispatched host-side per block — lax.map over blocks lowers to an
    XLA while-loop, which the tunnel-attached TPU runtime serializes
    (~0.5 s/iteration; cost snp_simuPheno 170 s at 50Kx100K through
    colstats, round-5 postmortem — same pathology as big_univLinReg)."""
    codes = unpack_codes(pb, n)  # (block, n) uint8
    if ind_row is not None:
        codes = jnp.take(codes, ind_row, axis=1)
    c0 = jnp.sum(codes == 3, axis=1)  # dosage 0
    c1 = jnp.sum(codes == 2, axis=1)  # dosage 1
    c2 = jnp.sum(codes == 0, axis=1)  # dosage 2
    cna = jnp.sum(codes == 1, axis=1)
    return jnp.stack([c0, c1, c2, cna], axis=0).astype(jnp.int32)


def snp_counts(pack, ind_row=None, block=None) -> np.ndarray:
    """(4, m) counts of dosage 0/1/2/NA per variant.

    Reference: bed_counts / bed_col_counts_cpp (src/bed-fun.cpp:51-98).
    """
    n = pack.n
    m = pack.m
    block = block or pick_block(n)
    if hasattr(pack, "device_packed_padded"):
        padded = pack.device_packed_padded(block)  # uploaded once per pack
    else:
        padded = jnp.asarray(pad_rows(np.asarray(pack.packed), block)[0])
    ir = (None if ind_row is None
          else jnp.asarray(np.asarray(ind_row), jnp.int32))
    m_pad = padded.shape[0]
    # host-driven block loop: dispatches queue asynchronously, one
    # device concat, ONE host fetch
    outs = [_counts_block_one(padded[b0:b0 + block], ir, n)
            for b0 in range(0, m_pad, block)]
    return np.asarray(jnp.concatenate(outs, axis=1))[:, :m]


bed_counts = snp_counts


def _dosage_colstats(pack, ind_row=None):
    d = pack.to_dosage()  # (n, m) with NaN
    if ind_row is not None:
        d = d[np.asarray(ind_row)]
    nona = (~np.isnan(d)).sum(0)
    sumX = np.nansum(d, 0)
    ssq = np.nansum(d * d, 0)
    denoX = ssq - sumX**2 / np.maximum(nona, 1)
    return {"sumX": sumX, "denoX": denoX, "nona": nona.astype(np.int64)}


def snp_colstats(pack, ind_row=None, dtype=np.float64):
    """Per-column {sumX, denoX, nona} over non-missing entries.

    sumX = sum(x), denoX = sum(x^2) - sumX^2/nona (centered SSQ).
    Reference: snp_colstats (src/colstats.cpp:8-35, no-NA assumption) and
    bed_colstats (src/bed-fun.cpp:9-46, NA-aware). We are always NA-aware;
    on complete data the two coincide.
    """
    if hasattr(pack, "code256"):
        return _dosage_colstats(pack, ind_row=ind_row)
    counts = snp_counts(pack, ind_row=ind_row).astype(dtype)
    c0, c1, c2, cna = counts
    nona = c0 + c1 + c2
    sumX = c1 + 2 * c2
    ssq = c1 + 4 * c2
    denoX = ssq - sumX**2 / np.maximum(nona, 1)
    return {"sumX": sumX, "denoX": denoX, "nona": nona.astype(np.int64)}


def snp_MAF(pack, ind_row=None, nploidy: int = 2) -> np.ndarray:
    """Minor allele frequency (reference snp_MAF, R/binom-scaling.R:94-106).

    NOTE: the reference snp_MAF divides by the full sample count (no-NA
    assumption); we divide by the non-missing count (bed_MAF semantics,
    R/binom-scaling.R:203-222), which matches on complete data.
    """
    s = snp_colstats(pack, ind_row=ind_row)
    af = s["sumX"] / np.maximum(nploidy * s["nona"], 1)
    return np.minimum(af, 1 - af)


def bed_MAF(pack, ind_row=None):
    """Reference bed_MAF (R/binom-scaling.R:203-222): {ac, mac, af, maf, N}."""
    counts = snp_counts(pack, ind_row=ind_row)
    ac = counts[1] + 2 * counts[2]
    nb_nona = counts[:3].sum(0)
    af = ac / np.maximum(2 * nb_nona, 1)
    import pandas as pd

    return pd.DataFrame({
        "ac": ac, "mac": np.minimum(ac, 2 * nb_nona - ac),
        "af": af, "maf": np.minimum(af, 1 - af), "N": nb_nona,
    })


def snp_scaleBinom(nploidy: int = 2):
    """Binomial(nploidy, p) scaling: center = nploidy*af,
    scale = sqrt(nploidy*af*(1-af)) (reference R/binom-scaling.R:62-77)."""

    def fun(pack, ind_row=None):
        s = snp_colstats(pack, ind_row=ind_row)
        af = s["sumX"] / np.maximum(nploidy * s["nona"], 1)
        return {"center": nploidy * af, "scale": np.sqrt(nploidy * af * (1 - af))}

    return fun


def bed_scaleBinom(pack, ind_row=None):
    """Reference bed_scaleBinom (R/binom-scaling.R:133-142), NA-aware af."""
    return snp_scaleBinom(2)(pack, ind_row=ind_row)


def snp_scaleAlpha(alpha: float = -1.0):
    """center = 2p, scale = (2p(1-p))^(-alpha/2)
    (reference snp_scaleAlpha, R/binom-scaling.R:12-27)."""

    def fun(pack, ind_row=None):
        s = snp_colstats(pack, ind_row=ind_row)
        af = s["sumX"] / np.maximum(2 * s["nona"], 1)
        return {"center": 2 * af, "scale": (2 * af * (1 - af)) ** (-alpha / 2)}

    return fun


def as_scaling_fun(center, scale, ind_col=None):
    """Wrap explicit center/scale vectors as a fun_scaling
    (bigstatsr::as_scaling_fun, used via reference R/autoSVD.R docs)."""
    center = np.asarray(center, dtype=np.float64)
    scale = np.asarray(scale, dtype=np.float64)
    base = np.arange(len(center)) if ind_col is None else np.asarray(ind_col)
    lookup = {int(j): k for k, j in enumerate(base)}

    def fun(pack, ind_row=None):
        m = pack.m
        if m == len(center):
            return {"center": center, "scale": scale}
        raise ValueError("as_scaling_fun: length mismatch with pack")

    return fun
