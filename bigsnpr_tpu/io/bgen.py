"""BGEN v1.2 (layout 2, zlib, 8-bit) reader.

Reference: snp_readBGEN / snp_readBGI (R/read-bgen.R:26-227,
src/read-bgen.cpp:18-127): per-variant seek (offsets from the .bgi SQLite
index) + zlib inflate; 8-bit probability pairs become 2-decimal dosage
codes (dosage of allele2 = 2 - e/255, code = 207 - round(e*100/255)) or
sampled hard calls; IMPUTE INFO score and allele frequency computed on
the fly (e = 2*p0 + p1, f = 4*p0 + p1, INFO = 1 - num*2*nona/(af*(coef-af))).

The hot path (inflate + decode) is dispatched to the native C++ helper
when built (bigsnpr_tpu/native); pure-numpy fallback otherwise.
"""

from __future__ import annotations

import sqlite3
import struct
import zlib
from pathlib import Path

import numpy as np
import pandas as pd

from bigsnpr_tpu.core.dosage import DosagePack
from bigsnpr_tpu.core.genotypes import GenoPack
from bigsnpr_tpu.core import unpack as up

# decode[e] for e = 2*p0 + p1 in 0..510 (reference R/read-bgen.R:206)
DECODE_DOSAGE_CODE = (207 - np.round(np.arange(511) * 100 / 255)).astype(np.uint8)


def format_snp_id(snp_id):
    """1_88169_C_T -> 01_88169_C_T (reference format_snp_id)."""
    out = []
    for s in snp_id:
        if len(s) > 1 and s[1] == "_":
            s = "0" + s
        if len(s) < 3 or s[2] != "_":
            raise ValueError(f"Wrong format of variant ID {s!r}.")
        out.append(s)
    return out


def snp_readBGI(bgifile, snp_id=None) -> pd.DataFrame:
    """Variant info from a .bgi SQLite index (reference snp_readBGI)."""
    con = sqlite3.connect(f"file:{bgifile}?mode=ro", uri=True)
    try:
        info = pd.read_sql_query("SELECT * FROM Variant", con)
    finally:
        con.close()
    if snp_id is None:
        return info
    snp_id = format_snp_id(snp_id)
    info_id = format_snp_id([
        f"{c}_{p}_{a1}_{a2}" for c, p, a1, a2 in zip(
            info["chromosome"], info["position"],
            info["allele1"], info["allele2"])
    ])
    lookup = {}
    for i, s in enumerate(info_id):  # first occurrence wins (R match())
        lookup.setdefault(s, i)
    idx = [lookup.get(s, -1) for s in snp_id]
    missing = [s for s, i in zip(snp_id, idx) if i < 0]
    if missing:
        raise ValueError(f"Some variants have not been found: {missing[:5]}...")
    return info.iloc[idx].reset_index(drop=True)


def _read_string(buf, off, lenbytes=2):
    (ln,) = struct.unpack_from("<I" if lenbytes == 4 else "<H", buf, off)
    off += lenbytes
    s = buf[off:off + ln].decode()
    return s, off + ln


def check_bgen_format(bgenfile) -> int:
    """Header checks; returns N (reference check_bgen_format)."""
    with open(bgenfile, "rb") as f:
        head = f.read(24)
    offset, hlen, M, N, magic = struct.unpack_from("<IIII4s", head, 0)
    if magic != b"bgen":
        raise ValueError(f"'{bgenfile}' is not a BGEN file.")
    with open(bgenfile, "rb") as f:
        f.seek(4)
        header = f.read(hlen)
    flags = struct.unpack_from("<I", header, hlen - 4)[0]
    if flags & 0b11 != 1:
        raise ValueError(f"'{bgenfile}' is not compressed with zlib.")
    if (flags >> 2) & 0b1111 != 2:
        raise ValueError(f"'{bgenfile}' is not using Layout 2.")
    return N


def _parse_variant_header(buf, offset, N):
    """Parse the variant-id fields; returns (id, geno_offset, comp_size)."""
    off = offset
    vid, off = _read_string(buf, off)
    rsid, off = _read_string(buf, off)
    chrom, off = _read_string(buf, off)
    pos, K = struct.unpack_from("<IH", buf, off)
    off += 6
    if K != 2:
        raise ValueError("Only 2 alleles allowed.")
    a1, off = _read_string(buf, off, 4)
    a2, off = _read_string(buf, off, 4)
    (C,) = struct.unpack_from("<I", buf, off)
    off += 4
    (D,) = struct.unpack_from("<I", buf, off)
    off += 4
    if D != 10 + 3 * N:
        raise ValueError("Probabilities should be stored using 8 bits.")
    return vid, off, C - 4


def _read_variant_raw(buf, offset, ind_row, N):
    """Parse one variant block; returns (id, e = 2*p0+p1, missing mask, p
    pair array) for the selected rows."""
    vid, off, csize = _parse_variant_header(buf, offset, N)
    raw = zlib.decompress(buf[off:off + csize], bufsize=10 + 3 * N)

    data = np.frombuffer(raw, dtype=np.uint8)
    ploidy = data[8:8 + N]
    probs = data[10 + N:10 + N + 2 * N].reshape(N, 2).astype(np.int64)
    p0 = probs[ind_row, 0]
    p1 = probs[ind_row, 1]
    miss = ploidy[ind_row] >= 0x80
    e = (2 * p0 + p1).astype(np.float64)
    return vid, e, miss, (p0, p1)


def _read_variant(buf, offset, ind_row, dosage, N, rng):
    """Decode one variant block starting at `offset` in the file bytes.

    Returns (id, codes (len(ind_row),) uint8, info, freq, next_offset).
    """
    vid, e_f, miss, (p0, p1) = _read_variant_raw(buf, offset, ind_row, N)

    e = (2 * p0 + p1).astype(np.int64)
    f = 4 * p0 + p1
    nona = int((~miss).sum())
    af = float(e[~miss].sum())
    num = float((255 * f[~miss] - e[~miss] ** 2).sum())
    coef = 255 * (2 * nona)
    with np.errstate(invalid="ignore", divide="ignore"):
        info = 1 - num * 2 * nona / (af * (coef - af)) if af > 0 else np.nan
    freq = 1 - af / coef if nona else np.nan

    if dosage:
        codes = DECODE_DOSAGE_CODE[e]
    else:
        first = rng.random(len(e)) * 255 - p0
        codes = np.where(first < 0, 4, np.where(first < p1, 5, 6)).astype(np.uint8)
    codes = np.where(miss, 3, codes).astype(np.uint8)
    return vid, codes, float(info), float(freq)


def snp_readBGEN(bgenfiles, list_snp_id, ind_row=None, bgi_dir=None,
                 read_as: str = "dosage", backingfile=None, seed=None,
                 chunk_variants: int = 4096):
    """Read BGEN file(s) into a DosagePack (read_as='dosage') or
    hard-call GenoPack (read_as='random'). Returns the pack; its `map`
    carries freq + INFO per variant (reference snp_readBGEN contract).

    Streaming ingest (reference src/read-bgen.cpp:18-81 streams per
    variant into the on-disk FBM): the BGEN file is memory-mapped (the
    OS pages in only touched ranges — never the whole file in RAM) and
    decoded `chunk_variants` at a time by the native OpenMP inflate pool;
    each chunk is written straight into the backing store. A failure
    mid-ingest removes the half-written store (reference R/read-bgen.R:191).
    """
    import mmap as mmap_mod

    if isinstance(bgenfiles, (str, Path)):
        bgenfiles = [bgenfiles]
    assert read_as in ("dosage", "random")
    dosage = read_as == "dosage"
    # per-variant rng streams keyed by list position: seeded hard calls
    # are independent of on-disk decode order (variants are processed in
    # file-offset order for sequential IO)
    rng_base = int(np.random.default_rng(seed).integers(2**63))

    all_N = [check_bgen_format(b) for b in bgenfiles]
    N = all_N[0]
    assert all(x == N for x in all_N)
    if ind_row is None:
        ind_row = np.arange(N)
    ind_row = np.asarray(ind_row)
    n_sub = len(ind_row)

    # pass 1: variant info from every .bgi (small), total row count
    file_infos = []
    for ic, bgenfile in enumerate(bgenfiles):
        bgi = (Path(bgi_dir) / (Path(bgenfile).name + ".bgi")
               if bgi_dir else Path(str(bgenfile) + ".bgi"))
        file_infos.append(snp_readBGI(bgi, list_snp_id[ic]))
    m_total = sum(len(fi) for fi in file_infos)

    # output store: memmap into the .dpk directory when backed (bounded
    # RAM), plain ndarray otherwise
    store_dir = None
    if backingfile is not None and dosage:
        store_dir = Path(backingfile)
        if store_dir.suffix != ".dpk":
            store_dir = store_dir.with_suffix(".dpk")
        store_dir.mkdir(parents=True, exist_ok=True)
        codes = np.memmap(store_dir / "codes.bin", dtype=np.uint8,
                          mode="w+", shape=(m_total, n_sub))
    else:
        codes = np.empty((m_total, n_sub), dtype=np.uint8)

    try:
        from bigsnpr_tpu import native as native_mod
    except Exception:
        native_mod = None

    infos = []
    row0 = 0
    try:
        for ic, bgenfile in enumerate(bgenfiles):
            info = file_infos[ic]
            with open(bgenfile, "rb") as f:
                buf = mmap_mod.mmap(f.fileno(), 0,
                                    access=mmap_mod.ACCESS_READ)
                try:
                    ids, INFO, FREQ = _ingest_one_bgen(
                        buf, info, codes, row0, ind_row, N, dosage,
                        native_mod, rng_base, seed, chunk_variants)
                finally:
                    buf.close()
            infos.append(pd.DataFrame({
                "chromosome": info["chromosome"],
                "marker.ID": ids,
                "rsid": info["rsid"],
                "physical.pos": info["position"],
                "allele1": info["allele1"],
                "allele2": info["allele2"],
                "freq": FREQ,
                "info": INFO,
            }))
            row0 += len(info)
    except BaseException:
        # half-written store cleanup (reference R/read-bgen.R:191)
        if store_dir is not None:
            import shutil

            del codes
            shutil.rmtree(store_dir, ignore_errors=True)
        raise

    map_df = pd.concat(infos, ignore_index=True)
    if dosage:
        pack = DosagePack(codes=codes, n=n_sub, map=map_df)
        if store_dir is not None:
            codes.flush()
            pack.save(store_dir)  # metadata next to the codes already there
    else:
        # codes 3 (missing), 4/5/6 -> hard calls
        d = np.full(codes.shape, np.nan)
        d[codes == 4] = 0
        d[codes == 5] = 1
        d[codes == 6] = 2
        pack = GenoPack(packed=up.np_pack_codes(up.np_dosage_to_codes(d)),
                        n=n_sub, map=map_df)
        if backingfile is not None:
            pack.save(backingfile)
    return pack


def _ingest_one_bgen(buf, info, codes_out, row0, ind_row, N, dosage,
                     native_mod, rng_base, seed, chunk_variants):
    """Decode one BGEN's selected variants chunk-by-chunk into codes_out.

    Chunks are processed in file order (sequential reads) and written at
    their original list positions."""
    starts = np.asarray(info["file_start_position"], dtype=np.int64)
    order = np.argsort(starts, kind="stable")
    ids = [None] * len(starts)
    INFO = np.full(len(starts), np.nan)
    FREQ = np.full(len(starts), np.nan)

    for c0 in range(0, len(order), chunk_variants):
        sel = order[c0:c0 + chunk_variants]
        geno_offs = np.empty(len(sel), dtype=np.int64)
        comp_sizes = np.empty(len(sel), dtype=np.int64)
        for j, i in enumerate(sel):
            vid, goff, csize = _parse_variant_header(buf, int(starts[i]), N)
            ids[i] = vid
            geno_offs[j] = goff
            comp_sizes[j] = csize

        lo = int(geno_offs.min())
        hi = int((geno_offs + comp_sizes).max())
        chunk = bytes(buf[lo:hi])

        decoded = None
        if native_mod is not None and dosage:
            try:
                decoded = native_mod.bgen_decode_variants(
                    chunk, geno_offs - lo, comp_sizes, N, ind_row, dosage,
                    seed=0 if seed is None else seed)
            except Exception:
                decoded = None
        if decoded is not None:
            codes_k, info_k, freq_k = decoded
            codes_out[row0 + sel] = codes_k
            INFO[sel] = info_k
            FREQ[sel] = freq_k
        else:
            for j, i in enumerate(sel):
                _, ck, inf, frq = _read_variant_at(
                    chunk, int(geno_offs[j] - lo), int(comp_sizes[j]),
                    ind_row, dosage, N,
                    np.random.default_rng((rng_base, row0 + int(i))))
                codes_out[row0 + i] = ck
                INFO[i] = inf
                FREQ[i] = frq
    return ids, INFO, FREQ


def _read_variant_at(buf, geno_off, csize, ind_row, dosage, N, rng):
    """Like _read_variant but starting at the genotype block (header
    already parsed)."""
    raw = zlib.decompress(buf[geno_off:geno_off + csize], bufsize=10 + 3 * N)
    data = np.frombuffer(raw, dtype=np.uint8)
    ploidy = data[8:8 + N]
    probs = data[10 + N:10 + N + 2 * N].reshape(N, 2).astype(np.int64)
    p0 = probs[ind_row, 0]
    p1 = probs[ind_row, 1]
    miss = ploidy[ind_row] >= 0x80

    e = (2 * p0 + p1).astype(np.int64)
    f = 4 * p0 + p1
    nona = int((~miss).sum())
    af = float(e[~miss].sum())
    num = float((255 * f[~miss] - e[~miss] ** 2).sum())
    coef = 255 * (2 * nona)
    with np.errstate(invalid="ignore", divide="ignore"):
        info = 1 - num * 2 * nona / (af * (coef - af)) if af > 0 else np.nan
    freq = 1 - af / coef if nona else np.nan

    if dosage:
        codes = DECODE_DOSAGE_CODE[e]
    else:
        first = rng.random(len(e)) * 255 - p0
        codes = np.where(first < 0, 4,
                         np.where(first < p1, 5, 6)).astype(np.uint8)
    codes = np.where(miss, 3, codes).astype(np.uint8)
    return None, codes, float(info), float(freq)


def snp_prodBGEN(bgenfile, beta, list_snp_id, ind_row=None, bgi_dir=None,
                 block_size: int = 1024, engine: str = "auto"):
    """bgen[ind_row, snps] @ beta without materializing the full matrix
    (reference snp_prodBGEN, R/prod-bgen.R:21-84 / src/prod-bgen.cpp:71-141).
    Dosage-scale product, NA propagates into the product (reference).

    Blocks of `block_size` variants are inflated+decoded on host (8-bit
    pair sums e, exact integers) and GEMM-accumulated. engine:
      - "host": f64 BLAS GEMM per block — bit-parity with the reference's
        double accumulation.
      - "device": f32 (precision=highest) GEMM on the accelerator with a
        hi/lo double-single split of beta (~1e-6 relative). jax's async
        dispatch overlaps the host decode of block k+1 with the device
        GEMM of block k — ingest overlapped with compute.
      - "auto": device on TPU, host otherwise.
    The /255 dosage scaling is applied once at the end in f64, so the
    GEMM planes hold exact small integers."""
    import jax

    beta = np.atleast_2d(np.asarray(beta, dtype=np.float64))
    if beta.shape[0] == 1 and beta.size == len(list_snp_id):
        beta = beta.T
    N = check_bgen_format(bgenfile)
    if ind_row is None:
        ind_row = np.arange(N)
    ind_row = np.asarray(ind_row)
    bgi = (Path(bgi_dir) / (Path(bgenfile).name + ".bgi")
           if bgi_dir else Path(str(bgenfile) + ".bgi"))
    info = snp_readBGI(bgi, list_snp_id)
    starts = [int(s) for s in info["file_start_position"]]
    m = len(starts)
    n_sub = len(ind_row)
    K = beta.shape[1]
    if engine == "auto":
        engine = "device" if jax.default_backend() == "tpu" else "host"

    # memory-map the BGEN: only the touched per-block byte ranges are
    # paged in, so peak RSS stays O(block) however large the file
    # (reference streams through an ifstream, src/prod-bgen.cpp:71-141)
    import mmap as mmap_mod

    with open(bgenfile, "rb") as _f:
        buf = mmap_mod.mmap(_f.fileno(), 0, access=mmap_mod.ACCESS_READ)

    def decode_block(b0, b1):
        e_block = np.zeros((block_size, n_sub), dtype=np.uint16)
        e_block[b1 - b0:] = 510                        # pad dosage 0
        for jj, start in enumerate(starts[b0:b1]):
            _, e, miss, _ = _read_variant_raw(buf, start, ind_row, N)
            e = e.astype(np.uint16)
            e[miss] = 65535                            # NA sentinel
            e_block[jj] = e
        return e_block

    if engine == "device":
        import jax.numpy as jnp

        import bigsnpr_tpu.config as config

        @jax.jit
        def gemm_acc(acc, e_block, beta_block):
            rev = 510.0 - e_block.astype(jnp.float32)  # exact ints in f32
            rev = jnp.where(e_block == np.uint16(65535), jnp.nan, rev)
            return acc + jnp.dot(rev.T, beta_block,
                                 preferred_element_type=jnp.float32,
                                 precision=config.matmul_precision)

        b_hi = beta.astype(np.float32)
        b_lo = (beta - b_hi).astype(np.float32)        # double-single split
        acc_hi = jnp.zeros((n_sub, K), jnp.float32)
        acc_lo = jnp.zeros((n_sub, K), jnp.float32)
        for b0 in range(0, m, block_size):
            b1 = min(b0 + block_size, m)
            e_block = decode_block(b0, b1)
            bh = np.zeros((block_size, K), dtype=np.float32)
            bl = np.zeros((block_size, K), dtype=np.float32)
            bh[:b1 - b0] = b_hi[b0:b1]                 # pad rows beta=0
            bl[:b1 - b0] = b_lo[b0:b1]
            e_dev = jnp.asarray(e_block)
            acc_hi = gemm_acc(acc_hi, e_dev, jnp.asarray(bh))
            acc_lo = gemm_acc(acc_lo, e_dev, jnp.asarray(bl))
        out = (np.asarray(acc_hi, dtype=np.float64)
               + np.asarray(acc_lo, dtype=np.float64)) / 255.0
    else:
        acc = np.zeros((n_sub, K))
        for b0 in range(0, m, block_size):
            b1 = min(b0 + block_size, m)
            e_block = decode_block(b0, b1)[:b1 - b0].astype(np.float64)
            rev = 510.0 - e_block
            rev[e_block == 65535] = np.nan
            acc += rev.T @ beta[b0:b1]
        out = acc / 255.0
    buf.close()
    return out if out.shape[1] > 1 else out[:, 0]
