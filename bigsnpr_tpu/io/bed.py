"""PLINK .bed/.bim/.fam I/O.

The .bed body (after the 3 magic bytes) in SNP-major mode IS our canonical
packed format, so reading is a zero-copy memmap (the reference instead
inflates 2-bit codes to a byte-per-genotype FBM, reference
src/read-plink.cpp:13-56 — we skip that 4x inflation entirely).

Magic bytes 0x6c 0x1b 0x01 (reference src/bed-acc-xptr.cpp:14-35).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd

from bigsnpr_tpu.core.genotypes import GenoPack, FAM_COLS, MAP_COLS
from bigsnpr_tpu.utils.assertions import check_args

_BED_MAGIC = bytes([0x6C, 0x1B, 0x01])


def _read_fam(famfile) -> pd.DataFrame:
    fam = pd.read_csv(famfile, sep=r"\s+", header=None, names=FAM_COLS)
    return fam


def _read_bim(bimfile) -> pd.DataFrame:
    bim = pd.read_csv(bimfile, sep=r"\s+", header=None, names=MAP_COLS)
    return bim


def read_bed(bedfile, mmap: bool = True) -> GenoPack:
    """Read .bed (+ sibling .bim/.fam) into a GenoPack.

    Reference: snp_readBed (R/read-plink.R:27-65) + bed() class
    (R/bed-class.R:65-134), collapsed into one zero-inflation step.
    """
    bedfile = Path(bedfile)
    fam = _read_fam(bedfile.with_suffix(".fam"))
    bim = _read_bim(bedfile.with_suffix(".bim"))
    n, m = len(fam), len(bim)
    nb = (n + 3) // 4

    with open(bedfile, "rb") as f:
        magic = f.read(3)
    if magic != _BED_MAGIC:
        raise ValueError(f"{bedfile} is not a SNP-major .bed file (bad magic {magic!r}).")
    expected = 3 + m * nb
    actual = os.path.getsize(bedfile)
    if actual != expected:
        raise ValueError(f"{bedfile}: expected {expected} bytes, found {actual}.")

    if mmap:
        packed = np.memmap(bedfile, dtype=np.uint8, mode="r", offset=3, shape=(m, nb))
    else:
        packed = np.fromfile(bedfile, dtype=np.uint8, offset=3).reshape(m, nb)
    return GenoPack(packed=packed, n=n, fam=fam, map=bim)


@check_args()
def snp_readBed(bedfile, backingfile=None, mmap: bool = True) -> GenoPack:
    """Read and (optionally) persist as a .gpk store (reference snp_readBed)."""
    pack = read_bed(bedfile, mmap=mmap)
    if backingfile is not None:
        pack.save(backingfile)
    return pack


def snp_writeBed(pack: GenoPack, bedfile) -> str:
    """Write a GenoPack back to .bed/.bim/.fam.

    Reference: snp_writeBed (R/write-plink.R:15-44, src/write-plink.cpp:13-52).
    Round-trips byte-identically for data read from a .bed.
    """
    bedfile = Path(bedfile)
    with open(bedfile, "wb") as f:
        f.write(_BED_MAGIC)
        np.asarray(pack.packed).tofile(f)
    if pack.fam is not None:
        pack.fam.to_csv(bedfile.with_suffix(".fam"), sep="\t", header=False, index=False)
    if pack.map is not None:
        pack.map.to_csv(bedfile.with_suffix(".bim"), sep="\t", header=False, index=False)
    return str(bedfile)


def snp_readBed2(bedfile, backingfile=None, ind_row=None, ind_col=None,
                 mmap: bool = True) -> GenoPack:
    """Read a row/col subset of a .bed (reference snp_readBed2,
    R/read-plink.R:72-111; native 2-bit repack when available)."""
    pack = read_bed(bedfile, mmap=mmap)
    if ind_row is not None or ind_col is not None:
        import numpy as _np

        rows = _np.arange(pack.m) if ind_col is None else _np.asarray(ind_col)
        cols = _np.arange(pack.n) if ind_row is None else _np.asarray(ind_row)
        try:
            from bigsnpr_tpu import native

            packed2 = native.bed_subset_pack(_np.asarray(pack.packed), rows, cols)
        except Exception:
            packed2 = None
        if packed2 is not None:
            fam = (pack.fam.iloc[cols].reset_index(drop=True)
                   if pack.fam is not None else None)
            map_ = (pack.map.iloc[rows].reset_index(drop=True)
                    if pack.map is not None else None)
            pack = GenoPack(packed=packed2, n=len(cols), fam=fam, map=map_)
        else:
            pack = pack.subset(ind_row=ind_row, ind_col=ind_col)
    if backingfile is not None:
        pack.save(backingfile)
    return pack


bed = read_bed  # the reference's bed() constructor maps a bedfile


def snp_attachExtdata(name: str = "example.bed") -> GenoPack:
    """Attach the reference's bundled test dataset if available.

    Reference: snp_attachExtdata (R/read-plink.R:152-158), data at
    inst/extdata/example{,-missing}.bed (517 x 4,542).
    """
    for base in (os.environ.get("BIGSNPR_REFERENCE", ""), "/root/reference"):
        if base:
            p = Path(base) / "inst" / "extdata" / name
            if p.exists():
                return read_bed(p)
    raise FileNotFoundError(
        f"reference extdata {name} not found; set BIGSNPR_REFERENCE or use snp_fake()."
    )
