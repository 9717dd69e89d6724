"""The bigSNP-equivalent container.

A `GenoPack` bundles a 2-bit-packed genotype matrix (variant-major, the
PLINK .bed layout minus its 3-byte header) with sample (`fam`) and variant
(`map`) metadata frames — the analog of the reference's
bigSNP = {genotypes: FBM.code256, fam, map} (reference R/bigSNP-class.R:17-36),
with column contracts from reference R/utils.R:49-53.

Persistence is a directory: `<name>.gpk/` holding `packed.bin` (raw bytes,
memmap-able), `fam.parquet`, `map.parquet`, `meta.json` — the analog of the
reference's .bk + .rds pair re-attached with snp_attach
(reference R/read-plink.R:128-139).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from bigsnpr_tpu.core import unpack

FAM_COLS = ["family.ID", "sample.ID", "paternal.ID", "maternal.ID", "sex", "affection"]
MAP_COLS = ["chromosome", "marker.ID", "genetic.dist", "physical.pos", "allele1", "allele2"]


@dataclass
class GenoPack:
    """2-bit packed genotype matrix + metadata.

    packed: (m, ceil(n/4)) uint8, variant-major — row j holds variant j's
            n genotypes, 4 per byte, low bits first.
    """

    packed: np.ndarray  # (m, nb) uint8 (numpy or numpy.memmap)
    n: int              # number of samples
    fam: Optional[pd.DataFrame] = None
    map: Optional[pd.DataFrame] = None
    _device_cache: object = field(default=None, repr=False, compare=False)
    _device_pad_cache: object = field(default=None, repr=False, compare=False)
    _op_cache: object = field(default=None, repr=False, compare=False)

    @property
    def m(self) -> int:
        return self.packed.shape[0]

    @property
    def shape(self):
        """(n_samples, m_variants) — matches the reference's G orientation."""
        return (self.n, self.m)

    def device_packed(self):
        """The packed bytes as a device array (cached).

        Uploads in <=256 MB row slices concatenated on device: very
        large single transfers have wedged the tunnel-attached TPU
        runtime (CLAUDE.md round-1/2 postmortems — keep transfers small)."""
        import jax.numpy as jnp

        if self._device_cache is None:
            src = np.asarray(self.packed)
            chunk_rows = max(1, (256 << 20) // max(src.shape[1], 1))
            if src.shape[0] <= chunk_rows:
                dev = jnp.asarray(src)
            else:
                parts = [jnp.asarray(src[r0:r0 + chunk_rows])
                         for r0 in range(0, src.shape[0], chunk_rows)]
                dev = jnp.concatenate(parts, axis=0)
            object.__setattr__(self, "_device_cache", dev)
        return self._device_cache

    def device_packed_padded(self, block: int):
        """Packed bytes with axis 0 zero-padded to a multiple of `block`,
        device-resident and cached per block size.

        One host->device upload total: padding happens on device from the
        `device_packed()` copy, so repeated matvec/stat calls never re-ship
        the (potentially multi-GB) packed matrix through the interconnect.
        Pad rows decode to code 0b00; callers mask them out (pad of U with
        zeros / slicing cprod output to :m), so the fill value is inert.
        """
        import jax.numpy as jnp

        cache = self._device_pad_cache
        if cache is None:
            cache = {}
            object.__setattr__(self, "_device_pad_cache", cache)
        if block not in cache:
            pad = (-self.m) % block
            base = self.device_packed()
            cache[block] = (jnp.pad(base, ((0, pad), (0, 0)))
                            if pad else base)
        return cache[block]

    # -- dense views (host, for oracles/small data) --------------------------
    def to_dosage(self) -> np.ndarray:
        """(n, m) float64 dosage with NaN for missing (host-side)."""
        codes = unpack.np_unpack_codes(np.asarray(self.packed), self.n)
        from bigsnpr_tpu.core.codes import BED_CODE_NUM

        return BED_CODE_NUM[codes].T  # (n, m)

    def subset(self, ind_row=None, ind_col=None) -> "GenoPack":
        """Materialized subset (reference snp_subset, R/subset-QC.R:33-98)."""
        ind_col = np.arange(self.m) if ind_col is None else np.asarray(ind_col)
        if ind_row is None:
            # column-only subset: plain row gather of packed bytes
            new_map = (self.map.iloc[ind_col].reset_index(drop=True)
                       if self.map is not None else self.map)
            return GenoPack(packed=np.ascontiguousarray(
                np.asarray(self.packed)[ind_col]), n=self.n,
                fam=self.fam, map=new_map)
        try:
            from bigsnpr_tpu import native

            packed2 = native.bed_subset_pack(
                np.asarray(self.packed), ind_col, np.asarray(ind_row))
        except Exception:
            packed2 = None
        if packed2 is not None:
            new_fam = (self.fam.iloc[np.asarray(ind_row)].reset_index(drop=True)
                       if self.fam is not None else self.fam)
            new_map = (self.map.iloc[ind_col].reset_index(drop=True)
                       if self.map is not None else self.map)
            return GenoPack(packed=packed2, n=len(np.asarray(ind_row)),
                            fam=new_fam, map=new_map)
        codes = unpack.np_unpack_codes(np.asarray(self.packed)[ind_col], self.n)
        if ind_row is not None:
            codes = codes[:, np.asarray(ind_row)]
        new_fam = self.fam.iloc[ind_row].reset_index(drop=True) if (
            self.fam is not None and ind_row is not None) else self.fam
        new_map = self.map.iloc[ind_col].reset_index(drop=True) if self.map is not None else self.map
        return GenoPack(
            packed=unpack.np_pack_codes(codes),
            n=codes.shape[1],
            fam=new_fam,
            map=new_map,
        )

    # -- persistence ---------------------------------------------------------
    def save(self, path: str | os.PathLike) -> str:
        path = Path(path)
        if path.suffix != ".gpk":
            path = path.with_suffix(".gpk")
        path.mkdir(parents=True, exist_ok=True)
        np.asarray(self.packed).tofile(path / "packed.bin")
        meta = {"n": int(self.n), "m": int(self.m), "version": 1}
        (path / "meta.json").write_text(json.dumps(meta))
        if self.fam is not None:
            self.fam.to_parquet(path / "fam.parquet")
        if self.map is not None:
            self.map.to_parquet(path / "map.parquet")
        return str(path)


def snp_attach(path: str | os.PathLike, mmap: bool = True):
    """Re-attach a saved GenoPack (reference snp_attach, R/read-plink.R:128-139).

    Accepts either a native `.gpk` store or a reference bigsnpr
    `.rds`+`.bk` pair (interop: reference users migrate datasets without
    re-ingest — dispatches to snp_attach_rds)."""
    path = Path(path)
    if path.suffix == ".rds":
        return snp_attach_rds(path, mmap=mmap)
    meta = json.loads((path / "meta.json").read_text())
    n, m = meta["n"], meta["m"]
    nb = (n + 3) // 4
    if mmap:
        packed = np.memmap(path / "packed.bin", dtype=np.uint8, mode="r", shape=(m, nb))
    else:
        packed = np.fromfile(path / "packed.bin", dtype=np.uint8).reshape(m, nb)
    fam = pd.read_parquet(path / "fam.parquet") if (path / "fam.parquet").exists() else None
    map_ = pd.read_parquet(path / "map.parquet") if (path / "map.parquet").exists() else None
    return GenoPack(packed=packed, n=n, fam=fam, map=map_)


def snp_save(pack: GenoPack, path: str | os.PathLike) -> str:
    return pack.save(path)


def snp_attach_rds(rds_path, bk_path=None, mmap: bool = True):
    """Attach a reference bigsnpr/bigstatsr `.rds`+`.bk` pair
    (reference snp_attach, R/read-plink.R:128-139), including the
    relocatable backingfile fix-up (:135-137): the stored absolute path
    is replaced by the `.bk` of the same basename next to the `.rds`.

    The `.bk` is the FBM byte matrix, column-major (nrow x ncol) on
    disk, i.e. variant-major rows when viewed as (ncol, nrow) — exactly
    our layout. Hard-call code tables (all values in {0,1,2,NA})
    repack to a 2-bit GenoPack; any other code256 (e.g. CODE_DOSAGE)
    attaches as a DosagePack with the original table.
    """
    from bigsnpr_tpu.utils.rds import REnv, read_rds, to_frame, unwrap

    rds_path = Path(rds_path)
    obj = read_rds(rds_path)
    cls = unwrap(getattr(obj, "attrs", {}).get("class"))
    cls = [cls] if isinstance(cls, str) else list(cls or [])
    fam = map_ = None
    if "bigSNP" in cls:
        names = list(unwrap(obj.attrs["names"]))
        parts = dict(zip(names, obj.value))
        fbm = parts["genotypes"]
        if parts.get("fam") is not None:
            fam = to_frame(parts["fam"])
        if parts.get("map") is not None:
            map_ = to_frame(parts["map"])
    else:
        fbm = obj  # bare FBM.code256

    env = fbm.attrs[".xData"]
    assert isinstance(env, REnv), "not a RefClass FBM object"

    def field(name):
        return unwrap(env.frame[f".->{name}"])

    nrow = int(np.asarray(field("nrow"))[0])
    ncol = int(np.asarray(field("ncol"))[0])
    code256 = np.asarray(field("code256"), dtype=np.float64)
    stored_bk = field("backingfile")
    stored_bk = stored_bk[0] if isinstance(stored_bk, list) else stored_bk

    if bk_path is None:
        # basename may carry Windows separators from the creator machine
        base = str(stored_bk).replace("\\", "/").rsplit("/", 1)[-1]
        cand = rds_path.parent / base
        bk_path = cand if cand.exists() else Path(str(stored_bk))
    bk_path = Path(bk_path)
    if not bk_path.exists():
        raise FileNotFoundError(f"backingfile not found: {bk_path}")
    expect = nrow * ncol
    actual = bk_path.stat().st_size
    if actual < expect:
        raise ValueError(f"backingfile too small: {actual} < {expect}")

    codes = np.memmap(bk_path, dtype=np.uint8, mode="r",
                      shape=(ncol, nrow))
    if not mmap:
        codes = np.asarray(codes)

    finite = code256[np.isfinite(code256)]
    if np.isin(finite, (0.0, 1.0, 2.0)).all():
        lut = unpack.np_dosage_to_codes(code256[None, :])[0]  # byte->2bit
        out = np.empty((ncol, (nrow + 3) // 4), dtype=np.uint8)
        step = max(1, (1 << 24) // max(nrow, 1))   # ~16MB chunks
        for j0 in range(0, ncol, step):
            out[j0:j0 + step] = unpack.np_pack_codes(
                lut[codes[j0:j0 + step]])
        return GenoPack(packed=out, n=nrow, fam=fam, map=map_)

    from bigsnpr_tpu.core.dosage import DosagePack

    return DosagePack(codes=codes, n=nrow, code256=code256,
                      fam=fam, map=map_)


def snp_subset(pack: GenoPack, ind_row=None, ind_col=None) -> GenoPack:
    return pack.subset(ind_row, ind_col)


def snp_fake(n: int, m: int, *, seed: Optional[int] = None,
             maf_range=(0.05, 0.45), na_prob: float = 0.0) -> GenoPack:
    """Random test GenoPack (reference snp_fake, R/fake.R:27-54).

    Genotypes ~ Binomial(2, p_j) with p_j ~ U(maf_range); optional missing.
    """
    rng = np.random.default_rng(seed)
    p = rng.uniform(*maf_range, size=m)
    dosage = rng.binomial(2, p[:, None], size=(m, n)).astype(float)
    if na_prob > 0:
        dosage[rng.random((m, n)) < na_prob] = np.nan
    codes = unpack.np_dosage_to_codes(dosage)
    fam = pd.DataFrame({
        "family.ID": [f"F{i}" for i in range(n)],
        "sample.ID": [f"S{i}" for i in range(n)],
        "paternal.ID": 0, "maternal.ID": 0,
        "sex": rng.integers(1, 3, n), "affection": rng.integers(1, 3, n),
    })
    map_ = pd.DataFrame({
        "chromosome": np.ones(m, dtype=int),
        "marker.ID": [f"SNP{j}" for j in range(m)],
        "genetic.dist": np.zeros(m),
        "physical.pos": np.arange(1, m + 1) * 1000,
        "allele1": "A", "allele2": "C",
    })
    return GenoPack(packed=unpack.np_pack_codes(codes), n=n, fam=fam, map=map_)
