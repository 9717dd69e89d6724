"""Byte-coded dosage container (the FBM.code256 analog).

For imputed data (BGEN), a 2-bit packing cannot hold 201 dosage levels;
we keep one byte per genotype plus a 256-entry decode table
(reference R/bigSNP-class.R:13 CODE_DOSAGE), variant-major like GenoPack.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd

from bigsnpr_tpu.core.codes import CODE_DOSAGE
from bigsnpr_tpu.core import unpack
from bigsnpr_tpu.core.genotypes import GenoPack


@dataclass
class DosagePack:
    """codes: (m, n) uint8, decoded through code256."""

    codes: np.ndarray
    n: int
    code256: np.ndarray = None
    fam: Optional[pd.DataFrame] = None
    map: Optional[pd.DataFrame] = None
    _device_pad_cache: object = None

    def __post_init__(self):
        if self.code256 is None:
            self.code256 = CODE_DOSAGE

    def device_codes_padded(self, block: int, fill: int = 3):
        """Byte codes with axis 0 padded (code 3 = NA) to a multiple of
        `block`, device-resident and cached per block size — one upload
        total across repeated kernel calls (see GenoPack analog)."""
        import jax.numpy as jnp

        if self._device_pad_cache is None:
            object.__setattr__(self, "_device_pad_cache", {})
        key = (block, fill)
        if key not in self._device_pad_cache:
            pad = (-self.m) % block
            arr = jnp.asarray(np.asarray(self.codes))
            if pad:
                arr = jnp.pad(arr, ((0, pad), (0, 0)), constant_values=fill)
            self._device_pad_cache[key] = arr
        return self._device_pad_cache[key]

    @property
    def m(self) -> int:
        return self.codes.shape[0]

    @property
    def shape(self):
        return (self.n, self.m)

    def to_dosage(self) -> np.ndarray:
        """(n, m) float dosages with NaN for missing."""
        return self.code256[self.codes].T

    def save(self, path) -> str:
        """Persist as <name>.dpk/ (codes + code256 + metadata)."""
        import json
        from pathlib import Path

        path = Path(path)
        if path.suffix != ".dpk":
            path = path.with_suffix(".dpk")
        path.mkdir(parents=True, exist_ok=True)
        target = path / "codes.bin"
        already_backed = (isinstance(self.codes, np.memmap)
                          and Path(self.codes.filename).resolve()
                          == target.resolve())
        if already_backed:
            self.codes.flush()  # streamed ingest wrote in place
        else:
            np.asarray(self.codes).tofile(target)
        np.save(path / "code256.npy", self.code256)
        (path / "meta.json").write_text(json.dumps(
            {"n": int(self.n), "m": int(self.m), "version": 1}))
        if self.fam is not None:
            self.fam.to_parquet(path / "fam.parquet")
        if self.map is not None:
            self.map.to_parquet(path / "map.parquet")
        return str(path)

    @staticmethod
    def load(path, mmap: bool = True) -> "DosagePack":
        import json
        from pathlib import Path

        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        n, m = meta["n"], meta["m"]
        if mmap:
            codes = np.memmap(path / "codes.bin", dtype=np.uint8, mode="r",
                              shape=(m, n))
        else:
            codes = np.fromfile(path / "codes.bin", dtype=np.uint8).reshape(m, n)
        fam = (pd.read_parquet(path / "fam.parquet")
               if (path / "fam.parquet").exists() else None)
        map_ = (pd.read_parquet(path / "map.parquet")
                if (path / "map.parquet").exists() else None)
        return DosagePack(codes=codes, n=n,
                          code256=np.load(path / "code256.npy"),
                          fam=fam, map=map_)

    def subset(self, ind_row=None, ind_col=None) -> "DosagePack":
        codes = self.codes
        if ind_col is not None:
            codes = codes[np.asarray(ind_col)]
        if ind_row is not None:
            codes = codes[:, np.asarray(ind_row)]
        new_fam = (self.fam.iloc[np.asarray(ind_row)].reset_index(drop=True)
                   if self.fam is not None and ind_row is not None else self.fam)
        new_map = (self.map.iloc[np.asarray(ind_col)].reset_index(drop=True)
                   if self.map is not None and ind_col is not None else self.map)
        return DosagePack(codes=np.ascontiguousarray(codes),
                          n=codes.shape[1], code256=self.code256,
                          fam=new_fam, map=new_map)

    def round_to_hardcalls(self) -> GenoPack:
        """Round dosages to hard calls (NaN kept missing) -> GenoPack."""
        d = self.code256[self.codes]  # (m, n)
        hard = np.rint(d)
        hard[np.isnan(d)] = np.nan
        return GenoPack(packed=unpack.np_pack_codes(
            unpack.np_dosage_to_codes(hard)), n=self.n,
            fam=self.fam, map=self.map)
