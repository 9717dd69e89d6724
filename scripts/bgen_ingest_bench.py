"""BGEN ingest throughput (VERDICT #4 'Done' criterion).

Synthesizes a BGEN v1.2 (layout 2, zlib, 8-bit) file + .bgi index with
UKBB-like per-variant geometry (N samples -> 10+3N-byte uncompressed
blocks), runs snp_readBGEN with the on-disk backing store, and reports
variants/s + genotypes/s with a projection to the reference's published
workload: 1M variants x 400K samples in ~40 min on 15 cores
(reference README.md:42, src/read-bgen.cpp:18-81).

Usage: python scripts/bgen_ingest_bench.py [N_samples] [M_variants]
"""

import sqlite3
import struct
import sys
import time
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_bgen(path, N, M, n_distinct=16, seed=0):
    """Write a synthetic BGEN + .bgi. Probability payloads cycle over
    `n_distinct` pre-compressed blocks (inflate cost per variant is
    authentic; generation stays fast)."""
    rng = np.random.default_rng(seed)
    payloads = []
    for _ in range(n_distinct):
        raw = bytearray(10 + 3 * N)
        struct.pack_into("<IHBB", raw, 0, N, 2, 2, 2)
        raw[8:8 + N] = (np.full(N, 2, np.uint8)
                        | (rng.random(N) < 0.002).astype(np.uint8) * 0x80
                        ).tobytes()
        raw[8 + N] = 0          # unphased
        raw[9 + N] = 8          # 8-bit
        p = rng.integers(0, 256, size=2 * N, dtype=np.uint8)
        raw[10 + N:] = p.tobytes()
        payloads.append(zlib.compress(bytes(raw), level=6))

    rows = []
    with open(path, "wb") as f:
        header = struct.pack("<IIII4s", 20, 20, M, N, b"bgen")
        flags = 1 | (2 << 2) | (1 << 31)
        f.write(header + struct.pack("<I", flags))
        for j in range(M):
            start = f.tell()
            vid = f"var{j}".encode()
            rsid = f"rs{j}".encode()
            chrom = b"01"
            pos = 1000 + j
            a1, a2 = b"A", b"C"
            comp = payloads[j % n_distinct]
            blk = (struct.pack("<H", len(vid)) + vid
                   + struct.pack("<H", len(rsid)) + rsid
                   + struct.pack("<H", len(chrom)) + chrom
                   + struct.pack("<IH", pos, 2)
                   + struct.pack("<I", len(a1)) + a1
                   + struct.pack("<I", len(a2)) + a2
                   + struct.pack("<I", len(comp) + 4)
                   + struct.pack("<I", 10 + 3 * N)
                   + comp)
            f.write(blk)
            rows.append(("01", pos, f"rs{j}", 1, "A", "C",
                         start, len(blk)))
    con = sqlite3.connect(str(path) + ".bgi")
    con.execute("""CREATE TABLE Variant (
        chromosome TEXT, position INT, rsid TEXT, number_of_alleles INT,
        allele1 TEXT, allele2 TEXT,
        file_start_position INT, size_in_bytes INT)""")
    con.executemany("INSERT INTO Variant VALUES (?,?,?,?,?,?,?,?)", rows)
    con.commit()
    con.close()
    return [f"01_{1000 + j}_A_C" for j in range(M)]


def main():
    import tempfile

    from bigsnpr_tpu.io.bgen import snp_readBGEN

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    with tempfile.TemporaryDirectory() as d:
        bgen = Path(d) / "synth.bgen"
        t0 = time.perf_counter()
        snp_ids = make_bgen(bgen, N, M)
        print(f"synth BGEN {N}x{M}: {bgen.stat().st_size/1e6:.0f} MB "
              f"in {time.perf_counter()-t0:.1f}s")

        t0 = time.perf_counter()
        pack = snp_readBGEN(bgen, [snp_ids],
                            backingfile=Path(d) / "store")
        dt = time.perf_counter() - t0
        assert pack.m == M and pack.n == N
        vps = M / dt
        gps = M * N / dt
        ukbb_min = 1e6 * 4e5 / gps / 60
        print(f"ingest: {dt:.1f}s = {vps:.0f} variants/s, "
              f"{gps/1e6:.0f}M genotypes/s")
        print(f"UKBB projection (1M x 400K): {ukbb_min:.0f} min on this "
              f"host (reference: ~40 min / 15 cores)")
        print(f"freq/info finite: {np.isfinite(pack.map['info']).all()}")


if __name__ == "__main__":
    main()
