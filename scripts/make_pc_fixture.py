"""Regenerate tests/fixtures/example_pc_oracle.npz: f64 dense-SVD PC
oracle for the reference example.bed (517 x 4542). The SVD itself is
pure numpy (independent of the randomized solver under test); the
standardization follows bed_scaleBinom with the operator's NA -> 0 and
zero-scale conventions."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from bigsnpr_tpu.io.bed import read_bed           # noqa: E402
from bigsnpr_tpu.ops.stats import bed_scaleBinom  # noqa: E402

BED = "/root/reference/inst/extdata/example.bed"
OUT = Path(__file__).resolve().parent.parent / "tests/fixtures/example_pc_oracle.npz"


def main():
    pack = read_bed(BED)
    sc = bed_scaleBinom(pack)
    c = np.asarray(sc["center"], float)
    s = np.asarray(sc["scale"], float)
    good = s > 0
    D = pack.to_dosage().astype(np.float64)
    Xt = np.where(np.isnan(D), 0.0,
                  (D - np.where(good, c, 0)) / np.where(good, s, 1.0))
    Xt[:, ~good] = 0.0
    u, d, vt = np.linalg.svd(Xt, full_matrices=False)
    k = 10
    np.savez_compressed(OUT, d=d[:k], u=u[:, :k], v=vt[:k].T,
                        center=c, scale=s, n=pack.n, m=pack.m)
    print("saved", OUT, d[:k])


if __name__ == "__main__":
    main()
