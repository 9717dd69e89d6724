"""Multi-host initialization helpers.

The reference has no distributed backend (SURVEY.md §2.8); this is the
TPU-native layer above parallel/mesh.py for pod slices: initialize
jax.distributed, build the global ('s','v') mesh over all hosts, and
place host-local genotype shards.

On a pod slice each host holds its sample-shard of the packed genotype
file (e.g. rows of the .bed body for its samples after a host-side
transpose, or its slice of a .gpk store); matvec partials reduce with
psum over ICI exactly as in the single-host mesh path.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh() -> Mesh:
    """('s', 'v') mesh over all devices of all hosts (near-square)."""
    from bigsnpr_tpu.parallel.mesh import factor_mesh

    devs = np.asarray(jax.devices())
    s, v = factor_mesh(len(devs))
    return Mesh(devs.reshape(s, v), axis_names=("s", "v"))


def host_local_shard(mesh: Mesh, packed_local: np.ndarray, axis: str = "s"):
    """Place a host-local byte shard into the global sharded array
    (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, P("v", "s"))
    return jax.make_array_from_process_local_data(sharding, packed_local)


def shard_slice(total: int, process_id: int, num_processes: int,
                quantum: int = 1) -> slice:
    """This host's contiguous shard of `total` items, in multiples of
    `quantum` (byte-columns of the packed store use quantum=1; raw
    samples use quantum=4 = samples per packed byte)."""
    units = -(-total // quantum)
    per = -(-units // num_processes)
    lo = min(process_id * per, units)
    hi = min(lo + per, units)
    return slice(lo * quantum, min(hi * quantum, total))


def bed_shard_bytes(bedfile, process_id: int, num_processes: int):
    """Host-local sample shard of a .bed: mmap the body and slice this
    process's byte-columns — each host reads ONLY its samples' bytes
    (the host-resident genotype shard of SURVEY.md §2.8).

    Returns (packed_local (m, nb_local) mmap view, n, m, nb_total,
    byte_lo). Sample boundaries stay byte-aligned (4 samples/byte)."""
    from bigsnpr_tpu.io.bed import read_bed

    pack = read_bed(bedfile, mmap=True)
    m, nb = pack.packed.shape
    sl = shard_slice(nb, process_id, num_processes)
    return pack.packed[:, sl], pack.n, m, nb, sl.start


def replicated(mesh: Mesh, arr, spec: P):
    """Assemble a globally-sharded array from identical per-process data
    (every process passes the same full array; spec says how it is laid
    out on the mesh). Each process materializes only its addressable
    shards via the index callback — no full-array device transfer."""
    from bigsnpr_tpu.parallel.mesh import put_global

    return put_global(mesh, arr, spec)


_NA_BYTE = 0b01010101  # 4 PLINK NA codes packed in one byte


def shard_pack_distributed(bedfile, mesh: Mesh):
    """Global P('v','s') packed genotype array where each process reads
    ONLY its addressable byte-columns of the mmapped .bed body — the
    multi-host ingest path (every host holds its samples' bytes;
    SURVEY.md §2.8 "genotype shards host-resident").

    Same padding semantics as mesh.shard_pack: sample-pad bytes and the
    tail byte's spare bits decode as NA -> 0 after standardization;
    variant-pad rows are all-NA.

    Returns (packed (m_pad, nb_pad) sharded, n, m, n_pad).
    """
    from bigsnpr_tpu.io.bed import read_bed

    pack = read_bed(bedfile, mmap=True)
    body = pack.packed
    m, nb = body.shape
    n = pack.n
    s_size, v_size = mesh.shape["s"], mesh.shape["v"]
    nb_pad = -(-nb // s_size) * s_size
    m_pad = -(-m // v_size) * v_size
    n_rem = n % 4
    sharding = NamedSharding(mesh, P("v", "s"))

    def load_block(idx):
        r, c = idx
        r0 = r.start or 0
        r1 = m_pad if r.stop is None else r.stop
        c0 = c.start or 0
        c1 = nb_pad if c.stop is None else c.stop
        out = np.full((r1 - r0, c1 - c0), _NA_BYTE, dtype=np.uint8)
        rr, cc = min(r1, m), min(c1, nb)
        if r0 < m and c0 < nb:
            out[:rr - r0, :cc - c0] = body[r0:rr, c0:cc]
            if n_rem and c0 <= nb - 1 < cc:
                # spare bits of the tail byte are zero-pad in .bed
                # (decode as dosage 2) -> rewrite them as NA
                tail = out[:rr - r0, nb - 1 - c0].astype(np.uint16)
                keep = (1 << (2 * n_rem)) - 1
                na_fill = sum(0b01 << (2 * k) for k in range(n_rem, 4))
                out[:rr - r0, nb - 1 - c0] = (
                    (tail & keep) | na_fill).astype(np.uint8)
        return out

    arr = jax.make_array_from_callback((m_pad, nb_pad), sharding, load_block)
    return arr, n, m, nb_pad * 4


def distributed_binom_operator(bedfile, mesh: Mesh | None = None,
                               precision: str = "highest"):
    """Multi-host MeshOperator over a .bed with binomial scaling computed
    on-mesh (NA-aware colstats psum over the sample axis — the
    distributed analog of bed_scaleBinom, R/binom-scaling.R:133-142).

    Returns (op, {"center", "scale"}); every process gets identical host
    copies of the scaling vectors."""
    from bigsnpr_tpu.parallel.mesh import (MeshOperator, colstats_fn,
                                           fetch_global)

    if mesh is None:
        mesh = global_mesh()
    packed, n, m, n_pad = shard_pack_distributed(bedfile, mesh)
    stats = fetch_global(colstats_fn(mesh)(packed))[:, :m]
    sums, _, nona = stats
    af = sums / np.maximum(2.0 * nona, 1.0)
    center = 2.0 * af
    scale = np.sqrt(2.0 * af * (1.0 - af))
    op = MeshOperator.from_sharded(packed, n, m, n_pad, center, scale,
                                   mesh, precision=precision)
    return op, {"center": center, "scale": scale}
