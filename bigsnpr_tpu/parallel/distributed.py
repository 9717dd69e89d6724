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
