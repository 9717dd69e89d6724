"""Device-mesh sharding for genotype linear algebra.

The reference is single-node (SURVEY.md §2.8: OpenMP threads + foreach
processes, no distributed backend). The TPU design shards the packed
genotype matrix over a 2-D mesh:

  axis 's' (samples): the packed byte axis — data parallel for
      matvec/SVD/GRM/scoring; partial products reduce with psum over ICI
      (the reference's per-thread accumulator + final rowSums,
      src/bed-prod-vec.cpp:27-53, becomes a collective).
  axis 'v' (variants): variant blocks — parallel for LD/clumping/
      per-variant stats; prod-side reductions psum over 'v'.

One power-iteration step X̃(X̃ᵀQ) exercises both collectives; this is the
communication pattern of the whole framework.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bigsnpr_tpu.core.unpack import unpack_standardized


def put_global(mesh: Mesh, arr, spec: P):
    """Place a host array on the mesh, multi-process safe: each process
    materializes only its addressable shards (device_put of a host array
    cannot target non-addressable devices)."""
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr),
                              jax.sharding.NamedSharding(mesh, spec))
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, jax.sharding.NamedSharding(mesh, spec),
        lambda idx: arr[idx])


def fetch_global(arr) -> np.ndarray:
    """Fetch a global array to host on every process. Fully-addressable
    arrays (single process, or replicated over the process axis) copy
    directly; otherwise allgather over DCN (tall-skinny factors only —
    the packed matrix never takes this path)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def factor_mesh(n_devices: int) -> tuple[int, int]:
    """Factor n_devices into (samples, variants) axes, near-square."""
    s = int(np.sqrt(n_devices))
    while n_devices % s:
        s -= 1
    return s, n_devices // s


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    s, v = factor_mesh(len(devices))
    return Mesh(np.asarray(devices).reshape(s, v), axis_names=("s", "v"))


def shard_pack(pack, mesh: Mesh):
    """Pad + place the packed genotype matrix on the mesh.

    Returns (packed (m_pad, nb_pad) sharded P('v','s'), n, m, n_pad).
    Samples are padded to a multiple of 4*|s| (pad decodes as NA -> 0
    after masking: we pad with byte 0b01010101 = all-NA).
    """
    s_size = mesh.shape["s"]
    v_size = mesh.shape["v"]
    packed = np.asarray(pack.packed)
    m, nb = packed.shape
    n = pack.n
    # the last partial byte may hold zero-pad bits (decode as dosage 2!);
    # rewrite tail bytes so padding decodes as NA
    n_rem = n % 4
    if n_rem:
        tail = packed[:, -1].astype(np.uint16)
        keep_mask = (1 << (2 * n_rem)) - 1
        na_fill = sum(0b01 << (2 * k) for k in range(n_rem, 4))
        packed = packed.copy()
        packed[:, -1] = ((tail & keep_mask) | na_fill).astype(np.uint8)
    nb_pad = -(-nb // s_size) * s_size
    m_pad = -(-m // v_size) * v_size
    out = np.full((m_pad, nb_pad), 0b01010101, dtype=np.uint8)  # all-NA pad
    out[:m, :nb] = packed
    arr = jax.device_put(
        jnp.asarray(out),
        jax.sharding.NamedSharding(mesh, P("v", "s")))
    return arr, n, m, nb_pad * 4


def power_iter_fn(mesh: Mesh, n_pad: int, precision="highest"):
    """Jitted sharded fn: (packed, Q, center, scale) -> X̃(X̃ᵀ Q).

    packed: (m_pad, nb_pad) P('v','s'); Q: (n_pad, l) P('s', None);
    center/scale: (m_pad,) P('v'). Output: (n_pad, l) P('s', None).
    NA decoding masks the sample padding automatically (NA -> 0).
    """

    def local(packed_loc, Q_loc, c_loc, s_loc):
        n_loc = packed_loc.shape[1] * 4
        xt = unpack_standardized(packed_loc, n_loc, c_loc, s_loc)
        z_part = jnp.dot(xt, Q_loc, preferred_element_type=jnp.float32,
                         precision=precision)
        z = jax.lax.psum(z_part, "s")            # (m_loc, l)
        y_part = jnp.dot(xt.T, z, preferred_element_type=jnp.float32,
                         precision=precision)
        return jax.lax.psum(y_part, "v")         # (n_loc, l)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("v", "s"), P("s", None), P("v"), P("v")),
        out_specs=P("s", None),
    )
    return jax.jit(fn)


def power_both_fn(mesh: Mesh, precision="highest"):
    """Jitted sharded fused Krylov step: (packed, Q, center, scale) ->
    (B = X̃ᵀQ P('v',None), Y = X̃B P('s',None)) in ONE program — the
    intermediate stays sharded on device between the two collectives."""

    def local(packed_loc, Q_loc, c_loc, s_loc):
        n_loc = packed_loc.shape[1] * 4
        xt = unpack_standardized(packed_loc, n_loc, c_loc, s_loc)
        z = jax.lax.psum(
            jnp.dot(xt, Q_loc, preferred_element_type=jnp.float32,
                    precision=precision), "s")           # (m_loc, l)
        y = jax.lax.psum(
            jnp.dot(xt.T, z, preferred_element_type=jnp.float32,
                    precision=precision), "v")           # (n_loc, l)
        return z, y

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("v", "s"), P("s", None), P("v"), P("v")),
        out_specs=(P("v", None), P("s", None))))


def cprod_fn(mesh: Mesh, precision="highest"):
    """Jitted sharded X̃ᵀ V: (packed, V, center, scale) -> (m_pad, l) P('v')."""

    def local(packed_loc, V_loc, c_loc, s_loc):
        n_loc = packed_loc.shape[1] * 4
        xt = unpack_standardized(packed_loc, n_loc, c_loc, s_loc)
        z = jnp.dot(xt, V_loc, preferred_element_type=jnp.float32,
                    precision=precision)
        return jax.lax.psum(z, "s")

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("v", "s"), P("s", None), P("v"), P("v")),
        out_specs=P("v", None)))


def prod_fn(mesh: Mesh, precision="highest"):
    """Jitted sharded X̃ U: (packed, U, center, scale) -> (n_pad, l) P('s')."""

    def local(packed_loc, U_loc, c_loc, s_loc):
        n_loc = packed_loc.shape[1] * 4
        xt = unpack_standardized(packed_loc, n_loc, c_loc, s_loc)
        y = jnp.dot(xt.T, U_loc, preferred_element_type=jnp.float32,
                    precision=precision)
        return jax.lax.psum(y, "v")

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("v", "s"), P("v", None), P("v"), P("v")),
        out_specs=P("s", None)))


class MeshOperator:
    """Device-mesh-sharded standardized genotype operator with the same
    cprod/prod surface as PallasOperator — the multi-chip compute path
    for randomSVD/autoSVD (data-parallel samples x tensor-parallel
    variants; psum over ICI)."""

    def __init__(self, pack, center, scale, mesh: Mesh | None = None,
                 precision: str = "highest"):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.packed, self.n, self.m, self.n_pad = shard_pack(pack, self.mesh)
        self._finish(center, scale, precision)

    @classmethod
    def from_sharded(cls, packed, n: int, m: int, n_pad: int,
                     center, scale, mesh: Mesh, precision: str = "highest"):
        """Build from an already-placed P('v','s') packed array — the
        multi-process path, where each host contributed only its own
        sample byte-shard (parallel/distributed.py)."""
        self = cls.__new__(cls)
        self.mesh = mesh
        self.packed, self.n, self.m, self.n_pad = packed, n, m, n_pad
        self._finish(center, scale, precision)
        return self

    def _finish(self, center, scale, precision):
        m_pad = self.packed.shape[0]
        self.m_pad = m_pad
        center = np.asarray(center, dtype=np.float64)
        scale = np.asarray(scale, dtype=np.float64)
        good = scale > 0
        c = np.full(m_pad, 2.0, dtype=np.float32)
        s = np.ones(m_pad, dtype=np.float32)
        c[:self.m] = np.where(good, center, 2.0)
        s[:self.m] = np.where(good, scale, 1.0)
        self.center = put_global(self.mesh, c, P("v"))
        self.scale = put_global(self.mesh, s, P("v"))
        self._cprod = cprod_fn(self.mesh, precision=precision)
        self._prod = prod_fn(self.mesh, precision=precision)
        self._power = power_both_fn(self.mesh, precision=precision)
        self._sV = P("s", None)
        self._sU = P("v", None)

    def cprod(self, V):
        V = np.asarray(V, dtype=np.float32)
        squeeze = V.ndim == 1
        if squeeze:
            V = V[:, None]
        Vp = np.zeros((self.n_pad, V.shape[1]), dtype=np.float32)
        Vp[:self.n] = V
        out = self._cprod(self.packed,
                          put_global(self.mesh, Vp, self._sV),
                          self.center, self.scale)
        res = fetch_global(out)[:self.m]
        return res[:, 0] if squeeze else res

    def prod(self, U):
        U = np.asarray(U, dtype=np.float32)
        squeeze = U.ndim == 1
        if squeeze:
            U = U[:, None]
        Up = np.zeros((self.m_pad, U.shape[1]), dtype=np.float32)
        Up[:self.m] = U
        out = self._prod(self.packed,
                         put_global(self.mesh, Up, self._sU),
                         self.center, self.scale)
        res = fetch_global(out)[:self.n]
        return res[:, 0] if squeeze else res

    def power(self, V):
        """One fused Krylov step: (X̃ᵀV, X̃X̃ᵀV) with a single dispatch
        (both collectives ride the mesh; nothing returns to host
        in between)."""
        V = np.asarray(V, dtype=np.float32)
        Vp = np.zeros((self.n_pad, V.shape[1]), dtype=np.float32)
        Vp[:self.n] = V
        B, Y = self._power(self.packed,
                           put_global(self.mesh, Vp, self._sV),
                           self.center, self.scale)
        return fetch_global(B)[:self.m], fetch_global(Y)[:self.n]

    def power_dev(self, V):
        """Traceable device-resident power step: V (n, l) jnp ->
        (B (m, l), Y (n, l)) jnp, no host transfer — lets the
        device-resident Krylov driver (linalg/randomsvd._device_krylov)
        run its whole loop on the mesh (only Ritz values cross the
        link per depth). Padding rows are all-NA (decode to 0), so the
        padded operator has identical non-zero spectrum."""
        l = V.shape[1]
        Vp = jnp.zeros((self.n_pad, l), jnp.float32)
        Vp = jax.lax.dynamic_update_slice(Vp, V.astype(jnp.float32), (0, 0))
        B, Y = self._power(self.packed, Vp, self.center, self.scale)
        return B[:self.m], Y[:self.n]


def pair_sums_fn(mesh: Mesh, precision="highest"):
    """Distributed snp_cor inner kernel: the six banded NA-aware
    pairwise-sum planes with the SAMPLE (byte) axis sharded over 's' —
    the biobank-n layout where each chip sums its sample shard and one
    psum over ICI merges the planes (the reference's per-pair sample
    loop, src/corr.cpp:58-75, as a sharded stacked GEMM; plane algebra
    identical to ops.corr._pair_sums_block).

    Takes (targets (B, nbytes), band (Wb, nbytes)) with nbytes sharded;
    the caller NA-pads tail bytes/pad bytes. Returns the (3B, 3Wb) G
    plane (exact integer sums in f32)."""
    from bigsnpr_tpu.core.unpack import unpack_codes

    def local(pt_loc, pb_loc):
        cb = pt_loc.shape[1]
        ct = unpack_codes(pt_loc, cb * 4)
        cc = unpack_codes(pb_loc, cb * 4)
        mt = (ct != 1).astype(jnp.float32)
        mb = (cc != 1).astype(jnp.float32)
        xt = (2 - ((ct + 1) >> 1)).astype(jnp.float32) * mt
        xb = (2 - ((cc + 1) >> 1)).astype(jnp.float32) * mb
        A = jnp.concatenate([xt, xt * xt, mt], axis=0)
        C = jnp.concatenate([xb, xb * xb, mb], axis=0)
        G = jnp.dot(A, C.T, preferred_element_type=jnp.float32,
                    precision=precision)
        return jax.lax.psum(G, "s")

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(None, "s"), P(None, "s")),
        out_specs=P(None, None)))


def colstats_fn(mesh: Mesh):
    """Jitted sharded per-variant (sum, ssq, nona) with psum over samples."""
    from bigsnpr_tpu.core.unpack import unpack_codes

    def local(packed_loc):
        n_loc = packed_loc.shape[1] * 4
        codes = unpack_codes(packed_loc, n_loc)
        na = codes == 1
        d = jnp.where(na, 0, 2 - ((codes + 1) >> 1)).astype(jnp.float32)
        sums = jnp.stack([
            jnp.sum(d, axis=1),
            jnp.sum(d * d, axis=1),
            jnp.sum(~na, axis=1).astype(jnp.float32),
        ])
        return jax.lax.psum(sums, "s")

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P("v", "s"),), out_specs=P(None, "v")))
