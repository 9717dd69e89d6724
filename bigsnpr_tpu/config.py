"""Global configuration / flag system.

The reference's knobs are two global options plus env vars
(options(bigstatsr.check.args), BIGSNPR_CRAN — SURVEY.md §5 config row);
here every option lives in one table with env-var overrides
(BIGSNPR_<NAME>) and a scoped `options()` context manager.

- matmul_precision: TPU MXU f32 matmuls default to bf16 passes; parity
  with the reference's double-precision C++ kernels needs
  full-precision accumulation. Ops read it at trace time; "default"
  trades accuracy for ~3-6x matmul throughput.
- check_args: gates the declarative argument-contract table
  (utils/assertions.py).
- pallas_mxu: MXU scheme of the fused decode+GEMM kernels
  ("highest" = 6-pass f32; "split2" = exact-integer bf16 bit planes).
"""

import os
from contextlib import contextmanager

import jax.lax

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

matmul_precision: str = os.environ.get("BIGSNPR_MATMUL_PRECISION", "highest")
pallas_mxu: str = os.environ.get("BIGSNPR_PALLAS_MXU", "highest")


def set_matmul_precision(name: str) -> None:
    global matmul_precision
    assert name in _PRECISIONS, f"unknown precision {name!r}"
    matmul_precision = name


def dot_precision():
    return _PRECISIONS[matmul_precision]


def get_option(name: str):
    from bigsnpr_tpu.utils import assertions

    if name == "matmul_precision":
        return matmul_precision
    if name == "pallas_mxu":
        return pallas_mxu
    if name == "check_args":
        return assertions.get_check_args()
    raise KeyError(name)


def set_option(name: str, value) -> None:
    global pallas_mxu
    from bigsnpr_tpu.utils import assertions

    if name == "matmul_precision":
        set_matmul_precision(value)
    elif name == "pallas_mxu":
        assert value in ("highest", "split2", "int8"), value
        pallas_mxu = value
    elif name == "check_args":
        assertions.set_check_args(bool(value))
    else:
        raise KeyError(name)


@contextmanager
def options(**kw):
    """Scoped option override: with options(matmul_precision='default'):"""
    old = {k: get_option(k) for k in kw}
    try:
        for k, v in kw.items():
            set_option(k, v)
        yield
    finally:
        for k, v in old.items():
            set_option(k, v)


def enable_compilation_cache(path: str | None = None) -> str:
    """Persist XLA compilations to disk so a second cold process reuses
    them (the big bench shape took a 550 s first compile in round 2;
    with the cache a fresh process loads it in seconds).

    Call BEFORE the first jit execution. Default location
    ~/.cache/bigsnpr_tpu_xla, override with $BIGSNPR_COMPILE_CACHE.
    Returns the cache directory."""
    import jax

    path = path or os.environ.get(
        "BIGSNPR_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "bigsnpr_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache even quick compiles: the tunnel round-trip dominates anyway
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — flag name varies across jax versions
        pass
    return str(path)
