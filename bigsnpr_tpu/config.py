"""Global numeric configuration.

TPU MXU f32 matmuls default to bf16 passes; parity with the reference's
double-precision C++ kernels needs full-precision accumulation. Ops read
`matmul_precision` at trace time; set to "default" to trade accuracy for
~3-6x matmul throughput on TPU (e.g. for exploratory runs and benches).
"""

import jax.lax

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

matmul_precision: str = "highest"


def set_matmul_precision(name: str) -> None:
    global matmul_precision
    assert name in _PRECISIONS, f"unknown precision {name!r}"
    matmul_precision = name


def dot_precision():
    return _PRECISIONS[matmul_precision]
