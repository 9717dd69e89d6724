"""Test config: force an 8-device virtual CPU mesh before jax initializes.

This is the shard-count-invariance harness the reference lacks (its analog
is the ncores=1 vs ncores=2 bit-equality suite,
reference tests/testthat/test-7-OpenMP.R:11-80) — see SURVEY.md §4.6.

NOTE: env-var JAX_PLATFORMS is overridden by the axon TPU plugin in this
image; only the config API reliably selects CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("BIGSNPR_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def example_pack():
    """The reference's bundled 517 x 4,542 dataset, if present."""
    from bigsnpr_tpu import snp_attachExtdata

    try:
        return snp_attachExtdata("example.bed")
    except FileNotFoundError:
        pytest.skip("reference extdata not available")


@pytest.fixture(scope="session")
def example_missing_pack():
    from bigsnpr_tpu import snp_attachExtdata

    try:
        return snp_attachExtdata("example-missing.bed")
    except FileNotFoundError:
        pytest.skip("reference extdata not available")


def dense_standardized(pack, center, scale):
    """Oracle: dense standardized matrix with NA -> 0 (mean imputation)."""
    X = pack.to_dosage()  # (n, m) with NaN
    Xt = (X - np.asarray(center)) / np.asarray(scale)
    return np.nan_to_num(Xt, nan=0.0)
