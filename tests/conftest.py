"""Test harness: force an 8-device virtual CPU mesh so sharding/collective
paths are exercised without TPU hardware (SURVEY.md §4 test strategy (b)).

NOTE: this container preimports jax at interpreter startup (axon sitecustomize)
with JAX_PLATFORMS=axon, so setting env vars here is too late for jax's config
defaults — we must use jax.config.update before the first backend use. XLA_FLAGS
is still read by the CPU client at backend-init time, which happens lazily, so
setting it here works as long as no test touched a backend at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Geometry/solver numerics assume fp32 matmuls; keep tests honest about what
# the TPU path must opt into explicitly (precision=HIGHEST at call sites).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
