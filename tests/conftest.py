"""Test configuration.

Tests run on CPU with 8 virtual XLA devices (the same trick the reference
uses, tests/conftest.py:10-22) so multi-device sharding paths (HREX replica
parallelism) are exercised without TPU hardware. x64 is enabled for tight
agreement with the reference's JAX semantics; the engine itself is
dtype-polymorphic.
"""

import os

# The axon sitecustomize force-registers the TPU platform at interpreter
# start; overriding the config (not just the env var) after import is what
# actually selects CPU here.
os.environ["JAX_PLATFORMS"] = "cpu"
# --xla_backend_optimization_level=0: jax 0.9.0's XLA:CPU LLVM pipeline
# miscompiles gather/select-heavy programs NONDETERMINISTICALLY at the default
# optimization level (answers differ by O(0.1-1) kJ/mol between compilations of
# the same trace; see tests/test_neighborlist.py::test_compilation_determinism).
# Disabling backend optimization restores correctness on CPU. TPU execution
# (bench.py, production) does not go through this code path.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8 --xla_backend_optimization_level=0"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest
from hypothesis import settings

settings.register_profile("no-deadline", deadline=None)
settings.load_profile("no-deadline")


@pytest.fixture
def rng():
    return np.random.default_rng(2026)
