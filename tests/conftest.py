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
# Historical note: round 1 ran the whole suite with
# --xla_backend_optimization_level=0 because jax 0.9.0's XLA:CPU LLVM pipeline
# miscompiled the then-current vmap-of-gather neighborlist formulation
# NONDETERMINISTICALLY at the default optimization level. The kernel was
# reformulated as a chunked scan (ops/neighborlist.py), which compiles
# correctly at the default level (pinned by
# tests/test_neighborlist.py::test_compilation_determinism, 20-trial sweep) —
# so the suite now runs fully optimized. Set TM_TEST_XLA_DEOPT=1 to restore
# the old behavior when triaging a suspected XLA:CPU miscompile.
_deopt = " --xla_backend_optimization_level=0" if os.environ.get("TM_TEST_XLA_DEOPT") == "1" else ""
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8" + _deopt
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
