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

# -- quick lane (VERDICT r4 item 8) ------------------------------------------
# The default suite runs ~40 min wall; the reference keeps its inner loop
# fast by splitting nocuda/unit from nightly (pytest.ini markers). Here the
# split is by module: everything NOT in _SLOW_MODULES is auto-marked `quick`,
# so `pytest -m quick` is the <10 min inner loop and `pytest` (default) stays
# the full pre-commit gate. Curated from --durations of the r5 suite run.
_SLOW_MODULES = {
    # curated from the r5 full-suite --durations run (aggregate s/module)
    "test_consistency.py",  # 325s: dense-oracle impl/dtype matrices on the DHFR crop
    "test_sorted_md.py",  # 281s: dual-path MD trajectory-contract sweeps
    "test_potential_matrix.py",  # 202s: per-potential tolerance matrices on RBFE states
    "test_spatial_md.py",  # 112s: mesh-decomposed MD parity runs
    "test_builders_minimizer.py",  # 105s: FIRE + NPT water-box integration
    "test_dotscan.py",  # 100s: MXU-kernel A/B parity
    "test_rbfe_default.py",  # 99s: small end-to-end RBFE legs
    "test_mtm.py",  # 91s: MTM reference-vs-optimized equivalence
    "test_examples.py",  # subprocess-run example scripts (nightly anyway)
    "test_exchange.py",  # two-start water-occupancy convergence runs
    "test_smc_enhanced.py",  # SMC annealing + enhanced-sampling integration
    "test_local_md.py",  # local-MD trajectory comparisons
    "test_fixed_output.py",  # golden-digest trajectory regeneration
    "test_rbfe_cycle.py",  # nightly-scale cycle closure (mostly deselected)
    "test_quadscan.py",  # packed-tile kernel parity
    "test_rowscan_sharded.py",  # sharded-sweep parity over virtual meshes
    "test_provider_rebuild.py",  # skin/rebuild trajectory comparisons
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nightly/tpu tests must never enter the quick lane: running
        # `-m quick` REPLACES the default `-m 'not nightly and not tpu'`
        # filter, so without this guard a nightly full-RBFE test would leak
        # in and blow the <10 min budget (measured r5: test_charge_sensitivity
        # ground the lane for 50+ min)
        if (
            os.path.basename(str(item.fspath)) in _SLOW_MODULES
            or "nightly" in item.keywords
            or "tpu" in item.keywords
        ):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(2026)
