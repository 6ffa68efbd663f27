"""Sorted-state MD fast path (md/context.py): the Context carries x/v in the
Pallas provider's pad_order space, eliminating the per-step coordinate
gathers and the un-sort force epilogue (measured 1.167 -> 0.688 ms/step at
23k atoms, scripts/probe_sorted.py).

Equivalence contract tested here:

1. With friction=0 (cc == 0, so the differently-shaped noise draw is
   multiplied away) the sorted and canonical paths run the same per-atom
   arithmetic on permuted arrays. They agree to ~1 ulp/step — but NOT
   bitwise: XLA makes FMA-contraction / reassociation decisions per fusion
   cluster, so two structurally different programs (and even two call sites
   of the same function inside ONE program) can round identically-valued
   subexpressions differently. Measured on XLA:CPU: residual_force evaluated
   twice in one jit at bitwise-identical inputs — one result consumed
   plainly, one through a gather — differs on 669/4680 elements at ~1e-26,
   and one integrator step seeds ~1-ulp f64 velocity differences. Bitwise
   equality across differently-structured programs is not a property the
   compiler offers; the honest contract is ulp-level agreement, which this
   test pins tightly (30 steps, rtol 1e-11 ~ 50x the measured 4e-13).

2. Chunking invariance IS bitwise, for both the sorted and canonical paths:
   fold_in(key, global_step) noise plus provider states carried across
   multiple_steps calls (Context._prov_states) mean the trajectory cannot
   depend on how steps are split across calls. (Before the carry fix,
   every multiple_steps entry rebuilt the tile lists, changing the f32
   sweep summation order at chunk boundaries — both paths drifted at
   ~1e-7 after 30 steps.)
"""

import numpy as np
import pytest

from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.barostat import MonteCarloBarostat
from timemachine_tpu.md.builders import build_water_system
from timemachine_tpu.md.context import Context
from timemachine_tpu.md.utils import sample_velocities


@pytest.fixture(scope="module")
def water_pallas():
    host_config = build_water_system(2.5)
    bps = host_config.host_system.get_U_fns()
    nb = host_config.host_system.nonbonded_all_pairs.potential
    nb.configure_pallas(host_config.box, host_config.conf, interpret=True)
    # f64 carry: the suite enables x64 and the barostat promotes under it; on
    # TPU the whole loop runs f32 without x64. Parity below only needs both
    # paths on the SAME dtype.
    x0 = np.asarray(host_config.conf, np.float64)
    box = np.asarray(host_config.box, np.float64)
    masses = np.asarray(host_config.masses)
    groups = list(host_config.host_topology.group_idxs)
    return x0, box, masses, bps, groups


def _run(water_pallas, friction, n_steps, store_interval, monkeypatch, sorted_mode, seed=2026):
    x0, box, masses, bps, groups = water_pallas
    if not sorted_mode:
        monkeypatch.setenv("TM_SORTED_MD", "0")
    else:
        monkeypatch.delenv("TM_SORTED_MD", raising=False)
    intg = LangevinIntegrator(300.0, 1e-3, friction, masses, seed=seed)
    baro = MonteCarloBarostat(len(masses), 1.013, 300.0, groups, 7, seed=seed + 1)
    v0 = sample_velocities(masses, 300.0, seed=seed + 2).astype(np.float64)
    ctxt = Context(x0, v0, box, intg, bps, movers=[baro])
    xs, boxes = ctxt.multiple_steps(n_steps, store_x_interval=store_interval)
    activated = ctxt._sorted_machinery is not None
    return xs, boxes, ctxt.get_x_t(), ctxt.get_v_t(), ctxt.get_box(), activated


def test_sorted_path_matches_canonical_at_zero_friction(water_pallas, monkeypatch):
    """Ulp-level trajectory agreement (see module docstring for why not
    bitwise). Boxes must still be bitwise: barostat accept decisions are
    discrete, so any box difference means a flipped MC decision."""
    xs_c, boxes_c, x_c, v_c, b_c, act_c = _run(water_pallas, 0.0, 30, 10, monkeypatch, sorted_mode=False)
    xs_s, boxes_s, x_s, v_s, b_s, act_s = _run(water_pallas, 0.0, 30, 10, monkeypatch, sorted_mode=True)
    assert not act_c, "TM_SORTED_MD=0 must force the canonical path"
    assert act_s, "sorted fast path did not activate on the Pallas-configured Context"
    np.testing.assert_allclose(xs_s, xs_c, rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(x_s, x_c, rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(v_s, v_c, rtol=1e-9, atol=1e-11)
    np.testing.assert_array_equal(boxes_s, boxes_c)
    np.testing.assert_array_equal(b_s, b_c)


@pytest.mark.parametrize("sorted_mode", [True, False], ids=["sorted", "canonical"])
def test_chunking_invariance_is_bitwise(water_pallas, monkeypatch, sorted_mode):
    """fold_in(key, global_step) + provider states carried across
    multiple_steps calls: bitwise-identical trajectories regardless of frame
    chunking, on BOTH the sorted fast path and the canonical Pallas path
    (same contract as test_context.py::test_context_determinism...)."""
    x0, box, masses, bps, groups = water_pallas
    if sorted_mode:
        monkeypatch.delenv("TM_SORTED_MD", raising=False)
    else:
        monkeypatch.setenv("TM_SORTED_MD", "0")

    def run(chunks):
        intg = LangevinIntegrator(300.0, 1e-3, 1.0, masses, seed=7)
        baro = MonteCarloBarostat(len(masses), 1.013, 300.0, groups, 7, seed=8)
        v0 = sample_velocities(masses, 300.0, seed=9).astype(np.float64)
        ctxt = Context(x0, v0, box, intg, bps, movers=[baro])
        for n in chunks:
            ctxt.multiple_steps(n)
        assert (ctxt._sorted_machinery is not None) == sorted_mode
        return ctxt.get_x_t(), ctxt.get_v_t(), ctxt.get_box()

    x1, v1, b1 = run([30])
    x2, v2, b2 = run([10, 5, 15])
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(b1, b2)


def test_sorted_path_stays_finite_with_noise(water_pallas, monkeypatch):
    xs, boxes, x_t, v_t, b_t, act = _run(water_pallas, 1.0, 40, 20, monkeypatch, sorted_mode=True)
    assert act
    assert np.all(np.isfinite(xs)) and np.all(np.isfinite(x_t)) and np.all(np.isfinite(v_t))
