"""Bitwise/golden-value regression guards (SURVEY §4: the reference marks
such tests `fixed_output`). These pin the energy model on a deterministic
water box — any change to the nonbonded math, builder geometry, or
parameterization shifts these values and must be intentional."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fixed_output


@pytest.fixture(scope="module")
def golden_system():
    from timemachine_tpu.md.builders import build_water_system

    return build_water_system(1.8, seed=2024)


def test_water_box_geometry_fixed(golden_system):
    hc = golden_system
    assert hc.conf.shape == (582, 3)
    assert float(hc.box[0, 0]) == pytest.approx(1.8)


def test_energies_fixed(golden_system):
    """Golden values computed at d429742 (f64, CPU)."""
    hc = golden_system
    box = jnp.asarray(hc.box)
    x = jnp.asarray(hc.conf)
    by_name = {}
    for bp in hc.host_system.get_U_fns():
        name = type(bp.potential).__name__
        by_name[name] = by_name.get(name, 0.0) + float(bp(x, box))

    # lattice-built waters are at their rigid geometry: bonded terms ~ 0
    assert by_name["HarmonicBond"] == pytest.approx(0.0, abs=1e-20)
    assert by_name["HarmonicAngle"] == pytest.approx(0.0, abs=1e-20)
    assert by_name["PeriodicTorsion"] == pytest.approx(0.0, abs=1e-20)
    # golden nonbonded energy (JC/TIP3P box, reaction-field erfc, cutoff 1.2)
    assert by_name["Nonbonded"] == pytest.approx(114.96197597328344, rel=1e-10)


def test_total_gradient_norm_fixed(golden_system):
    hc = golden_system
    box = jnp.asarray(hc.box)
    bps = hc.host_system.get_U_fns()
    g = jax.grad(lambda xx: sum(bp(xx, box) for bp in bps))(jnp.asarray(hc.conf))
    assert float(jnp.linalg.norm(g)) == pytest.approx(18082.542749497265, rel=1e-9)


def test_trajectory_bitwise_reproducible(golden_system):
    """Same (state, seed) => bitwise identical frames, independent of frame
    chunking (the threefry fold_in(key, global_step) contract)."""
    from timemachine_tpu.integrators import LangevinIntegrator
    from timemachine_tpu.md.builders import build_water_system
    from timemachine_tpu.md.context import Context

    # box must exceed 2x cutoff for the Context's minimum-image validity check
    hc = build_water_system(2.5, seed=2024)
    bps = hc.host_system.get_U_fns()

    def run(chunks):
        intg = LangevinIntegrator(300.0, 1e-3, 1.0, hc.masses, seed=7)
        ctxt = Context(hc.conf, np.zeros_like(hc.conf), hc.box, intg, bps)
        for n in chunks:
            ctxt.multiple_steps(n)
        return ctxt.get_x_t()

    x_once = run([30])
    x_chunked = run([10, 5, 15])
    np.testing.assert_array_equal(x_once, x_chunked)


def test_hrex_replica_parallel_fixed_output():
    """The replica-parallel HREX driver is bitwise deterministic from
    (InitialStates, MDParams): pinned digest over final frames + the full
    permutation history (regenerate only for intentional changes to the
    sampling path; digest from 2026-08-17, XLA:CPU x64)."""
    import hashlib

    from tests.test_free_energy import make_harmonic_state

    from timemachine_tpu.fe.free_energy import HREXParams, MDParams, run_sims_hrex

    md = MDParams(
        n_frames=6, n_eq_steps=10, steps_per_frame=5, seed=11, hrex_params=HREXParams(n_frames_bisection=2)
    )
    states = [make_harmonic_state(lamb) for lamb in (0.0, 0.5, 1.0)]
    _, trajs, diag, _ = run_sims_hrex(states, md, print_diagnostics_interval=None)
    m = hashlib.sha256()
    for t in trajs:
        m.update(np.ascontiguousarray(np.asarray(t.frames[-1], np.float64)).tobytes())
    m.update(np.asarray(diag.replica_idx_by_state_by_iter).tobytes())
    # regolded when the bonded force path switched from the autodiff adjoint
    # to the closed-form gather/scatter implementation (same physics, bitwise
    # different summation order); previous golden: f59d1a62e7f3387a
    assert m.hexdigest()[:16] == "44ad5446b4aa489a"
