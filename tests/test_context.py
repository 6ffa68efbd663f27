"""Context (scan MD loop), integrator, and barostat behavior tests.

Mirrors reference tests: test_reference_langevin_integrator.py (update
semantics), test_determinism.py (bitwise reproducibility contract),
test_barostat.py (volume equilibration, adaptive proposal width).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.integrators import LangevinIntegrator, langevin_coefficients, langevin_step, sample_velocities
from timemachine_tpu.md.barostat import CentroidRescaler, MonteCarloBarostat
from timemachine_tpu.md.context import Context
from timemachine_tpu.potentials import HarmonicBond, NonbondedAllPairs

from .reference_loader import load_reference_module

ref_integrator = load_reference_module("timemachine.integrator")


def test_langevin_coefficients_match_reference():
    masses = np.array([1.0, 12.0, 16.0, np.inf])
    ca, cb, cc = langevin_coefficients(300.0, 2.5e-3, 1.0, masses)
    ca_r, cb_r, cc_r = ref_integrator.langevin_coefficients(300.0, 2.5e-3, 1.0, masses[:3])
    assert np.isclose(ca, ca_r)
    np.testing.assert_allclose(cb[:3], cb_r)
    np.testing.assert_allclose(cc[:3], cc_r)
    # infinite mass freezes
    assert cb[3] == 0.0 and cc[3] == 0.0


def test_langevin_step_matches_reference(rng):
    """Same force, same noise -> identical update (ref integrator.py:137-144).
    Note reference's step uses force_fxn directly (already -dU/dx)."""
    n = 10
    x = rng.normal(size=(n, 3))
    v = rng.normal(size=(n, 3))
    masses = rng.uniform(1, 20, n)
    k_spring = 100.0

    def force(x):
        return -k_spring * x

    ref = ref_integrator.LangevinIntegrator(force, masses, 300.0, 2.5e-3, 1.0)
    noise = rng.normal(size=(n, 3))
    x_ref, v_ref = ref._step(x, v, noise)

    ca, cb, cc = langevin_coefficients(300.0, 2.5e-3, 1.0, masses)
    x_mine, v_mine = langevin_step(x, v, force(x), noise, ca, cb[:, None], cc[:, None], 2.5e-3)
    np.testing.assert_allclose(np.asarray(x_mine), np.asarray(x_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v_mine), np.asarray(v_ref), rtol=1e-12)


def _dimer_system(n_dimers=8, box_width=3.0, seed=2026):
    """Tiny box of harmonic dimers with purely repulsive LJ — fast, stable."""
    rng = np.random.default_rng(seed)
    n = n_dimers * 2
    x = np.zeros((n, 3))
    centers = rng.uniform(0.5, box_width - 0.5, (n_dimers, 3))
    x[0::2] = centers
    x[1::2] = centers + np.array([0.1, 0, 0])
    bond_idxs = np.array([[2 * i, 2 * i + 1] for i in range(n_dimers)], dtype=np.int32)
    bond_params = np.tile([10000.0, 0.1], (n_dimers, 1))
    nb_params = np.zeros((n, 4))
    nb_params[:, 1] = 0.05  # sig/2
    nb_params[:, 2] = 0.5  # sqrt(eps)
    box = np.eye(3) * box_width
    masses = np.full(n, 12.0)
    bps = [
        HarmonicBond(bond_idxs).bind(bond_params),
        NonbondedAllPairs(n, beta=2.0, cutoff=1.2).bind(nb_params),
    ]
    return x, box, masses, bps, bond_idxs


def test_context_determinism_and_chunking_invariance():
    """(seed, x0) -> bitwise-identical trajectory, regardless of how steps are
    chunked into frames — the TPU restatement of the reference's determinism
    contract (tests/test_determinism.py)."""
    x0, box, masses, bps, _ = _dimer_system()
    intg = LangevinIntegrator(temperature=300.0, dt=1e-3, friction=1.0, masses=masses, seed=42)
    v0 = np.zeros_like(x0)

    ctxt1 = Context(x0, v0, box, intg, bps)
    xs1, _ = ctxt1.multiple_steps(100, store_x_interval=10)

    ctxt2 = Context(x0, v0, box, intg, bps)
    xs2, _ = ctxt2.multiple_steps(100, store_x_interval=25)

    ctxt3 = Context(x0, v0, box, intg, bps)
    xs3, _ = ctxt3.multiple_steps(100, store_x_interval=10)

    np.testing.assert_array_equal(xs1, xs3)  # bitwise
    np.testing.assert_allclose(xs1[-1], xs2[-1], rtol=1e-12)  # chunking-invariant
    np.testing.assert_allclose(ctxt1.get_x_t(), ctxt2.get_x_t(), rtol=1e-12)


def test_context_temperature_equilibration():
    """Average KE matches (3/2) kT per atom under the Langevin thermostat."""
    x0, box, masses, bps, _ = _dimer_system(n_dimers=16)
    temp = 300.0
    intg = LangevinIntegrator(temperature=temp, dt=1e-3, friction=10.0, masses=masses, seed=7)
    key = jax.random.key(3)
    v0 = np.asarray(sample_velocities(masses, temp, key))
    ctxt = Context(x0, v0, box, intg, bps)
    ctxt.multiple_steps(200)

    kes = []
    for _ in range(40):
        ctxt.multiple_steps(20)
        v = ctxt.get_v_t()
        kes.append(0.5 * np.sum(masses[:, None] * v**2))
    mean_ke = np.mean(kes)
    expected = 1.5 * len(masses) * BOLTZ * temp
    assert abs(mean_ke - expected) / expected < 0.15


def test_centroid_rescaler(rng):
    groups = [np.array([0, 1, 2]), np.array([3, 4]), np.array([5])]
    coords = jnp.asarray(rng.normal(size=(6, 3)))
    r = CentroidRescaler(groups)
    centroids = np.asarray(r.compute_centroids(coords))
    np.testing.assert_allclose(centroids[0], np.asarray(coords[:3]).mean(0), rtol=1e-12)
    np.testing.assert_allclose(centroids[1], np.asarray(coords[3:5]).mean(0), rtol=1e-12)

    center = jnp.zeros(3)
    scaled = np.asarray(r.scale_centroids(coords, center, 1.1))
    new_centroids = np.asarray(r.compute_centroids(jnp.asarray(scaled)))
    np.testing.assert_allclose(new_centroids, 1.1 * centroids, rtol=1e-10)
    # intra-group geometry rigid
    d_before = np.linalg.norm(coords[0] - coords[1])
    d_after = np.linalg.norm(scaled[0] - scaled[1])
    np.testing.assert_allclose(d_before, d_after, rtol=1e-10)


def test_barostat_moves_volume():
    """NPT on the dimer fluid: barostat fires, counters advance, box changes,
    trajectory stays finite (ref tests/test_barostat.py)."""
    x0, box, masses, bps, bond_idxs = _dimer_system(n_dimers=12, box_width=3.0)
    intg = LangevinIntegrator(temperature=300.0, dt=1e-3, friction=1.0, masses=masses, seed=11)
    groups = [np.array([2 * i, 2 * i + 1]) for i in range(12)]
    baro = MonteCarloBarostat(
        num_atoms=len(masses), pressure=1.013, temperature=300.0, group_idxs=groups, interval=5, seed=12
    )
    v0 = np.asarray(sample_velocities(masses, 300.0, jax.random.key(5)))
    ctxt = Context(x0, v0, box, intg, bps, movers=[baro])
    ctxt.multiple_steps(300)
    _, state = ctxt.get_barostat()
    assert int(state.total_attempted) == 300 // 5
    assert int(state.total_accepted) > 0
    assert not np.allclose(ctxt.get_box(), box)
    assert np.all(np.isfinite(ctxt.get_x_t()))


def test_validate_box_vs_cutoff():
    x0, box, masses, bps, _ = _dimer_system(box_width=2.0)  # 2.0 < 2*1.2
    intg = LangevinIntegrator(temperature=300.0, dt=1e-3, friction=1.0, masses=masses, seed=1)
    ctxt = Context(x0, np.zeros_like(x0), box, intg, bps)
    with pytest.raises(RuntimeError, match="box"):
        ctxt.multiple_steps(1)


def test_velocity_verlet_through_context():
    """Context.multiple_steps with VelocityVerletIntegrator reproduces the
    reference leapfrog (initialize / kick-drift / finalize semantics,
    ref verlet_integrator.cu) and conserves energy."""
    from timemachine_tpu.integrator import velocity_verlet_trajectory
    from timemachine_tpu.integrators import VelocityVerletIntegrator

    x0, box, masses, bps, _ = _dimer_system()
    v0 = np.zeros_like(x0)
    n_steps = 50

    intg = VelocityVerletIntegrator(dt=5e-4, masses=masses)
    ctxt = Context(x0, v0, box, intg, bps)
    u0 = ctxt.compute_u_t()
    ctxt.multiple_steps(n_steps)
    x_ctx, v_ctx = ctxt.get_x_t(), ctxt.get_v_t()

    import jax
    import jax.numpy as jnp

    boxj = jnp.asarray(box)
    force_fn = lambda x: -jax.grad(lambda xx: sum(bp(xx, boxj) for bp in bps))(x)
    cb = jnp.asarray((5e-4 / masses)[:, None])
    xs, vs = velocity_verlet_trajectory(x0, v0, force_fn, cb, n_steps, 5e-4)
    np.testing.assert_allclose(x_ctx, np.asarray(xs[-1]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(v_ctx, np.asarray(vs[-1]), rtol=1e-10, atol=1e-12)

    # symplectic energy behavior: total energy drift is small
    ke = 0.5 * np.sum(masses[:, None] * v_ctx**2)
    u1 = ctxt.compute_u_t()
    assert abs((u1 + ke) - (u0 + 0.0)) < 0.05 * max(1.0, abs(u0))
