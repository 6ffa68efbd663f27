"""fe/free_energy.py: MD sampling protocols + pair-BAR drivers.

Parity target: reference tests/test_fe_free_energy.py strategy —
dataclass invariants, BAR estimates on analytic systems, HREX/bisection
drivers on a cheap harmonic ladder.
"""

import numpy as np
import pytest

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.fe.free_energy import (
    HREXParams,
    InitialState,
    MDParams,
    PairBarResult,
    Trajectory,
    WaterSamplingParams,
    assert_ensembles_compatible,
    assert_potentials_compatible,
    compute_u_kn,
    estimate_free_energy_bar,
    run_sims_bisection,
    run_sims_hrex,
    run_sims_sequential,
    sample,
)
from timemachine_tpu.fe.stored_arrays import StoredArrays
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.potentials import BoundPotential, HarmonicBond

TEMP = 300.0


def make_harmonic_state(lamb: float, k0: float = 20000.0, seed: int = 5) -> InitialState:
    """Two bonded atoms; lambda scales the bond force constant."""
    x0 = np.array([[0.0, 0, 0], [0.12, 0, 0]])
    hb = HarmonicBond(idxs=np.array([[0, 1]], dtype=np.int32))
    bps = [BoundPotential(hb, np.array([[k0 * (1.0 + lamb), 0.11]]))]
    intg = LangevinIntegrator(TEMP, 1.5e-3, 1.0, np.array([12.0, 12.0]), seed=seed)
    return InitialState(
        bps,
        intg,
        None,
        x0,
        np.zeros_like(x0),
        np.eye(3) * 10.0,
        lamb,
        np.array([0], dtype=np.int32),
        np.array([], dtype=np.int32),
    )


def test_md_params_validation():
    with pytest.raises(AssertionError):
        MDParams(n_frames=0, n_eq_steps=0, steps_per_frame=10, seed=1)
    with pytest.raises(AssertionError):
        MDParams(n_frames=1, n_eq_steps=0, steps_per_frame=0, seed=1)
    with pytest.raises(AssertionError):
        HREXParams(n_frames_per_iter=2)
    with pytest.raises(AssertionError):
        WaterSamplingParams(batch_size=100, n_proposals=10)
    # valid
    MDParams(n_frames=1, n_eq_steps=0, steps_per_frame=1, seed=1, hrex_params=HREXParams())


def test_trajectory_empty_and_extend():
    t = Trajectory.empty()
    assert len(t.frames) == 0
    t2 = Trajectory(StoredArrays.from_chunks([np.zeros((2, 3, 3))]), [np.eye(3)] * 2, None)
    t.extend(t2)
    assert len(t.frames) == 2


def test_sample_deterministic():
    """Same InitialState + MDParams ⇒ bitwise identical trajectory."""
    md_params = MDParams(n_frames=5, n_eq_steps=10, steps_per_frame=5, seed=3)
    t1 = sample(make_harmonic_state(0.0), md_params, max_buffer_frames=100)
    t2 = sample(make_harmonic_state(0.0), md_params, max_buffer_frames=100)
    np.testing.assert_array_equal(np.array(t1.frames), np.array(t2.frames))
    np.testing.assert_array_equal(np.array(t1.boxes), np.array(t2.boxes))
    np.testing.assert_array_equal(t1.final_velocities, t2.final_velocities)


def test_estimate_free_energy_bar_gaussian():
    """BAR on analytically-known Gaussian u_kln."""
    from timemachine_tpu.testsystems.gaussian1d import make_gaussian_ukln

    uklns, dfs = make_gaussian_ukln([0.0, 1.0], n_samples=4000, seed=9)
    u_kln, df_analytic = uklns[0], dfs[0]
    res = estimate_free_energy_bar(u_kln[None, :, :, :], TEMP)
    kBT = BOLTZ * TEMP
    assert res.dG / kBT == pytest.approx(df_analytic, abs=0.1)
    assert 0.0 < res.overlap <= 1.0
    assert res.dG_err > 0.0
    # single component: component decomposition must match the total
    assert res.dG_err_by_component.shape == (1,)
    assert res.overlap_by_component[0] == pytest.approx(res.overlap)


def test_estimate_free_energy_bar_nan_handling():
    from timemachine_tpu.testsystems.gaussian1d import make_gaussian_ukln

    uklns, _ = make_gaussian_ukln([0.0, 1.0], n_samples=500, seed=2)
    u_kln = np.array(uklns[0][None, :, :, :])
    u_kln[0, 0, 1, 3] = np.nan
    with pytest.warns(UserWarning, match="NaN"):
        res = estimate_free_energy_bar(u_kln, TEMP)
    assert np.isfinite(res.dG)


def test_run_sims_sequential_harmonic_analytic():
    """dG of stiffening a harmonic bond: ΔF = kT ln(k_b/k_a)^(1/2) per dof... up
    to rotational-entropy terms; validate against high-overlap BAR sanity."""
    md_params = MDParams(n_frames=60, n_eq_steps=200, steps_per_frame=10, seed=7)
    states = [make_harmonic_state(0.0), make_harmonic_state(1.0)]
    res, trajs = run_sims_sequential(states, md_params, TEMP)
    assert isinstance(res, PairBarResult)
    assert len(trajs) == 2
    assert len(trajs[0].frames) == 60
    # 1D radial dof stiffened 2x: dF ≈ 0.5 kT ln 2 for the vibration; the
    # centrifugal r² Jacobian contributes too. Just require small + positive.
    assert 0.0 < res.dGs[0] < 5.0
    assert res.overlaps[0] > 0.5

    u_kn, N_k = compute_u_kn(trajs, states)
    assert u_kn.shape == (2, 120)
    assert N_k.tolist() == [60, 60]
    assert np.all(np.isfinite(u_kn))


def test_run_sims_hrex_harmonic():
    md_params = MDParams(
        n_frames=12, n_eq_steps=50, steps_per_frame=5, seed=4, hrex_params=HREXParams(n_frames_bisection=2)
    )
    states = [make_harmonic_state(lamb) for lamb in (0.0, 0.5, 1.0)]
    pair_bar, trajs, diag, wsd = run_sims_hrex(states, md_params, print_diagnostics_interval=None)
    assert len(pair_bar.bar_results) == 2
    assert len(trajs) == 3
    assert all(len(t.frames) == 12 for t in trajs)
    rates = diag.cumulative_swap_acceptance_rates
    assert np.all(rates >= 0.0) and np.all(rates <= 1.0)
    assert wsd is None
    # permutation sanity: each iteration records a permutation of states
    for perm in diag.replica_idx_by_state_by_iter:
        assert sorted(perm) == [0, 1, 2]


def test_run_sims_bisection_converges():
    md_params = MDParams(n_frames=15, n_eq_steps=50, steps_per_frame=5, seed=6)
    results, trajs = run_sims_bisection(
        [0.0, 1.0],
        make_harmonic_state,
        md_params,
        n_bisections=3,
        temperature=TEMP,
        min_overlap=0.4,
        verbose=False,
    )
    lambdas = [s.lamb for s in results[-1].initial_states]
    assert lambdas[0] == 0.0 and lambdas[-1] == 1.0
    assert len(trajs) == len(lambdas)
    assert all(np.diff(lambdas) > 0)


def test_assert_potentials_compatible():
    s1, s2 = make_harmonic_state(0.0), make_harmonic_state(1.0)
    assert_potentials_compatible(s1.potentials, s2.potentials)  # params may differ

    s3 = make_harmonic_state(0.0)
    s3.potentials = [BoundPotential(HarmonicBond(idxs=np.array([[1, 0]], dtype=np.int32)), s3.potentials[0].params)]
    with pytest.raises(AssertionError):
        assert_potentials_compatible(s1.potentials, s3.potentials)


def test_assert_potentials_compatible_ignores_impl_switch():
    """get_context flips a sampled state's Nonbonded impl dense->pallas in
    place (free_energy.py get_context); a freshly built midpoint state in
    run_sims_bisection still carries impl='dense'. The compatibility check
    must treat the kernel switch (impl / tile sizing) as non-physics —
    regression for the TPU bisection crash ('values differ at impl')."""
    from timemachine_tpu.potentials import NonbondedAllPairs

    def make(impl):
        pot = NonbondedAllPairs(num_atoms=8, beta=2.0, cutoff=1.2, impl=impl)
        if impl == "tiled":
            pot.tiled_grid_dims = (2, 2, 2)
            pot.tiled_capacity = 16
        return [BoundPotential(pot, np.zeros((8, 4)))]

    assert_potentials_compatible(make("dense"), make("pallas"))
    assert_potentials_compatible(make("dense"), make("tiled"))

    # physics differences must still be caught
    changed = make("dense")
    changed[0].potential.beta = 3.0
    with pytest.raises(AssertionError):
        assert_potentials_compatible(make("pallas"), changed)


def test_assert_potentials_compatible_exec_config_scoping():
    """The impl/tile exemption is scoped to classes that declare the field in
    _EXEC_CONFIG_FIELDS: (a) it still applies when the Nonbonded is nested in
    a SummedPotential; (b) an unrelated potential with a physics field that
    happens to be named `impl` is still checked (ADVICE r4)."""
    import dataclasses

    from timemachine_tpu.potentials import NonbondedAllPairs, Potential, SummedPotential

    def make_summed(impl):
        nb = NonbondedAllPairs(num_atoms=8, beta=2.0, cutoff=1.2, impl=impl)
        summed = SummedPotential(potentials=[nb], params_init=[np.zeros((8, 4))])
        return [BoundPotential(summed, np.zeros((8 * 4,)))]

    assert_potentials_compatible(make_summed("dense"), make_summed("pallas"))

    @dataclasses.dataclass(eq=False)
    class FakePhysicsPot(Potential):
        impl: float = 1.0  # physics-meaningful, same name as the exec switch

        def __call__(self, conf, params, box):
            return 0.0

    a = [BoundPotential(FakePhysicsPot(impl=1.0), np.zeros(1))]
    b = [BoundPotential(FakePhysicsPot(impl=2.0), np.zeros(1))]
    with pytest.raises(AssertionError):
        assert_potentials_compatible(a, b)


def test_assert_ensembles_compatible():
    s1, s2 = make_harmonic_state(0.0), make_harmonic_state(1.0)
    assert_ensembles_compatible(s1, s2)

    s_hot = make_harmonic_state(1.0)
    s_hot.integrator = LangevinIntegrator(350.0, 1.5e-3, 1.0, np.array([12.0, 12.0]), seed=5)
    with pytest.raises(AssertionError):
        assert_ensembles_compatible(s1, s_hot)

    s_box = make_harmonic_state(1.0)
    s_box.box0 = np.eye(3) * 11.0
    with pytest.raises(AssertionError):
        assert_ensembles_compatible(s1, s_box)


def test_run_sims_hrex_local_md_fallback():
    """HREX + local MD routes through the time-multiplexed fallback driver
    (the sharded runner doesn't support local segments yet) and still
    produces a full set of trajectories and diagnostics."""
    from timemachine_tpu.fe.free_energy import LocalMDParams

    md_params = MDParams(
        n_frames=4,
        n_eq_steps=20,
        steps_per_frame=10,
        seed=8,
        hrex_params=HREXParams(n_frames_bisection=2),
        local_md_params=LocalMDParams(local_steps=5, k=10_000.0, min_radius=0.3, max_radius=0.5),
    )
    states = [make_harmonic_state(lamb) for lamb in (0.0, 1.0)]
    pair_bar, trajs, diag, wsd = run_sims_hrex(states, md_params, print_diagnostics_interval=None)
    assert len(trajs) == 2
    assert all(len(t.frames) == 4 for t in trajs)
    assert np.all(np.isfinite(np.array([t.frames[-1] for t in trajs])))
    for perm in diag.replica_idx_by_state_by_iter:
        assert sorted(perm) == [0, 1]


def test_replica_exchange_checkpoint_resume_bitwise():
    """ReplicaExchangeRunner.state_dict/load_state_dict: resuming mid-run is
    bitwise identical to running straight through (stateless fold_in RNG)."""
    import pickle

    from timemachine_tpu.fe.free_energy import get_context
    from timemachine_tpu.md.hrex import get_swap_attempts_per_iter_heuristic
    from timemachine_tpu.parallel.replica_exchange import ReplicaExchangeRunner

    states = [make_harmonic_state(lamb) for lamb in (0.0, 0.5, 1.0)]

    def make_runner():
        ctx = get_context(states[0])
        return ReplicaExchangeRunner(
            ctx,
            [[np.asarray(bp.params) for bp in s.potentials] for s in states],
            temperature=TEMP,
            neighbor_pairs=[(0, 1), (1, 2)],
            n_swap_attempts_per_iter=get_swap_attempts_per_iter_heuristic(3),
            max_delta_states=2,
            seed=13,
        )

    r1 = make_runner()
    r1.initialize([s.x0 for s in states], [s.v0 for s in states], [s.box0 for s in states])
    for _ in range(2):
        r1.advance_frame(5)
    blob = pickle.dumps(r1.state_dict())
    res_a = [r1.advance_frame(5) for _ in range(2)]

    r2 = make_runner()
    r2.load_state_dict(pickle.loads(blob))
    res_b = [r2.advance_frame(5) for _ in range(2)]

    for a, b in zip(res_a, res_b):
        np.testing.assert_array_equal(a.frames_by_state, b.frames_by_state)
        np.testing.assert_array_equal(a.replica_idx_by_state, b.replica_idx_by_state)
        np.testing.assert_array_equal(a.accepted_by_pair, b.accepted_by_pair)
