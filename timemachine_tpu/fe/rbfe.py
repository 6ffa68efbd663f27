"""Relative binding free energy (RBFE) pipeline: vacuum / solvent / complex
legs over a SingleTopology alchemical transformation.

Parity target: reference `timemachine/fe/rbfe.py` — state setup (:88-230),
coordinate optimization along the schedule (:348-545), the three estimators
(sequential :548-632, bisection :649-776, bisection+HREX :778-1067), and the
run_vacuum/run_solvent/run_complex wrappers (:1069-1162).

TPU notes: states are pure-JAX potentials + descriptors (no GPU impl
construction); force checks use jax.grad of the summed potential; HREX
delegates to fe/free_energy.run_sims_hrex (single-chip) — the multi-chip
SPMD path is parallel/hrex_sharded.run_hrex_sharded.
"""

from __future__ import annotations

import pickle
import warnings
from dataclasses import dataclass, replace
from functools import partial
from typing import Callable, Iterable, Optional, Sequence, Union, cast

import jax
import numpy as np
from numpy.typing import NDArray

from timemachine_tpu.constants import (
    DEFAULT_POSITIONAL_RESTRAINT_K,
    DEFAULT_PRESSURE,
    DEFAULT_TEMP,
)
from timemachine_tpu.fe import model_utils
from timemachine_tpu.fe.free_energy import (
    HostConfig,
    HREXParams,
    HREXPlots,
    HREXSimulationResult,
    InitialState,
    MDParams,
    RESTParams,
    SimulationResult,
    Trajectory,
    compute_u_kn,
    make_pair_bar_plots,
    run_sims_bisection,
    run_sims_hrex,
    run_sims_sequential,
)
from timemachine_tpu.fe.lambda_schedule import bisection_lambda_schedule
from timemachine_tpu.fe.mbar import MBAR
from timemachine_tpu.fe.single_topology import AtomMapFlags, SingleTopology
from timemachine_tpu.fe.system import HostSystem
from timemachine_tpu.fe.utils import bytes_to_id, get_mol_name, get_romol_conf
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md import builders, minimizer
from timemachine_tpu.md.barostat import MonteCarloBarostat
from timemachine_tpu.md.fire import ScipyMinimizationConfig
from timemachine_tpu.md.utils import get_bond_list, get_group_indices, sample_velocities
from timemachine_tpu.ops.pbc import idxs_within_cutoff, lifted_distance_on_pairs
from timemachine_tpu.optimize.protocol import (
    greedily_optimize_protocol,
    make_fast_approx_overlap_distance_fxn,
)
from timemachine_tpu.potentials import BoundPotential

DEFAULT_NUM_WINDOWS = 48

# arbitrary small bound so seeds stay readable in logs (ref rbfe.py:54-56)
MAX_SEED_VALUE = 10000

DEFAULT_MD_PARAMS = MDParams(n_frames=1000, n_eq_steps=10_000, steps_per_frame=400, seed=2023, hrex_params=None)

DEFAULT_HREX_PARAMS = replace(DEFAULT_MD_PARAMS, hrex_params=HREXParams(n_frames_bisection=100))

DEFAULT_REST_PARAMS = replace(
    DEFAULT_HREX_PARAMS,
    hrex_params=replace(
        DEFAULT_HREX_PARAMS.hrex_params,
        rest_params=RESTParams(max_temperature_scale=3.0, temperature_scale_interpolation="exponential"),
    ),
)


@dataclass
class Host:
    system: HostSystem
    physical_masses: list
    conf: NDArray
    box: NDArray
    num_water_atoms: int
    host_topology: object


def _get_default_state_minimization_config():
    """(ref rbfe.py:83-86)"""
    return ScipyMinimizationConfig(method="BFGS", options={"disp": False})


def setup_in_vacuum(st: SingleTopology, ligand_conf, lamb):
    """Potentials, coords, 10nm box, HMR masses for a vacuum leg
    (ref rbfe.py:88-102)."""
    system = st.setup_intermediate_state(lamb)
    hmr_masses = np.array(st.combine_masses(use_hmr=True))
    potentials = system.get_U_fns()
    x0 = ligand_conf
    box0 = np.eye(3, dtype=np.float64) * 10.0
    return x0, box0, hmr_masses, potentials, None


def setup_in_env(
    st: SingleTopology,
    host: Host,
    ligand_conf: NDArray,
    lamb: float,
    temperature: float,
    run_seed: int,
):
    """Potentials, combined coords, HMR masses, barostat for a host leg
    (ref rbfe.py:104-128)."""
    barostat_interval = 25
    system = st.combine_with_host(host.system, lamb, host.num_water_atoms, st.ff, host.host_topology)
    host_hmr_masses = model_utils.apply_hmr(host.physical_masses, host.system.bond.potential.idxs)
    hmr_masses = np.concatenate([host_hmr_masses, st.combine_masses(use_hmr=True)])

    potentials = system.get_U_fns()
    group_idxs = get_group_indices(get_bond_list(system.bond.potential), len(hmr_masses))
    baro = MonteCarloBarostat(
        len(hmr_masses), DEFAULT_PRESSURE, temperature, group_idxs, barostat_interval, run_seed + 1
    )
    x0 = np.concatenate([host.conf, ligand_conf])
    return x0, hmr_masses, potentials, baro


def assert_all_states_have_same_masses(initial_states: list[InitialState]):
    """HMR masses must be constant along the schedule (ref rbfe.py:130-149)."""
    masses = np.array([s.integrator.masses for s in initial_states])
    np.testing.assert_array_almost_equal(masses.std(0), 0, err_msg="masses assumed constant w.r.t. lambda")


def setup_initial_state(
    st: SingleTopology,
    lamb: float,
    host: Optional[Host],
    temperature: float,
    seed: int,
) -> InitialState:
    """(ref rbfe.py:152-207)"""
    conf_a = get_romol_conf(st.mol_a)
    conf_b = get_romol_conf(st.mol_b)

    ligand_conf = st.combine_confs(conf_a, conf_b, lamb)
    num_ligand_atoms = len(ligand_conf)
    # per-window seed, symmetric in A->B vs B->A edge direction
    init_seed = int(seed + bytes_to_id(ligand_conf.tobytes())) % MAX_SEED_VALUE
    if host:
        x0, hmr_masses, potentials, baro = setup_in_env(st, host, ligand_conf, lamb, temperature, init_seed)
        box0 = host.box
        protein_idxs = np.arange(0, len(host.physical_masses) - host.num_water_atoms)
    else:
        x0, box0, hmr_masses, potentials, baro = setup_in_vacuum(st, ligand_conf, lamb)
        protein_idxs = np.array([], dtype=np.int32)

    run_seed = (
        int(seed + bytes_to_id(b"".join([np.array(p.params).tobytes() for p in potentials]))) % MAX_SEED_VALUE
    )

    v0 = sample_velocities(hmr_masses, temperature, init_seed)

    num_total_atoms = len(x0)
    ligand_idxs = np.arange(num_total_atoms - num_ligand_atoms, num_total_atoms, dtype=np.int32)

    dt = 2.5e-3
    friction = 1.0
    intg = LangevinIntegrator(temperature, dt, friction, hmr_masses, run_seed)

    # atoms in the w == 0 4D plane at this lambda (ref rbfe.py:195-203)
    if lamb == 0.0:
        interacting_atoms = ligand_idxs[st.c_flags != AtomMapFlags.MOL_B]
    elif lamb == 1.0:
        interacting_atoms = ligand_idxs[st.c_flags != AtomMapFlags.MOL_A]
    else:
        interacting_atoms = ligand_idxs[st.c_flags == AtomMapFlags.CORE]

    return InitialState(
        potentials, intg, baro, x0, v0, box0, lamb, ligand_idxs,
        protein_idxs.astype(np.int32), interacting_atoms=interacting_atoms,
    )


def setup_optimized_host(st: SingleTopology, config: HostConfig) -> Host:
    """FIRE-minimize + pre-equilibrate the host around the ligand pair
    (ref rbfe.py:210-229)."""
    conf, box = minimizer.pre_equilibrate_host([st.mol_a, st.mol_b], config, st.ff)
    return Host(config.host_system, config.masses, conf, box, config.num_water_atoms, config.host_topology)


def setup_initial_states(
    st: SingleTopology,
    host: Optional[Host],
    temperature: float,
    lambda_schedule: Union[NDArray, Sequence[float]],
    seed: int,
    min_cutoff: Optional[float] = None,
) -> list[InitialState]:
    """InitialState per lambda, with coordinates optimized along the schedule
    (ref rbfe.py:231-290)."""
    assert np.all(np.diff(lambda_schedule) > 0)
    initial_states = [setup_initial_state(st, lamb, host, temperature, seed) for lamb in lambda_schedule]
    optimized_x0s = optimize_coordinates(initial_states, min_cutoff=min_cutoff)
    for state, x0 in zip(initial_states, optimized_x0s):
        state.x0 = x0
    assert_all_states_have_same_masses(initial_states)
    return initial_states


def rebalance_lambda_schedule(
    initial_states: Sequence[InitialState],
    setup_initial_state_fn: Callable[[float], InitialState],
    trajectories: Sequence[Trajectory],
    target_overlap: float,
    xtol: float = 1e-4,
    initial_mbar_threshold: float = 1e-3,
) -> Sequence[InitialState]:
    """Re-space lambdas to a target neighbor overlap using reweighting of the
    bisection-phase samples (ref rbfe.py:292-346)."""
    assert 0.0 < target_overlap <= 1.0
    assert len(initial_states) == len(trajectories)
    initial_lambs = np.array([state.lamb for state in initial_states])
    lambda_min, lambda_max = min(initial_lambs), max(initial_lambs)

    u_kn, n_k = compute_u_kn(trajectories, initial_states)
    mbar = MBAR(u_kn, n_k)
    mbar_scalar_overlap = mbar.compute_overlap()["scalar"]
    if mbar_scalar_overlap < initial_mbar_threshold:
        warnings.warn(
            f"Skipping 'rebalancing' optimization of initial protocol because MBAR(initial_protocol) is an "
            f"unreliable starting point (with overlap {mbar_scalar_overlap} < {initial_mbar_threshold})"
        )
        new_schedule = initial_lambs
    else:
        f_k = mbar.f_k
        overlap_dist = make_fast_approx_overlap_distance_fxn(initial_lambs, u_kn, f_k, n_k)
        target_dist = 1.0 - target_overlap
        greedy_prot = greedily_optimize_protocol(
            overlap_dist, target_dist, bisection_xtol=xtol, protocol_interval=(lambda_min, lambda_max)
        )
        if len(greedy_prot) > len(initial_lambs):
            warnings.warn("Optimized schedule has more windows than initial schedule, falling back to initial schedule")
            new_schedule = initial_lambs
        else:
            new_schedule = np.asarray(greedy_prot)
            print(
                f"Optimized schedule has {len(new_schedule)} windows compared to {len(initial_lambs)} windows "
                f"initially, target overlap {target_overlap}"
            )
    return [setup_initial_state_fn(lamb) for lamb in new_schedule]


def get_nearest_state_idx(lamb: float, initial_states: Sequence[InitialState]) -> int:
    """Nearest state on the same side of λ=0.5 (ref rbfe.py:348-358)."""
    states_subset = [(i, s.lamb) for i, s in enumerate(initial_states) if (s.lamb <= 0.5) == (lamb <= 0.5)]
    return min(states_subset, key=lambda s: abs(lamb - s[1]))[0]


def optimize_initial_state_from_pre_optimized(
    initial_state: InitialState,
    optimized_initial_states: Sequence[InitialState],
    k: float = DEFAULT_POSITIONAL_RESTRAINT_K,
) -> InitialState:
    """(ref rbfe.py:360-397)"""
    nearest = optimized_initial_states[get_nearest_state_idx(initial_state.lamb, optimized_initial_states)]
    if np.isclose(initial_state.lamb, nearest.lamb):
        return nearest
    free_idxs = get_free_idxs(nearest)
    initial_state.x0 = optimize_coords_state(
        initial_state.potentials,
        nearest.x0,
        initial_state.box0,
        free_idxs,
        assert_energy_decreased=False,
        k=k,
    )
    return initial_state


def optimize_coords_state(
    potentials: Sequence[BoundPotential],
    x0: NDArray,
    box: NDArray,
    free_idxs: list[int],
    assert_energy_decreased: bool,
    k: float,
    restrained_idxs: Optional[NDArray] = None,
    minimization_config=None,
) -> NDArray:
    """(ref rbfe.py:399-427)"""
    val_and_grad_fn = minimizer.get_val_and_grad_fn(potentials, box)
    assert np.all(np.isfinite(x0)), "Initial coordinates contain nan or inf"
    if minimization_config is None:
        minimization_config = _get_default_state_minimization_config()
    x_opt = minimizer.local_minimize(
        x0,
        box,
        val_and_grad_fn,
        free_idxs,
        minimization_config,
        verbose=False,
        assert_energy_decreased=assert_energy_decreased,
        restrained_idxs=restrained_idxs,
        restraint_k=k,
    )
    assert np.all(np.isfinite(x_opt)), "Minimization resulted in a nan"
    return x_opt


def get_free_idxs(initial_state: InitialState, cutoff: float = 0.5) -> list[int]:
    """Particles within cutoff of the ligand (ref rbfe.py:429-435)."""
    x = initial_state.x0
    return np.asarray(
        idxs_within_cutoff(x, x[initial_state.ligand_idxs], initial_state.box0, cutoff=cutoff)
    ).tolist()


def _optimize_coords_along_states(initial_states: list[InitialState], k: float, minimization_config) -> list[NDArray]:
    """(ref rbfe.py:438-466)"""
    x_opt = initial_states[0].x0
    x_traj = []
    for idx, initial_state in enumerate(initial_states):
        print(f"Optimizing initial state at λ={initial_state.lamb}")
        free_idxs = get_free_idxs(initial_state)
        try:
            x_opt = optimize_coords_state(
                initial_state.potentials,
                x_opt,
                initial_state.box0,
                free_idxs,
                minimization_config=minimization_config,
                assert_energy_decreased=idx == 0,
                restrained_idxs=initial_state.interacting_atoms,
                k=k,
            )
        except (AssertionError, minimizer.MinimizationError) as e:
            raise minimizer.MinimizationError(f"Failed to optimized state at λ={initial_state.lamb}") from e
        x_traj.append(x_opt)
    return x_traj


def optimize_coordinates(
    initial_states: list[InitialState],
    min_cutoff: Optional[float] = 0.7,
    k: float = DEFAULT_POSITIONAL_RESTRAINT_K,
    minimization_config=None,
) -> list[NDArray]:
    """Minimize each state's geometry, sweeping λ 0→0.5 and 1→0.5
    (ref rbfe.py:468-545)."""
    if minimization_config is None:
        minimization_config = _get_default_state_minimization_config()

    all_xs = []
    lambda_schedule = np.array([s.lamb for s in initial_states])
    assert np.all(np.diff(lambda_schedule) > 0)

    lhs_initial_states = [s for s in initial_states if s.lamb < 0.5]
    rhs_initial_states = [s for s in initial_states if s.lamb >= 0.5]

    if lhs_initial_states:
        all_xs.extend(_optimize_coords_along_states(lhs_initial_states, k, minimization_config))
    if rhs_initial_states:
        all_xs.extend(_optimize_coords_along_states(rhs_initial_states[::-1], k, minimization_config)[::-1])

    if min_cutoff is not None:
        for state, coords in zip(initial_states, all_xs):
            if state.interacting_atoms is None:
                restricted_idxs = state.protein_idxs
            else:
                restricted_idxs = np.concatenate([state.interacting_atoms, state.protein_idxs])
            displacement_distances = np.asarray(
                lifted_distance_on_pairs(
                    state.x0[restricted_idxs], coords[restricted_idxs], box=state.box0
                )
            )
            max_moved = np.max(displacement_distances) if len(displacement_distances) else 0.0
            moved_atoms = restricted_idxs[displacement_distances >= min_cutoff]
            assert len(moved_atoms) == 0, (
                f"λ = {state.lamb} moved atoms {np.asarray(moved_atoms).tolist()} > {min_cutoff * 10} Å "
                f"from initial state during minimization. Largest displacement was {max_moved * 10} Å"
            )
    return all_xs


def estimate_relative_free_energy(
    mol_a,
    mol_b,
    core: NDArray,
    ff,
    host_config: Optional[HostConfig],
    prefix: str = "",
    lambda_interval: Optional[tuple[float, float]] = None,
    n_windows: Optional[int] = None,
    md_params: MDParams = DEFAULT_MD_PARAMS,
    min_cutoff: Optional[float] = 0.7,
) -> SimulationResult:
    """Fixed linear lambda schedule, independent simulations + pair BAR
    (ref rbfe.py:548-632)."""
    if n_windows is None:
        n_windows = DEFAULT_NUM_WINDOWS
    assert n_windows >= 2

    single_topology = SingleTopology(mol_a, mol_b, core, ff)
    lambda_min, lambda_max = lambda_interval or (0.0, 1.0)
    lambda_schedule = np.linspace(lambda_min, lambda_max, n_windows)
    temperature = DEFAULT_TEMP

    host = setup_optimized_host(single_topology, host_config) if host_config else None
    initial_states = setup_initial_states(
        single_topology, host, temperature, lambda_schedule, md_params.seed, min_cutoff=min_cutoff
    )

    combined_prefix = get_mol_name(mol_a) + "_" + get_mol_name(mol_b) + "_" + prefix
    try:
        result, stored_trajectories = run_sims_sequential(initial_states, md_params, temperature)
        plots = make_pair_bar_plots(result, temperature, combined_prefix)
        return SimulationResult(result, plots, stored_trajectories, md_params, [])
    except Exception as err:
        with open(f"failed_rbfe_result_{combined_prefix}.pkl", "wb") as fh:
            pickle.dump((initial_states, md_params, err), fh)
        raise err


def estimate_relative_free_energy_bisection_or_hrex(*args, **kwargs) -> SimulationResult:
    """(ref rbfe.py:633-647)"""
    hrex_params = kwargs["md_params"].hrex_params
    if hrex_params is not None:
        return estimate_relative_free_energy_bisection_hrex(*args, **kwargs)
    return estimate_relative_free_energy_bisection(*args, **kwargs)


def estimate_relative_free_energy_bisection(
    mol_a,
    mol_b,
    core: NDArray,
    ff,
    host_config: Optional[HostConfig],
    md_params: MDParams = DEFAULT_MD_PARAMS,
    prefix: str = "",
    lambda_interval: Optional[tuple[float, float]] = None,
    n_windows: Optional[int] = None,
    min_overlap: Optional[float] = None,
    min_cutoff: Optional[float] = 0.7,
) -> SimulationResult:
    """Dynamic lambda schedule via greedy overlap bisection (ref rbfe.py:649-776)."""
    if n_windows is None:
        n_windows = DEFAULT_NUM_WINDOWS
    assert n_windows >= 2

    single_topology = SingleTopology(mol_a, mol_b, core, ff)
    lambda_interval = lambda_interval or (0.0, 1.0)
    lambda_min, lambda_max = lambda_interval
    temperature = DEFAULT_TEMP

    host = setup_optimized_host(single_topology, host_config) if host_config else None
    lambda_grid = bisection_lambda_schedule(n_windows, lambda_interval=lambda_interval)
    initial_states = setup_initial_states(
        single_topology, host, temperature, lambda_grid, md_params.seed, min_cutoff=min_cutoff
    )

    make_initial_state_fn = partial(
        setup_initial_state, single_topology, host=host, temperature=temperature, seed=md_params.seed
    )
    make_optimized_initial_state_fn = partial(
        optimize_initial_state_from_pre_optimized, optimized_initial_states=initial_states
    )
    make_bisection_state = lambda lamb: make_optimized_initial_state_fn(make_initial_state_fn(lamb))

    combined_prefix = get_mol_name(mol_a) + "_" + get_mol_name(mol_b) + "_" + prefix
    try:
        results, trajectories = run_sims_bisection(
            [lambda_min, lambda_max],
            make_bisection_state,
            md_params,
            n_bisections=n_windows - 2,
            temperature=temperature,
            min_overlap=min_overlap,
        )
        final_result = results[-1]
        plots = make_pair_bar_plots(final_result, temperature, combined_prefix)
        return SimulationResult(final_result, plots, trajectories, md_params, results)
    except Exception as err:
        with open(f"failed_rbfe_result_{combined_prefix}.pkl", "wb") as fh:
            pickle.dump((md_params, err), fh)
        raise err


def estimate_relative_free_energy_bisection_hrex_impl(
    temperature: float,
    lambda_min: float,
    lambda_max: float,
    md_params: MDParams,
    n_windows: int,
    make_initial_state_fn: Callable[[float], InitialState],
    optimize_initial_state_fn: Callable[[InitialState], InitialState],
    combined_prefix: str,
    min_overlap: Optional[float] = None,
) -> HREXSimulationResult:
    """Bisection to space lambdas, then HREX production (ref rbfe.py:778-944)."""
    assert n_windows >= 2
    assert md_params.hrex_params is not None, "hrex_params must be set to use HREX"
    try:
        md_params_bisection = replace(md_params, n_frames=md_params.hrex_params.n_frames_bisection)
        make_optimized_initial_state_fn = lambda lamb: optimize_initial_state_fn(make_initial_state_fn(lamb))

        results, trajectories_by_state = run_sims_bisection(
            [lambda_min, lambda_max],
            make_optimized_initial_state_fn,
            md_params_bisection,
            n_bisections=n_windows - 2,
            temperature=temperature,
            min_overlap=min_overlap,
        )
        assert all(traj.final_velocities is not None for traj in trajectories_by_state)

        initial_states = results[-1].initial_states
        has_barostat_by_state = [s.barostat is not None for s in initial_states]
        assert all(has_barostat_by_state) or not any(has_barostat_by_state)

        def get_mean_final_barostat_volume_scale_factor(trajs: Iterable[Trajectory]) -> Optional[float]:
            scale_factors = [traj.final_barostat_volume_scale_factor for traj in trajs]
            if any(x is not None for x in scale_factors):
                assert all(x is not None for x in scale_factors)
                return float(np.mean(cast(list, scale_factors)))
            return None

        mean_scale = get_mean_final_barostat_volume_scale_factor(trajectories_by_state)
        assert (mean_scale is not None) == all(has_barostat_by_state)

        def get_initial_state(lamb: float) -> InitialState:
            state_idx = get_nearest_state_idx(lamb, initial_states)
            nearest_state = initial_states[state_idx]
            traj = trajectories_by_state[state_idx]
            if np.isclose(nearest_state.lamb, lamb):
                state = nearest_state
            else:
                state = make_initial_state_fn(lamb)
                # frames came from a different lambda: verify forces are sane
                u_fn = state.total_energy_fn()
                du_dx = np.asarray(jax.grad(lambda x: u_fn(x, traj.boxes[-1]))(traj.frames[-1]))
                minimizer.check_force_norm(-du_dx)
            return replace(
                state,
                x0=traj.frames[-1],
                v0=traj.final_velocities,
                box0=traj.boxes[-1],
                barostat=(
                    replace(state.barostat, adaptive_scaling_enabled=False, initial_volume_scale_factor=mean_scale)
                    if state.barostat
                    else None
                ),
            )

        if md_params.hrex_params.optimize_target_overlap is not None:
            initial_states_hrex = rebalance_lambda_schedule(
                initial_states,
                get_initial_state,
                trajectories_by_state,
                md_params.hrex_params.optimize_target_overlap,
            )
        else:
            initial_states_hrex = [get_initial_state(s.lamb) for s in initial_states]

        pair_bar_result, trajectories_by_state, hrex_diagnostics, ws_diagnostics = run_sims_hrex(
            initial_states_hrex,
            replace(md_params, n_eq_steps=0),  # pre-equilibrated by bisection
        )

        plots = make_pair_bar_plots(pair_bar_result, temperature, combined_prefix)

        from timemachine_tpu.fe.plots import (
            plot_as_png_fxn,
            plot_hrex_replica_state_distribution_heatmap,
            plot_hrex_swap_acceptance_rates_convergence,
            plot_hrex_transition_matrix,
        )

        hrex_plots = HREXPlots(
            transition_matrix_png=plot_as_png_fxn(
                plot_hrex_transition_matrix, hrex_diagnostics.transition_matrix, prefix=combined_prefix
            ),
            swap_acceptance_rates_convergence_png=plot_as_png_fxn(
                plot_hrex_swap_acceptance_rates_convergence,
                hrex_diagnostics.cumulative_swap_acceptance_rates,
                prefix=combined_prefix,
            ),
            replica_state_distribution_heatmap_png=plot_as_png_fxn(
                plot_hrex_replica_state_distribution_heatmap,
                hrex_diagnostics.cumulative_replica_state_counts,
                [state.lamb for state in initial_states_hrex],
                prefix=combined_prefix,
            ),
        )
        return HREXSimulationResult(
            pair_bar_result,
            plots,
            trajectories_by_state,
            md_params,
            results,
            hrex_diagnostics,
            hrex_plots,
            water_sampling_diagnostics=ws_diagnostics,
        )
    except Exception as err:
        with open(f"failed_rbfe_result_{combined_prefix}.pkl", "wb") as fh:
            pickle.dump((md_params, err), fh)
        raise err


def estimate_relative_free_energy_bisection_hrex(
    mol_a,
    mol_b,
    core: NDArray,
    ff,
    host_config: Optional[HostConfig],
    md_params: MDParams = DEFAULT_HREX_PARAMS,
    prefix: str = "",
    lambda_interval: Optional[tuple[float, float]] = None,
    n_windows: Optional[int] = None,
    min_overlap: Optional[float] = None,
    min_cutoff: Optional[float] = 0.7,
) -> HREXSimulationResult:
    """(ref rbfe.py:946-1067)"""
    hrex_params = md_params.hrex_params
    assert hrex_params

    if n_windows is None:
        n_windows = DEFAULT_NUM_WINDOWS
    assert n_windows >= 2

    if hrex_params.rest_params:
        from timemachine_tpu.fe.rest.single_topology import SingleTopologyREST

        single_topology: SingleTopology = SingleTopologyREST(
            mol_a,
            mol_b,
            core,
            ff,
            max_temperature_scale=hrex_params.rest_params.max_temperature_scale,
            temperature_scale_interpolation=hrex_params.rest_params.temperature_scale_interpolation,
        )
    else:
        single_topology = SingleTopology(mol_a, mol_b, core, ff)

    lambda_interval = lambda_interval or (0.0, 1.0)
    lambda_min, lambda_max = lambda_interval
    temperature = DEFAULT_TEMP

    host = setup_optimized_host(single_topology, host_config) if host_config else None
    lambda_grid = bisection_lambda_schedule(n_windows, lambda_interval=lambda_interval)
    initial_states = setup_initial_states(
        single_topology, host, temperature, lambda_grid, md_params.seed, min_cutoff=min_cutoff
    )

    make_initial_state_fn = partial(
        setup_initial_state, single_topology, host=host, temperature=temperature, seed=md_params.seed
    )
    make_optimized_initial_state_fn = partial(
        optimize_initial_state_from_pre_optimized, optimized_initial_states=initial_states
    )

    combined_prefix = get_mol_name(mol_a) + "_" + get_mol_name(mol_b) + "_" + prefix

    return estimate_relative_free_energy_bisection_hrex_impl(
        temperature,
        lambda_min,
        lambda_max,
        md_params,
        n_windows,
        make_initial_state_fn,
        make_optimized_initial_state_fn,
        combined_prefix,
        min_overlap,
    )


def run_vacuum(
    mol_a,
    mol_b,
    core: NDArray,
    forcefield,
    _,
    md_params: MDParams = DEFAULT_HREX_PARAMS,
    n_windows: Optional[int] = None,
    min_overlap: Optional[float] = None,
    min_cutoff: Optional[float] = None,
):
    """(ref rbfe.py:1069-1099)"""
    if md_params is not None and md_params.local_md_params is not None:
        md_params = replace(md_params, local_md_params=None)
        warnings.warn("Vacuum simulations don't support local steps, will use all global steps")
    if md_params is not None and md_params.water_sampling_params is not None:
        md_params = replace(md_params, water_sampling_params=None)
        warnings.warn("Vacuum simulations don't support water sampling, disabling")
    return estimate_relative_free_energy_bisection_or_hrex(
        mol_a,
        mol_b,
        core,
        forcefield,
        md_params=md_params,
        host_config=None,
        prefix="vacuum",
        n_windows=n_windows,
        min_overlap=min_overlap,
        min_cutoff=min_cutoff,
    )


def run_solvent(
    mol_a,
    mol_b,
    core: NDArray,
    forcefield,
    _,
    md_params: MDParams = DEFAULT_HREX_PARAMS,
    n_windows: Optional[int] = None,
    min_overlap: Optional[float] = None,
    min_cutoff: Optional[float] = None,
):
    """(ref rbfe.py:1101-1133)"""
    if md_params is not None and md_params.water_sampling_params is not None:
        md_params = replace(md_params, water_sampling_params=None)
        warnings.warn("Solvent simulations don't benefit from water sampling, disabling")
    box_width = 4.0
    solvent_host_config = builders.build_water_system(box_width, forcefield.water_ff, mols=[mol_a, mol_b])
    solvent_host_config.box += np.diag([0.1, 0.1, 0.1])  # headroom against clashes
    solvent_res = estimate_relative_free_energy_bisection_or_hrex(
        mol_a,
        mol_b,
        core,
        forcefield,
        solvent_host_config,
        md_params=md_params,
        prefix="solvent",
        n_windows=n_windows,
        min_overlap=min_overlap,
        min_cutoff=min_cutoff,
    )
    return solvent_res, solvent_host_config


def run_complex(
    mol_a,
    mol_b,
    core: NDArray,
    forcefield,
    protein,
    md_params: MDParams = DEFAULT_HREX_PARAMS,
    n_windows: Optional[int] = None,
    min_overlap: Optional[float] = None,
    min_cutoff: Optional[float] = 0.7,
):
    """(ref rbfe.py:1135-1162)"""
    complex_host_config = builders.build_protein_system(
        protein, forcefield.protein_ff, forcefield.water_ff, mols=[mol_a, mol_b]
    )
    complex_host_config.box += np.diag([0.1, 0.1, 0.1])
    complex_res = estimate_relative_free_energy_bisection_or_hrex(
        mol_a,
        mol_b,
        core,
        forcefield,
        complex_host_config,
        prefix="complex",
        md_params=md_params,
        n_windows=n_windows,
        min_overlap=min_overlap,
        min_cutoff=min_cutoff,
    )
    return complex_res, complex_host_config
