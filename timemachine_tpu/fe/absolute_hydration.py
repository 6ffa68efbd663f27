"""Absolute hydration free energies (AHFE): 4D-decoupling of a ligand from
water, estimated by windowed pair-BAR or SMC.

Parity target: reference `timemachine/fe/absolute_hydration.py` — endstate
sample generation (:37-148), SMC setup (:149-177), windowed estimator
(:178-318), run_solvent (:319-333).
"""

from __future__ import annotations

import pickle
from functools import partial
from typing import Optional, Sequence

import numpy as np
from numpy.typing import NDArray as Array

from timemachine_tpu.constants import BOLTZ, DEFAULT_TEMP
from timemachine_tpu.fe import model_utils
from timemachine_tpu.fe.free_energy import (
    AbsoluteFreeEnergy,
    HostConfig,
    InitialState,
    MDParams,
    SimulationResult,
    make_pair_bar_plots,
    run_sims_sequential,
)
from timemachine_tpu.fe.lambda_schedule import construct_pre_optimized_absolute_lambda_schedule_solvent
from timemachine_tpu.fe.topology import BaseTopology
from timemachine_tpu.fe.utils import get_mol_name, get_romol_conf
from timemachine_tpu.ff import Forcefield
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md import builders, enhanced, minimizer, smc
from timemachine_tpu.md.barostat import MonteCarloBarostat
from timemachine_tpu.md.moves import NPTMove
from timemachine_tpu.md.states import CoordsVelBox
from timemachine_tpu.md.utils import get_bond_list, get_group_indices
from timemachine_tpu.potentials import HarmonicBond, SummedPotential, get_potential_by_type

DEFAULT_AHFE_MD_PARAMS = MDParams(n_frames=1000, n_eq_steps=10_000, steps_per_frame=400, seed=2023)

N_ENDSTATE_SAMPLES = 5000


def generate_endstate_samples(
    num_samples: int,
    solvent_samples: Sequence[CoordsVelBox],
    ligand_samples: Sequence,
    ligand_log_weights: Array,
    num_ligand_atoms: int,
) -> list[CoordsVelBox]:
    """Decoupled-endstate samples: each pairs a uniformly drawn solvent
    configuration with an importance-resampled vacuum ligand conformer —
    valid because at lambda=1 the two subsystems are independent
    (ref absolute_hydration.py:37-101). Ligand atoms are the LAST
    num_ligand_atoms of each frame."""
    n_solvent_atoms = len(solvent_samples[0].coords) - num_ligand_atoms
    assert n_solvent_atoms > 0, "Oops, did you really mean num_ligand_atoms >= num_total_atoms?"

    lig_draws = enhanced.sample_from_log_weights(ligand_samples, ligand_log_weights, size=num_samples)
    env_draws = np.random.choice(len(solvent_samples), size=num_samples, replace=True)

    def splice(env: CoordsVelBox, lig_xv) -> CoordsVelBox:
        lig_x, lig_v = lig_xv
        return CoordsVelBox(
            np.concatenate([env.coords[:n_solvent_atoms], lig_x]),
            np.concatenate([env.velocities[:n_solvent_atoms], lig_v]),
            env.box,
        )

    return [splice(solvent_samples[e], lig) for e, lig in zip(env_draws, lig_draws)]


def setup_absolute_hydration_with_endpoint_samples(
    mol, temperature=300.0, pressure=1.0, n_steps=1000, seed=2022, ff=None, num_workers=None
):
    """Decoupled-endstate (lambda=1) equilibrium samples plus the machinery
    to anneal them: (reduced_potential_fxn, npt_mover, initial_samples)
    (ref absolute_hydration.py:103-148)."""
    if not isinstance(seed, int):
        seed = np.random.randint(1000)
        print(f"setting seed randomly to {seed}")
    else:
        print(f"setting seed to {seed}")
    np.random.seed(seed)

    ff = ff or Forcefield.load_default()
    potentials, params, masses, _, _ = enhanced.get_solvent_phase_system(mol, ff, lamb=1.0)
    kBT = BOLTZ * temperature

    # lambda enters only through the parameterization (the 4D w-coordinates
    # of the decoupling nonbonded terms), so one jitted SummedPotential and
    # one mover serve every window — swap parameter sets, never retrace
    per_lambda_params: dict[float, list] = {1.0: [np.asarray(p) for p in params]}

    def params_list_at(lam: float):
        lam = float(lam)
        if lam not in per_lambda_params:
            _, p_lam, *_ = enhanced.get_solvent_phase_system(mol, ff, lamb=lam, minimize_energy=False)
            per_lambda_params[lam] = [np.asarray(p) for p in p_lam]
        return per_lambda_params[lam]

    U_fn = SummedPotential(potentials, params)

    def reduced_potential_fxn(xvb, lam):
        flat = np.concatenate([np.ravel(p) for p in params_list_at(lam)])
        return U_fn(xvb.coords, flat, xvb.box) / kBT

    npt_mover = NPTMove(
        [pot.bind(p) for pot, p in zip(potentials, params)], masses, temperature, pressure,
        n_steps=n_steps, seed=seed,
    )
    npt_mover.params_list_at = params_list_at  # used by SMC propagate

    solvent_xvbs, ligand_samples, ligand_log_weights = enhanced.pregenerate_samples(
        mol, ff, 1.0, seed, temperature=temperature, pressure=pressure, num_workers=num_workers
    )
    endstate_samples = generate_endstate_samples(
        N_ENDSTATE_SAMPLES, solvent_xvbs, ligand_samples, ligand_log_weights, mol.num_atoms
    )
    return reduced_potential_fxn, npt_mover, endstate_samples


def set_up_ahfe_system_for_smc(
    mol, n_walkers, n_windows, n_md_steps, resample_thresh, seed=2022, ff=None, num_workers=None
):
    """SMC ingredients: (samples, lambdas, propagate, log_prob, resample)
    (ref absolute_hydration.py:149-177)."""
    reduced_potential, mover, endstate_samples = setup_absolute_hydration_with_endpoint_samples(
        mol, n_steps=n_md_steps, seed=seed, ff=ff, num_workers=num_workers
    )
    np.random.seed(seed)
    walkers = [endstate_samples[i] for i in np.random.choice(len(endstate_samples), size=n_walkers)]

    # tm convention: lambda=1 decoupled, lambda=0 coupled
    lambdas = construct_pre_optimized_absolute_lambda_schedule_solvent(n_windows)

    def propagate(xs, lam):
        mover.set_params(mover.params_list_at(lam))  # recompile-free window switch
        return [mover.move(x) for x in xs]

    def log_prob(xs, lam):
        return -np.array([reduced_potential(x, lam) for x in xs])

    resample = partial(smc.conditional_multinomial_resample, thresh=resample_thresh)
    return walkers, lambdas, propagate, log_prob, resample


def _initial_state_at(afe: AbsoluteFreeEnergy, ff: Forcefield, host_config: HostConfig, host_conf, temperature, lamb, seed):
    """One InitialState of the decoupling leg at `lamb` (NPT, HMR, ligand
    appended after the host atoms)."""
    ubps, params, masses = afe.prepare_host_edge(ff, host_config, lamb)
    bps = [ubp.bind(param) for ubp, param in zip(ubps, params)]
    x0 = afe.prepare_combined_coords(host_coords=host_conf)
    v0 = np.zeros_like(x0)

    bond_pot = get_potential_by_type(ubps, HarmonicBond)
    hmr_masses = model_utils.apply_hmr(masses, bond_pot.idxs)
    groups = get_group_indices(get_bond_list(bond_pot), len(masses))
    barostat = MonteCarloBarostat(len(hmr_masses), 1.0, temperature, groups, 15, seed)

    n_lig = len(get_romol_conf(afe.mol))
    ligand_idxs = np.arange(len(x0) - n_lig, len(x0))
    integrator = LangevinIntegrator(temperature, 2.5e-3, 1.0, hmr_masses, seed)
    return InitialState(
        bps, integrator, barostat, x0, v0, host_config.box, lamb, ligand_idxs, np.array([], dtype=np.int32)
    )


def setup_initial_states(
    afe: AbsoluteFreeEnergy,
    ff: Forcefield,
    host_config: HostConfig,
    temperature: float,
    lambda_schedule: Array,
    seed: int,
) -> list[InitialState]:
    """InitialState per window of a strictly decreasing (decoupled -> coupled)
    schedule, all sharing one FIRE-minimized host conformation
    (ref absolute_hydration.py:239-317)."""
    assert np.all(np.diff(lambda_schedule) < 0)
    host_conf = minimizer.fire_minimize_host([afe.mol], host_config, ff)
    return [
        _initial_state_at(afe, ff, host_config, host_conf, temperature, lamb, seed) for lamb in lambda_schedule
    ]


def estimate_absolute_free_energy(
    mol,
    ff: Forcefield,
    host_config: HostConfig,
    prefix="",
    md_params: MDParams = DEFAULT_AHFE_MD_PARAMS,
    n_windows=None,
):
    """Windowed AHFE: independent per-window simulations + pair BAR
    (ref absolute_hydration.py:178-237)."""
    if md_params is None:
        md_params = MDParams(n_frames=2000, steps_per_frame=400, n_eq_steps=200000, seed=2023)
    afe = AbsoluteFreeEnergy(mol, BaseTopology(mol, ff))

    # tm convention: lambda=1 decoupled; run the schedule decoupled -> coupled
    schedule = construct_pre_optimized_absolute_lambda_schedule_solvent(n_windows)[::-1]
    assert np.isclose(schedule[0], 1.0) and np.isclose(schedule[-1], 0.0)

    temperature = DEFAULT_TEMP
    initial_states = setup_initial_states(afe, ff, host_config, temperature, schedule, md_params.seed)

    run_name = f"{get_mol_name(mol)}_{prefix}"
    try:
        result, stored_trajectories = run_sims_sequential(initial_states, md_params, temperature)
    except Exception as err:
        with open(f"failed_ahfe_result_{run_name}.pkl", "wb") as fh:
            pickle.dump((initial_states, md_params, err), fh)
        raise err
    plots = make_pair_bar_plots(result, temperature, run_name)
    return SimulationResult(result, plots, stored_trajectories, md_params, [])


def run_solvent(
    mol, forcefield: Forcefield, _, md_params: MDParams, n_windows=16
) -> tuple[SimulationResult, HostConfig]:
    """Build a 4 nm water box around the ligand and estimate its AHFE
    (ref absolute_hydration.py:319-333)."""
    host_config = builders.build_water_system(4.0, forcefield.water_ff, mols=[mol])
    host_config.box += np.diag([0.1, 0.1, 0.1])  # barostat equilibration slack
    result = estimate_absolute_free_energy(
        mol, forcefield, host_config, md_params=md_params, prefix="solvent", n_windows=n_windows
    )
    return result, host_config
