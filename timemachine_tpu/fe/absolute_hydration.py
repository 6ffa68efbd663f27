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


def generate_endstate_samples(
    num_samples: int,
    solvent_samples: Sequence[CoordsVelBox],
    ligand_samples: Sequence,
    ligand_log_weights: Array,
    num_ligand_atoms: int,
) -> list[CoordsVelBox]:
    """Combine solvent configurations with importance-resampled vacuum ligand
    conformers into decoupled-endstate samples (ref absolute_hydration.py:37-101).

    Assumes ligand atoms are the last num_ligand_atoms."""
    num_total_atoms = len(solvent_samples[0].coords)
    num_solvent_atoms = num_total_atoms - num_ligand_atoms
    assert num_solvent_atoms > 0, "Oops, did you really mean num_ligand_atoms >= num_total_atoms?"
    solvent_idxs = np.arange(0, num_solvent_atoms)

    ligand_xvs = enhanced.sample_from_log_weights(ligand_samples, ligand_log_weights, size=num_samples)
    solvent_choice_idxs = np.random.choice(len(solvent_samples), size=num_samples, replace=True)

    all_xvbs = []
    for i, choice_idx in enumerate(solvent_choice_idxs):
        noninteracting_xvb = solvent_samples[choice_idx]
        ligand_x, ligand_v = ligand_xvs[i]
        combined_x = np.concatenate([noninteracting_xvb.coords[solvent_idxs], ligand_x], axis=0)
        combined_v = np.concatenate([noninteracting_xvb.velocities[solvent_idxs], ligand_v], axis=0)
        all_xvbs.append(CoordsVelBox(combined_x, combined_v, noninteracting_xvb.box))
    return all_xvbs


def setup_absolute_hydration_with_endpoint_samples(
    mol, temperature=300.0, pressure=1.0, n_steps=1000, seed=2022, ff=None, num_workers=None
):
    """Equilibrium samples at the decoupled endstate (lambda=1)
    (ref absolute_hydration.py:103-148).

    Returns (reduced_potential_fxn, npt_mover, initial_samples)."""
    if not isinstance(seed, int):
        seed = np.random.randint(1000)
        print(f"setting seed randomly to {seed}")
    else:
        print(f"setting seed to {seed}")
    np.random.seed(seed)

    ff = ff or Forcefield.load_default()
    # lamb=1: ligand fully decoupled from water
    potentials, params, masses, _, _ = enhanced.get_solvent_phase_system(mol, ff, lamb=1.0)

    U_fn = SummedPotential(potentials, params)
    kBT = BOLTZ * temperature

    # lambda enters only through the system parameterization (the 4D
    # w-coordinates of the decoupling nonbonded terms); cache the per-lambda
    # parameter sets so the jitted potentials/movers never retrace
    params_cache: dict = {}

    def params_list_at(lam: float):
        lam_key = float(lam)
        if lam_key not in params_cache:
            _, params_l, *_ = enhanced.get_solvent_phase_system(mol, ff, lamb=lam_key, minimize_energy=False)
            params_cache[lam_key] = [np.asarray(p) for p in params_l]
        return params_cache[lam_key]

    params_cache[1.0] = [np.asarray(p) for p in params]

    def reduced_potential_fxn(xvb, lam):
        flat = np.concatenate([np.ravel(p) for p in params_list_at(lam)])
        return U_fn(xvb.coords, flat, xvb.box) / kBT

    bps = [pot.bind(p) for pot, p in zip(potentials, params)]
    npt_mover = NPTMove(bps, masses, temperature, pressure, n_steps=n_steps, seed=seed)
    npt_mover.params_list_at = params_list_at  # used by SMC propagate

    solvent_xvbs, ligand_samples, ligand_log_weights = enhanced.pregenerate_samples(
        mol, ff, 1.0, seed, temperature=temperature, pressure=pressure, num_workers=num_workers
    )
    n_endstate_samples = 5000
    num_ligand_atoms = mol.num_atoms
    all_xvbs = generate_endstate_samples(
        n_endstate_samples, solvent_xvbs, ligand_samples, ligand_log_weights, num_ligand_atoms
    )
    return reduced_potential_fxn, npt_mover, all_xvbs


def set_up_ahfe_system_for_smc(
    mol, n_walkers, n_windows, n_md_steps, resample_thresh, seed=2022, ff=None, num_workers=None
):
    """Initial samples, lambda schedule, propagate/log_prob/resample fxns for
    SMC (ref absolute_hydration.py:149-177)."""
    reduced_potential, mover, initial_samples = setup_absolute_hydration_with_endpoint_samples(
        mol, n_steps=n_md_steps, seed=seed, ff=ff, num_workers=num_workers
    )
    np.random.seed(seed)

    sample_inds = np.random.choice(np.arange(len(initial_samples)), size=n_walkers, replace=True)
    samples = [initial_samples[i] for i in sample_inds]

    # tm convention: lambda=1 decoupled, lambda=0 coupled
    lambdas = construct_pre_optimized_absolute_lambda_schedule_solvent(n_windows)

    def propagate(xs, lam):
        # swap the mover onto this lambda's parameters (recompile-free)
        mover.set_params(mover.params_list_at(lam))
        return [mover.move(x) for x in xs]

    def log_prob(xs, lam):
        u_s = np.array([reduced_potential(x, lam) for x in xs])
        return -u_s

    resample = partial(smc.conditional_multinomial_resample, thresh=resample_thresh)
    return samples, lambdas, propagate, log_prob, resample


def estimate_absolute_free_energy(
    mol,
    ff: Forcefield,
    host_config: HostConfig,
    prefix="",
    md_params: MDParams = DEFAULT_AHFE_MD_PARAMS,
    n_windows=None,
):
    """Windowed AHFE with independent simulations + pair BAR
    (ref absolute_hydration.py:178-237)."""
    bt = BaseTopology(mol, ff)
    afe = AbsoluteFreeEnergy(mol, bt)
    if md_params is None:
        md_params = MDParams(n_frames=2000, steps_per_frame=400, n_eq_steps=200000, seed=2023)

    # tm convention: lambda=1 decoupled; schedule runs decoupled -> coupled
    lambda_schedule = construct_pre_optimized_absolute_lambda_schedule_solvent(n_windows)[::-1]
    assert np.isclose(lambda_schedule[0], 1.0) and np.isclose(lambda_schedule[-1], 0.0)

    temperature = DEFAULT_TEMP
    initial_states = setup_initial_states(afe, ff, host_config, temperature, lambda_schedule, md_params.seed)

    combined_prefix = get_mol_name(mol) + "_" + prefix
    try:
        result, stored_trajectories = run_sims_sequential(initial_states, md_params, temperature)
        plots = make_pair_bar_plots(result, temperature, combined_prefix)
        return SimulationResult(result, plots, stored_trajectories, md_params, [])
    except Exception as err:
        with open(f"failed_ahfe_result_{combined_prefix}.pkl", "wb") as fh:
            pickle.dump((initial_states, md_params, err), fh)
        raise err


def setup_initial_states(
    afe: AbsoluteFreeEnergy,
    ff: Forcefield,
    host_config: HostConfig,
    temperature: float,
    lambda_schedule: Array,
    seed: int,
) -> list[InitialState]:
    """InitialState per lambda for a monotonically decreasing schedule
    (ref absolute_hydration.py:239-317)."""
    host_conf = minimizer.fire_minimize_host([afe.mol], host_config, ff)

    initial_states = []
    assert np.all(np.diff(lambda_schedule) < 0)

    for lamb in lambda_schedule:
        ligand_conf = get_romol_conf(afe.mol)
        ubps, params, masses = afe.prepare_host_edge(ff, host_config, lamb)
        x0 = afe.prepare_combined_coords(host_coords=host_conf)
        bps = [ubp.bind(param) for ubp, param in zip(ubps, params)]

        bond_potential = get_potential_by_type(ubps, HarmonicBond)
        hmr_masses = model_utils.apply_hmr(masses, bond_potential.idxs)
        group_idxs = get_group_indices(get_bond_list(bond_potential), len(masses))
        baro = MonteCarloBarostat(len(hmr_masses), 1.0, temperature, group_idxs, 15, seed)
        box0 = host_config.box

        v0 = np.zeros_like(x0)
        num_ligand_atoms = len(ligand_conf)
        num_total_atoms = len(x0)
        ligand_idxs = np.arange(num_total_atoms - num_ligand_atoms, num_total_atoms)

        intg = LangevinIntegrator(temperature, 2.5e-3, 1.0, hmr_masses, seed)
        state = InitialState(bps, intg, baro, x0, v0, box0, lamb, ligand_idxs, np.array([], dtype=np.int32))
        initial_states.append(state)
    return initial_states


def run_solvent(
    mol, forcefield: Forcefield, _, md_params: MDParams, n_windows=16
) -> tuple[SimulationResult, HostConfig]:
    """(ref absolute_hydration.py:319-333)"""
    box_width = 4.0
    solvent_host_config = builders.build_water_system(box_width, forcefield.water_ff, mols=[mol])
    solvent_host_config.box += np.diag([0.1, 0.1, 0.1])
    solvent_res = estimate_absolute_free_energy(
        mol,
        forcefield,
        solvent_host_config,
        md_params=md_params,
        prefix="solvent",
        n_windows=n_windows,
    )
    return solvent_res, solvent_host_config
