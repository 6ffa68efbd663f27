"""Water sampling through the production entry points: get_context wires a
TIBD mover from WaterSamplingParams and a host-guest InitialState.

Parity target: reference tests/test_water_sampling.py strategy (sampler
construction from InitialState, parameter consistency assertions, MD+MC
interleaving)."""

from pathlib import Path

import numpy as np
import pytest

from timemachine_tpu.constants import DEFAULT_TEMP
from timemachine_tpu.fe.free_energy import (
    InitialState,
    MDParams,
    WaterSamplingParams,
    get_context,
    get_water_sampler_params,
    sample_with_context,
)
from timemachine_tpu.ff import Forcefield
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.barostat import MonteCarloBarostat
from timemachine_tpu.md.builders import build_water_system
from timemachine_tpu.md.utils import get_bond_list, get_group_indices, sample_velocities
from timemachine_tpu.potentials import HarmonicBond, get_bound_potential_by_type

HIF2A_SDF = Path("/root/reference/timemachine/testsystems/fep_benchmark/hif2a/ligands.sdf")

pytestmark = [
    pytest.mark.nightly,  # ~15 min: FIRE-minimized solvated host fixture
    pytest.mark.skipif(not HIF2A_SDF.exists(), reason="reference benchmark data absent"),
]


@pytest.fixture(scope="module")
def solvated_state():
    """Host-guest InitialState at lambda=0 on a small water box."""
    import warnings

    from timemachine_tpu.chem import read_sdf
    from timemachine_tpu.fe.single_topology import SingleTopology
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    from timemachine_tpu.md import minimizer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
        ff = Forcefield.load_default()
        st = SingleTopology(mol_a, mol_b, core, ff)
        host_config = build_water_system(2.6, mols=[mol_a, mol_b])
        host_coords = minimizer.fire_minimize_host([mol_a, mol_b], host_config, ff)
        system = st.combine_with_host(
            host_config.host_system, 0.0, host_config.num_water_atoms, ff, host_config.host_topology
        )

    potentials = system.get_U_fns()
    n_host = host_coords.shape[0]
    ligand_conf = st.combine_confs(mol_a.get_conf(), mol_b.get_conf(), 0.0)
    x0 = np.concatenate([host_coords, ligand_conf])
    n_total = x0.shape[0]

    masses = np.concatenate([host_config.masses, st.combine_masses()])
    bond_pot = get_bound_potential_by_type(potentials, HarmonicBond).potential
    group_idxs = get_group_indices(get_bond_list(bond_pot), n_total)
    baro = MonteCarloBarostat(n_total, 1.013, DEFAULT_TEMP, group_idxs, 25, seed=3)
    intg = LangevinIntegrator(DEFAULT_TEMP, 1.5e-3, 1.0, masses, seed=4)
    v0 = sample_velocities(masses, DEFAULT_TEMP, seed=5)

    ligand_idxs = np.arange(n_host, n_total, dtype=np.int32)
    return InitialState(
        potentials, intg, baro, x0, v0, host_config.box, 0.0, ligand_idxs, np.array([], dtype=np.int32)
    )


def test_get_water_sampler_params(solvated_state):
    params = get_water_sampler_params(solvated_state)
    assert params.shape == (solvated_state.x0.shape[0], 4)
    # host (water) rows must match the all-pairs nonbonded parameters
    from timemachine_tpu.potentials import Nonbonded

    nb = get_bound_potential_by_type(solvated_state.potentials, Nonbonded)
    n_host = solvated_state.ligand_idxs[0]
    np.testing.assert_array_equal(params[:n_host], np.asarray(nb.params)[:n_host])


def test_get_context_with_water_sampling(solvated_state):
    """get_context builds the TIBD mover; MD + exchange moves interleave."""
    md_params = MDParams(
        n_frames=2,
        n_eq_steps=0,
        steps_per_frame=30,
        seed=6,
        water_sampling_params=WaterSamplingParams(interval=30, n_proposals=20, batch_size=20, radius=0.8),
    )
    ctxt = get_context(solvated_state, md_params)
    assert len(ctxt.movers) == 2  # barostat + water sampler

    traj = sample_with_context(ctxt, md_params, DEFAULT_TEMP, solvated_state.ligand_idxs, max_buffer_frames=10)
    assert len(traj.frames) == 2
    assert np.all(np.isfinite(np.array(traj.frames)))

    from timemachine_tpu.md.exchange.targeted_insertion import TIBDExchangeMove

    ws_idx = next(i for i, m in enumerate(ctxt.movers) if isinstance(m, TIBDExchangeMove))
    ws_state = ctxt._mover_states[ws_idx]
    # 60 steps at interval 30 -> 2 firings x 20 proposals
    assert int(ws_state.n_proposed) == 40
    assert 0 <= int(ws_state.n_accepted) <= 40


def test_run_sims_hrex_with_water_sampling(solvated_state):
    """The replica-parallel HREX driver with barostat + TIBD water movers:
    per-state water-sampler params ride the (stacked) mover states, counters
    come back per state, and frames stay finite."""
    from dataclasses import replace as dc_replace

    import jax.numpy as jnp

    from timemachine_tpu.fe.free_energy import HREXParams, MDParams, run_sims_hrex
    from timemachine_tpu.potentials import NonbondedInteractionGroup

    # second state: ligand charges scaled down in the interaction group
    def scale_state(state, q_scale):
        pots = []
        for bp in state.potentials:
            p = np.asarray(bp.params).copy()
            if isinstance(bp.potential, NonbondedInteractionGroup):
                p[state.ligand_idxs, 0] *= q_scale
            pots.append(bp.potential.bind(p))
        return dc_replace(state, potentials=pots, lamb=1.0 - q_scale)

    states = [scale_state(solvated_state, 1.0), scale_state(solvated_state, 0.8)]

    md_params = MDParams(
        n_frames=2,
        n_eq_steps=0,
        steps_per_frame=30,
        seed=7,
        hrex_params=HREXParams(n_frames_bisection=1),
        water_sampling_params=WaterSamplingParams(interval=15, n_proposals=20, batch_size=20, radius=0.8),
    )
    pair_bar, trajs, diag, wsd = run_sims_hrex(states, md_params, print_diagnostics_interval=None)
    assert len(trajs) == 2 and all(len(t.frames) == 2 for t in trajs)
    assert np.all(np.isfinite(np.array([t.frames[-1] for t in trajs])))
    assert wsd is not None
    # 2 frames x 30 steps at interval 15 -> 4 firings x 20 proposals per state
    assert wsd.proposals_by_state_by_iter.shape == (2, 2, 2)
    assert int(wsd.proposals_by_state_by_iter[..., 1].sum()) == 2 * 4 * 20
    assert all(t.final_barostat_volume_scale_factor is not None for t in trajs)
