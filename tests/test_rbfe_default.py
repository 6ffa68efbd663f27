"""Default-suite end-to-end RBFE: a tiny vacuum HREX estimate runs the whole
stack — atom mapping → SingleTopology → state setup → bisection → the
replica-parallel HREX driver → pair-BAR — at toy frame counts.

The reference keeps an equivalent always-on smoke test
(tests/test_relative_free_energy.py); the full hif2a-pair cycle-closure
physics test remains nightly (test_rbfe_cycle.py).
"""

import warnings

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_pair():
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.chem.embed import embed_mol
    from timemachine_tpu.constants import DEFAULT_ATOM_MAPPING_KWARGS
    from timemachine_tpu.fe.atom_mapping import get_cores

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mol_a = mol_from_smiles("CCO", add_hs=True, name="ethanol")
        mol_b = mol_from_smiles("CCC", add_hs=True, name="propane")
        embed_mol(mol_a, seed=7)
        embed_mol(mol_b, seed=7)
        core = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)[0]
    return mol_a, mol_b, core


def test_vacuum_hrex_rbfe_end_to_end(tiny_pair):
    from timemachine_tpu.fe.free_energy import HREXParams, MDParams
    from timemachine_tpu.fe.rbfe import run_vacuum
    from timemachine_tpu.ff import Forcefield

    mol_a, mol_b, core = tiny_pair
    md_params = MDParams(
        n_frames=6,
        n_eq_steps=50,
        steps_per_frame=20,
        seed=2026,
        hrex_params=HREXParams(n_frames_bisection=2),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        result = run_vacuum(
            mol_a, mol_b, core, Forcefield.load_default(), None, md_params=md_params, n_windows=3
        )

    assert result.final_result.dGs is not None
    assert np.all(np.isfinite(result.final_result.dGs))
    assert len(result.trajectories) >= 2
    for traj in result.trajectories:
        assert len(traj.frames) == md_params.n_frames
        assert np.all(np.isfinite(traj.frames[-1]))
    # HREX diagnostics recorded a permutation per iteration
    diag = result.hrex_diagnostics
    n_states = len(result.final_result.initial_states)
    for perm in diag.replica_idx_by_state_by_iter:
        assert sorted(perm) == list(range(n_states))
