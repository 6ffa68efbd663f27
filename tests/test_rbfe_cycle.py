"""Thermodynamic cycle closure of the full vacuum RBFE pipeline:
dG(A->B) + dG(B->A) must vanish within statistical error.

This exercises atom mapping, dummy-group factorization, lambda
interpolation, bisection, HREX, and pair-BAR end-to-end (the strongest
single physics check of the alchemy stack). ~6 min on CPU -> nightly."""

from pathlib import Path

import numpy as np
import pytest

HIF2A_SDF = Path("/root/reference/timemachine/testsystems/fep_benchmark/hif2a/ligands.sdf")

pytestmark = [
    pytest.mark.nightly,
    pytest.mark.skipif(not HIF2A_SDF.exists(), reason="reference benchmark data absent"),
]


def test_vacuum_rbfe_cycle_closure():
    import warnings

    warnings.simplefilter("ignore")
    from timemachine_tpu.fe.free_energy import HREXParams, MDParams
    from timemachine_tpu.fe.rbfe import run_vacuum
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
    ff = Forcefield.load_default()
    md_params = MDParams(
        n_frames=60,
        n_eq_steps=2000,
        steps_per_frame=200,
        seed=2026,
        hrex_params=HREXParams(n_frames_bisection=20),
    )

    res_fwd = run_vacuum(mol_a, mol_b, core, ff, None, md_params=md_params, n_windows=12, min_overlap=0.667)
    dg_fwd = float(np.sum(res_fwd.final_result.dGs))
    err_fwd = float(np.linalg.norm(res_fwd.final_result.dG_errs))

    res_rev = run_vacuum(mol_b, mol_a, core[:, ::-1], ff, None, md_params=md_params, n_windows=12, min_overlap=0.667)
    dg_rev = float(np.sum(res_rev.final_result.dGs))
    err_rev = float(np.linalg.norm(res_rev.final_result.dG_errs))

    cycle = dg_fwd + dg_rev
    cycle_err = float(np.sqrt(err_fwd**2 + err_rev**2))
    # measured 2.69 +- 2.39 kJ/mol at these settings; allow 3 sigma + floor
    assert abs(cycle) < max(3.0 * cycle_err, 6.0), (cycle, cycle_err, dg_fwd, dg_rev)
