"""Core restraint setup from SMARTS patterns.

Parity target: reference `timemachine/fe/restraints.py` —
setup_relative_restraints_using_smarts (:8-80): enumerate all substructure
match combinations in both mols, Hungarian-assign atoms per combination,
keep the mapping with minimal RMSD.
"""

import numpy as np
from scipy.optimize import linear_sum_assignment

from timemachine_tpu.chem.smarts import match_smarts
from timemachine_tpu.fe.utils import get_romol_conf


def setup_relative_restraints_using_smarts(mol_a, mol_b, smarts):
    """Atom mapping (N, 2) between mol_a and mol_b over a common-core SMARTS
    (ref restraints.py:8-80)."""
    assert "." not in smarts  # core must be connected

    limit = 1000
    all_core_idxs_a = np.array(match_smarts(mol_a, smarts, uniquify=False))
    all_core_idxs_b = np.array(match_smarts(mol_b, smarts, uniquify=False))

    assert len(all_core_idxs_a) < limit
    assert len(all_core_idxs_b) < limit
    assert len(all_core_idxs_a) > 0 and len(all_core_idxs_b) > 0, "SMARTS core must match both molecules"

    best_rmsd = np.inf
    best_core_idxs_a = None
    best_core_idxs_b = None

    ligand_coords_a = get_romol_conf(mol_a)
    ligand_coords_b = get_romol_conf(mol_b)

    for core_idxs_a in all_core_idxs_a:
        for core_idxs_b in all_core_idxs_b:
            ri = np.expand_dims(ligand_coords_a[core_idxs_a], 1)
            rj = np.expand_dims(ligand_coords_b[core_idxs_b], 0)
            rij = np.sqrt(np.sum(np.power(ri - rj, 2), axis=-1))

            row_idxs, col_idxs = linear_sum_assignment(rij)
            rmsd = np.linalg.norm(ligand_coords_a[core_idxs_a[row_idxs]] - ligand_coords_b[core_idxs_b[col_idxs]])
            if rmsd < best_rmsd:
                best_rmsd = rmsd
                best_core_idxs_a = core_idxs_a
                best_core_idxs_b = core_idxs_b

    core_idxs = np.stack([best_core_idxs_a, best_core_idxs_b], axis=1).astype(np.int32)
    print("core_idxs", core_idxs, "rmsd", best_rmsd)
    return core_idxs
