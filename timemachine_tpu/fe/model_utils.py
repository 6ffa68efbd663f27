"""Model utilities (parity: reference timemachine/fe/model_utils.py subset)."""

from __future__ import annotations

import numpy as np


def apply_hmr(masses, bond_list, multiplier=2):
    """Hydrogen mass repartitioning: each H gains multiplier x its own mass,
    taken from its bonded heavy atom — total mass conserved
    (ref fe/model_utils.py:59-110). Enables dt = 2.5 fs without constraints."""
    masses = np.array(masses, dtype=np.float64)

    def is_hydrogen(i):
        return np.abs(masses[i] - 1.00794) < 1e-3

    for i, j in bond_list:
        i, j = np.array([i, j])[np.argsort([masses[i], masses[j]], kind="stable")]
        if is_hydrogen(i):
            if is_hydrogen(j):
                continue
            masses[j] -= multiplier * masses[i]
            masses[i] += multiplier * masses[i]
    return masses


def image_frame(group_idxs, coords, box):
    """Wrap molecules whole into the home box (ref model_utils.py image_frame)."""
    from timemachine_tpu.ops.pbc import image_molecules

    return image_molecules(coords, box, group_idxs)


def get_vacuum_val_and_grad_fn(mol, ff):
    """Vacuum potential val+grad closure for minimization
    (ref model_utils.py get_vacuum_val_and_grad_fn)."""
    import jax

    from timemachine_tpu.fe.topology import BaseTopology

    top = BaseTopology(mol, ff)
    system = top.setup_end_state()
    u_fn = system.get_U_fn()

    @jax.jit
    def val_and_grad(x):
        return jax.value_and_grad(u_fn)(x)

    return val_and_grad


def verify_chiral_validity_of_core(mol_a, mol_b, core, ff):
    """Hook kept for API parity; detailed chiral-core validation happens in
    atom_mapping (ref model_utils.py)."""
    from timemachine_tpu.fe import chiral_utils
    from timemachine_tpu.fe.utils import get_romol_conf

    chiral_set_a = chiral_utils.ChiralRestrIdxSet.from_mol(mol_a, get_romol_conf(mol_a))
    chiral_set_b = chiral_utils.ChiralRestrIdxSet.from_mol(mol_b, get_romol_conf(mol_b))
    conflicts = chiral_utils.find_atom_map_chiral_conflicts(np.asarray(core), chiral_set_a, chiral_set_b)
    if conflicts:
        raise ValueError(f"core has chiral conflicts: {conflicts}")
