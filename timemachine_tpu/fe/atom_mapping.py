"""Atom mapping: find alchemical cores maximizing mapped edges.

Parity target: reference timemachine/fe/atom_mapping.py — distance-based
candidate predicates (ring/chain cutoffs over the aligned 3D conformers),
McGregor MCS search (fe/mcgregor.py), chirality / planar-torsion filters, and
joint sorting of the resulting cores by (core bonds broken, valence
mismatch, mean-square distance).
"""

from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Optional

import numpy as np

from timemachine_tpu.fe import mcgregor
from timemachine_tpu.fe.chiral_utils import (
    ChiralRestrIdxSet,
    has_chiral_atom_flips,
    setup_find_flipped_planar_torsions,
)
from timemachine_tpu.fe.utils import get_romol_conf


class AtomMappingError(Exception):
    pass


def get_cores_and_diagnostics(
    mol_a,
    mol_b,
    ring_cutoff,
    chain_cutoff,
    max_visits,
    max_connected_components: Optional[int],
    min_connected_component_size: int,
    max_cores,
    enforce_core_core,
    ring_matches_ring_only,
    enforce_chiral,
    disallow_planar_torsion_flips,
    min_threshold,
    initial_mapping,
):
    """(ref atom_mapping.py:49-92)"""
    assert max_cores > 0
    get_cores_ = partial(
        _get_cores_impl,
        ring_cutoff=ring_cutoff,
        chain_cutoff=chain_cutoff,
        max_visits=max_visits,
        max_connected_components=max_connected_components,
        min_connected_component_size=min_connected_component_size,
        max_cores=max_cores,
        enforce_core_core=enforce_core_core,
        ring_matches_ring_only=ring_matches_ring_only,
        enforce_chiral=enforce_chiral,
        disallow_planar_torsion_flips=disallow_planar_torsion_flips,
        min_threshold=min_threshold,
    )
    # require n_a <= n_b for the search
    if mol_a.num_atoms > mol_b.num_atoms:
        initial_mapping_r = initial_mapping[:, ::-1] if initial_mapping is not None else None
        all_cores_r, diag = get_cores_(mol_b, mol_a, initial_mapping=initial_mapping_r)
        return [core_r[:, ::-1] for core_r in all_cores_r], diag
    return get_cores_(mol_a, mol_b, initial_mapping=initial_mapping)


def get_cores(
    mol_a,
    mol_b,
    ring_cutoff,
    chain_cutoff,
    max_visits,
    max_connected_components: Optional[int],
    min_connected_component_size: int,
    max_cores,
    enforce_core_core,
    ring_matches_ring_only,
    enforce_chiral,
    disallow_planar_torsion_flips,
    min_threshold,
    initial_mapping,
):
    """Cores sorted by (core bonds broken, valence changes, alignment msd)
    (ref atom_mapping.py:94-194). Raises mcgregor.NoMappingError if none."""
    all_cores, _ = get_cores_and_diagnostics(
        mol_a,
        mol_b,
        ring_cutoff,
        chain_cutoff,
        max_visits,
        max_connected_components,
        min_connected_component_size,
        max_cores,
        enforce_core_core,
        ring_matches_ring_only,
        enforce_chiral,
        disallow_planar_torsion_flips,
        min_threshold,
        initial_mapping,
    )
    return all_cores


def _reorder_atoms_by_degree_and_initial_mapping(mol, initial_mapping):
    """Sort A's atoms by descending degree (initially-mapped atoms first) —
    penalizes unmapping high-degree vertices early (ref atom_mapping.py:196-214).
    Returns a reordered *view* as (perm, inv) without touching the mol."""
    degrees = np.array([mol.degree(i) for i in range(mol.num_atoms)], dtype=np.float64)
    if len(initial_mapping):
        degrees[initial_mapping[:, 0].astype(int)] = np.inf
    perm = np.argsort(degrees, kind="stable")[::-1]
    old_to_new = {int(old): new for new, old in enumerate(perm)}
    new_mapping = np.array([[old_to_new[int(a)], int(b)] for a, b in initial_mapping]).reshape(-1, 2)
    return perm, old_to_new, new_mapping


def _uniquify_core(core):
    return frozenset((int(a), int(b)) for a, b in core)


def _deduplicate_all_cores(all_cores):
    unique = {}
    for core in all_cores:
        unique[_uniquify_core(core)] = core
    return list(unique.values())


def core_bonds_broken_count(mol_a, mol_b, core):
    """(ref atom_mapping.py:234-247)"""
    core_a_to_b = {int(a): int(b) for a, b in core}
    count = 0
    for bond in mol_a.bonds:
        if bond.src in core_a_to_b and bond.dst in core_a_to_b:
            if mol_b.get_bond(core_a_to_b[bond.src], core_a_to_b[bond.dst]) is None:
                count += 1
    return count


def remove_cores_smaller_than_largest(cores):
    """(ref atom_mapping.py:396-404)"""
    if not cores:
        return cores
    largest = max(len(c) for c in cores)
    return [c for c in cores if len(c) == largest]


def _get_cores_impl(
    mol_a,
    mol_b,
    ring_cutoff,
    chain_cutoff,
    max_visits,
    max_connected_components,
    min_connected_component_size,
    max_cores,
    enforce_core_core,
    ring_matches_ring_only,
    enforce_chiral,
    disallow_planar_torsion_flips,
    min_threshold,
    initial_mapping,
):
    """(ref atom_mapping.py:249-393)"""
    if initial_mapping is None:
        initial_mapping = np.zeros((0, 2))
    initial_mapping = np.asarray(initial_mapping).reshape(-1, 2)

    perm, old_to_new, initial_mapping_p = _reorder_atoms_by_degree_and_initial_mapping(mol_a, initial_mapping)
    mol_a_p = mol_a.renumber(perm)

    conf_a = mol_a_p.get_conf()
    conf_b = mol_b.get_conf()
    bonds_a = mol_a_p.bond_list()
    bonds_b = mol_b.bond_list()

    init_kv = {int(a): int(b) for a, b in initial_mapping_p}

    priority_idxs = []
    for idx, a_xyz in enumerate(conf_a):
        if idx < len(initial_mapping_p):
            priority_idxs.append([init_kv[idx]])
            continue
        a_in_ring = mol_a_p.atom_in_ring(idx)
        dijs = np.linalg.norm(conf_b - a_xyz, axis=1)
        allowed = set()
        for jdx in range(mol_b.num_atoms):
            if ring_matches_ring_only and (a_in_ring != mol_b.atom_in_ring(jdx)):
                continue
            cutoff = ring_cutoff if (a_in_ring or mol_b.atom_in_ring(jdx)) else chain_cutoff
            if dijs[jdx] < cutoff:
                allowed.add(jdx)
        priority_idxs.append([int(j) for j in np.argsort(dijs, kind="stable") if int(j) in allowed])

    filter_fxns = []
    if enforce_chiral:
        chiral_set_a = ChiralRestrIdxSet.from_mol(mol_a_p, conf_a)
        chiral_set_b = ChiralRestrIdxSet.from_mol(mol_b, conf_b)
        filter_fxns.append(lambda trial: not has_chiral_atom_flips(trial, chiral_set_a, chiral_set_b))
    if disallow_planar_torsion_flips:
        find_flipped = setup_find_flipped_planar_torsions(mol_a_p, mol_b)
        filter_fxns.append(lambda trial: next(find_flipped(trial), None) is None)

    def filter_fxn(trial_core):
        return all(f(trial_core) for f in filter_fxns)

    # the native C++ search (timemachine_tpu/native/mcgregor.cpp) is the
    # production path — the chiral/planar filters run as built-in hash-table
    # checks instead of per-node Python callbacks (~40x end-to-end). The
    # pure-Python module remains the executable spec and fallback
    # (set TIMEMACHINE_TPU_PURE_PYTHON_MCS=1).
    mcs_native = None
    if not os.environ.get("TIMEMACHINE_TPU_PURE_PYTHON_MCS"):
        try:
            from timemachine_tpu.fe.mcgregor_native import mcs_native
        except Exception as e:  # no toolchain: fall back silently
            warnings.warn(f"native MCS unavailable ({e}); using the pure-Python search")

    common_args = (
        mol_a.num_atoms,
        mol_b.num_atoms,
        priority_idxs,
        bonds_a,
        bonds_b,
        max_visits,
        max_cores,
        enforce_core_core,
        max_connected_components,
        min_connected_component_size,
        min_threshold,
        initial_mapping_p,
    )
    if mcs_native is not None:
        from timemachine_tpu.fe.chiral_utils import enumerate_planar_torsions

        native_kwargs: dict = {}
        if enforce_chiral:
            native_kwargs["chiral_quartets_a"] = np.array(chiral_set_a.restr_idxs, dtype=np.int32).reshape(-1, 4)
            native_kwargs["disallowed_quartets_b"] = sorted(chiral_set_b.disallowed_set)
        if disallow_planar_torsion_flips:
            pt_a = enumerate_planar_torsions(mol_a_p)
            pt_b = dict(enumerate_planar_torsions(mol_b))
            pt_b.update({(l, k, j, i): s for (i, j, k, l), s in list(pt_b.items())})
            native_kwargs["planar_torsions_a"] = np.array(list(pt_a.keys()), dtype=np.int32).reshape(-1, 4)
            native_kwargs["planar_signs_a"] = np.array(list(pt_a.values()), dtype=np.int8)
            native_kwargs["planar_torsions_b"] = np.array(list(pt_b.keys()), dtype=np.int32).reshape(-1, 4)
            native_kwargs["planar_signs_b"] = np.array(list(pt_b.values()), dtype=np.int8)
        all_cores, _, diagnostics = mcs_native(*common_args, **native_kwargs)
    else:
        all_cores, _, diagnostics = mcgregor.mcs(*common_args, filter_fxn)

    all_cores = remove_cores_smaller_than_largest(all_cores)
    all_cores = _deduplicate_all_cores(all_cores)

    # joint sort: core bonds broken, valence mismatch, alignment msd
    cb_counts, valence_mismatches, mean_sq_distances = [], [], []
    for core in all_cores:
        r_i = conf_a[core[:, 0]]
        r_j = conf_b[core[:, 1]]
        mean_sq_distances.append(np.sum((r_i - r_j) ** 2) / len(core))
        v_count = sum(abs(mol_a_p.valence(int(i)) - mol_b.valence(int(j))) for i, j in core)
        valence_mismatches.append(v_count)
        cb_counts.append(
            core_bonds_broken_count(mol_a_p, mol_b, core)
            + core_bonds_broken_count(mol_b, mol_a_p, core[:, [1, 0]])
        )

    sort_vals = np.array(
        list(zip(cb_counts, valence_mismatches, mean_sq_distances)),
        dtype=[("cb", "i"), ("valence", "f"), ("msd", "f")],
    )
    sorted_cores = []
    for p in np.argsort(sort_vals, order=["cb", "valence", "msd"]):
        core = all_cores[p].copy()
        core[:, 0] = perm[core[:, 0]]  # undo the degree reordering
        sorted_cores.append(core)

    return sorted_cores, diagnostics
