"""REST2-flavored single topology: attenuate selected interactions at
intermediate λ so conformational barriers melt where the transformation
happens.

Capability target: reference timemachine/fe/rest/single_topology.py. The
"hot region" (REST region) is grown from the atoms whose bonded parameters
actually change between end states (plus all dummy atoms): whole rings
touching them, then pendant decorations (terminal atoms and two-atom chains
such as hydroxyl/nitrile hanging off the region). Torsions whose central
bond is rotatable or part of an aliphatic ring and that touch the region,
plus the region's intramolecular and host-guest nonbonded charges/epsilons,
are divided by a symmetric λ-schedule of the effective temperature scale
(1 at the end states, max_temperature_scale at λ=0.5).

Structural differences from the reference: perturbed-atom seeds are found by
a vectorized parameter comparison over the aligned term tables; ring growth
uses the engine's own `Mol.ring_info()` (minimum cycle basis) instead of a
networkx cycle basis; softenable bonds are collected once in combined-index
space.
"""

from __future__ import annotations

from dataclasses import replace
from functools import cached_property

import jax.numpy as jnp
import numpy as np

from timemachine_tpu.constants import NBParamIdx
from timemachine_tpu.fe.single_topology import AtomMapFlags, SingleTopology

from .interpolation import InterpolationFxnName, Schedule, Symmetric
from .queries import get_aliphatic_ring_bonds, get_rotatable_bonds


def grow_rest_region(mol, seed_atoms) -> set:
    """Seeds -> whole rings containing a seed -> pendant decorations.

    Pendants: a terminal (degree-1) atom bonded to the region joins it; a
    degree-2 atom bridging the region to a terminal atom brings both (covers
    hydroxyls, nitriles, etc. hanging off a hot ring)."""
    seeds = set(int(a) for a in seed_atoms)
    ringed = set(seeds)
    for ring in mol.ring_info():
        if seeds & set(ring):
            ringed |= set(int(a) for a in ring)

    pendants = set()
    for atom in range(mol.num_atoms):
        nbs = mol.neighbors(atom)
        if len(nbs) == 1 and nbs[0] in ringed:
            pendants.add(atom)
        elif len(nbs) == 2:
            far = None
            if nbs[0] in ringed:
                far = nbs[1]
            elif nbs[1] in ringed:
                far = nbs[0]
            if far is not None and len(mol.neighbors(far)) == 1:
                pendants.add(atom)
                pendants.add(far)
    return ringed | pendants


class SingleTopologyREST(SingleTopology):
    """SingleTopology whose intermediate states run the REST region "hot"."""

    def __init__(
        self,
        mol_a,
        mol_b,
        core: np.ndarray,
        forcefield,
        max_temperature_scale: float,
        temperature_scale_interpolation: InterpolationFxnName = "exponential",
    ):
        super().__init__(mol_a, mol_b, core, forcefield)
        self.max_temperature_scale = max_temperature_scale
        # 1 at λ∈{0,1}, max at λ=0.5
        self._temperature_scale = Symmetric(
            Schedule(temperature_scale_interpolation, 1.0, max_temperature_scale)
        )

    # -- region construction --------------------------------------------------

    @cached_property
    def _perturbed_atom_idxs(self) -> set:
        """Combined atoms in any bond/angle/improper whose parameters differ
        between end states, plus every dummy atom."""
        seeds: set[int] = set()
        for table in (self.aligned_bond, self.aligned_angle, self.aligned_improper):
            src = np.asarray(table.src_params)
            dst = np.asarray(table.dst_params)
            changed = ~np.all(src == dst, axis=tuple(range(1, src.ndim)))
            seeds.update(int(i) for i in np.asarray(table.idxs)[changed].reshape(-1))
        return seeds | self.get_dummy_atoms_a() | self.get_dummy_atoms_b()

    def split_combined_idxs(self, combined_idxs):
        """Combined indices -> (mol_a indices, mol_b indices)."""
        idxs_a = [self.c_to_a[i] for i in combined_idxs if self.c_flags[i] != AtomMapFlags.MOL_B]
        idxs_b = [self.c_to_b[i] for i in combined_idxs if self.c_flags[i] != AtomMapFlags.MOL_A]
        return idxs_a, idxs_b

    @cached_property
    def rest_region_atom_idxs(self) -> set:
        """Hot-region atoms in combined indexing: the perturbed seeds grown
        per end-state molecule, mapped back."""
        seeds_a, seeds_b = self.split_combined_idxs(self._perturbed_atom_idxs)
        region_a = grow_rest_region(self.mol_a, seeds_a)
        region_b = grow_rest_region(self.mol_b, seeds_b)
        return {int(self.a_to_c[i]) for i in region_a} | {int(self.b_to_c[i]) for i in region_b}

    # compatibility name used by diagnostics/tests of the reference layout
    @property
    def base_rest_region_atom_idxs(self) -> set:
        return self._perturbed_atom_idxs

    # -- torsion targeting ----------------------------------------------------

    @cached_property
    def _softenable_bonds(self) -> set:
        """Rotatable + aliphatic-ring bonds of both molecules, combined idx."""
        bonds = set()
        for mol, to_c in ((self.mol_a, self.a_to_c), (self.mol_b, self.b_to_c)):
            for bond in get_rotatable_bonds(mol) | get_aliphatic_ring_bonds(mol):
                bonds.add(bond.translate(to_c))
        return bonds

    @cached_property
    def propers(self) -> list:
        return [tuple(int(i) for i in row) for row in self.aligned_proper.idxs]

    @cached_property
    def target_proper_idxs(self) -> list:
        """Rows of the proper table to attenuate: central bond softenable AND
        some atom inside the hot region."""
        from .bond import mkbond

        region = self.rest_region_atom_idxs
        soft = self._softenable_bonds
        return [
            row
            for row, idxs in enumerate(self.propers)
            if mkbond(idxs[1], idxs[2]) in soft and any(i in region for i in idxs)
        ]

    @cached_property
    def target_propers(self) -> dict:
        from .bond import mkproper

        return {row: mkproper(*self.propers[row]) for row in self.target_proper_idxs}

    # -- energy scaling -------------------------------------------------------

    def get_energy_scale_factor(self, lamb: float) -> float:
        return 1.0 / float(self._temperature_scale(lamb))

    def setup_intermediate_state(self, lamb: float):
        state = super().setup_intermediate_state(lamb)
        scale = self.get_energy_scale_factor(lamb)

        proper_params = jnp.asarray(state.proper.params).at[self.target_proper_idxs, 0].mul(scale)

        pair_idxs = np.asarray(state.nonbonded_pair_list.potential.idxs)
        region = self.rest_region_atom_idxs
        in_region = np.array([(i in region) or (j in region) for i, j in pair_idxs])
        hot_rows = np.flatnonzero(in_region)
        pair_params = (
            jnp.asarray(state.nonbonded_pair_list.params)
            .at[hot_rows, NBParamIdx.Q_IDX]
            .mul(scale)
            .at[hot_rows, NBParamIdx.LJ_EPS_IDX]
            .mul(scale)
        )

        return replace(
            state,
            proper=state.proper.potential.bind(proper_params),
            nonbonded_pair_list=state.nonbonded_pair_list.potential.bind(pair_params),
        )

    def combine_with_host(self, host_system, lamb: float, num_water_atoms: int, ff, host_topology=None):
        """Also attenuates the hot region's side of the host-guest interaction
        group (ligand-side scaling keeps water-sampler parameters coherent)."""
        state = super().combine_with_host(host_system, lamb, num_water_atoms, ff, host_topology)
        scale = self.get_energy_scale_factor(lamb)

        n_host = host_system.nonbonded_all_pairs.potential.num_atoms
        hot_rows = np.array(sorted(self.rest_region_atom_idxs), dtype=int) + n_host
        ixn_params = (
            jnp.asarray(state.nonbonded_ixn_group.params)
            .at[hot_rows, NBParamIdx.Q_IDX]
            .mul(scale)
            .at[hot_rows, NBParamIdx.LJ_EPS_IDX]
            .mul(scale)
        )
        return replace(state, nonbonded_ixn_group=state.nonbonded_ixn_group.potential.bind(ixn_params))
