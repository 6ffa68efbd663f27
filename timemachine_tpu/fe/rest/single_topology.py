"""REST2-style single topology: selective energy scaling of intermediate
states for enhanced sampling.

Parity target: reference `timemachine/fe/rest/single_topology.py` —
temperature-scale interpolation (:22-27), REST region construction
(:90-176), softened-proper selection (:178-225), energy scaling of propers,
intramolecular and host-guest nonbonded terms (:227-289).
"""

from dataclasses import replace
from functools import cached_property

import jax.numpy as jnp
import networkx as nx
import numpy as np

from timemachine_tpu.constants import NBParamIdx
from timemachine_tpu.fe.single_topology import AtomMapFlags, SingleTopology
from timemachine_tpu.graph_utils import convert_to_nx

from .bond import CanonicalBond, CanonicalProper, mkbond, mkproper
from .interpolation import InterpolationFxn, InterpolationFxnName, Symmetric, get_interpolation_fxn
from .queries import get_aliphatic_ring_bonds, get_rotatable_bonds


def get_temperature_scale_interpolation_fxn(
    max_temperature_scale: float, interpolation: InterpolationFxnName
) -> InterpolationFxn:
    """f(0) = f(1) = 1, f(0.5) = max_temperature_scale, symmetric
    (ref rest/single_topology.py:22-27)."""
    return Symmetric(get_interpolation_fxn(interpolation, 1.0, max_temperature_scale))


def _neighbors(mol, idx: int) -> list:
    return [b.other(idx) for b in mol.bonds if idx in (b.src, b.dst)]


class SingleTopologyREST(SingleTopology):
    """SingleTopology with REST-like energy scaling of softened interactions:
    rotatable/aliphatic-ring propers, ligand-ligand and ligand-environment
    nonbonded terms, scaled by 1/temperature_scale(lamb)
    (ref rest/single_topology.py:30-289)."""

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
        print("rest is enabled with temp:", max_temperature_scale)
        self._temperature_scale_interpolation_fxn: InterpolationFxn = get_temperature_scale_interpolation_fxn(
            max_temperature_scale, temperature_scale_interpolation
        )
        self._nxg_a = convert_to_nx(mol_a)
        self._nxg_b = convert_to_nx(mol_b)
        self._cycles_a = nx.cycle_basis(self._nxg_a)
        self._cycles_b = nx.cycle_basis(self._nxg_b)

    @staticmethod
    def expand_rest_region_in_mol(atom_idxs, cycles, mol):
        """Expand a REST region to whole rings plus attached terminal atoms
        (ref rest/single_topology.py:91-120)."""
        region = set()
        for atom_idx in atom_idxs:
            for cycle in cycles:
                if atom_idx in cycle:
                    region.update(cycle)

        inner_rest_idxs = region.union(set(atom_idxs))
        outer_rest_idxs: set = set()
        for atom_idx in range(mol.num_atoms):
            nbs = _neighbors(mol, atom_idx)
            if len(nbs) == 1:
                if nbs[0] in inner_rest_idxs:
                    outer_rest_idxs.add(atom_idx)
            elif len(nbs) == 2:
                # 1-connected nitriles / hydroxyls hanging off the region
                nb_nb = None
                if nbs[0] in inner_rest_idxs:
                    nb_nb = nbs[1]
                elif nbs[1] in inner_rest_idxs:
                    nb_nb = nbs[0]
                if nb_nb is not None and len(_neighbors(mol, nb_nb)) == 1:
                    outer_rest_idxs.add(atom_idx)
                    outer_rest_idxs.add(nb_nb)

        return inner_rest_idxs.union(outer_rest_idxs)

    def split_combined_idxs(self, combined_idxs):
        """(ref rest/single_topology.py:122-133)"""
        mol_a_idxs = [
            self.c_to_a[idx]
            for idx in combined_idxs
            if self.c_flags[idx] in (AtomMapFlags.CORE, AtomMapFlags.MOL_A)
        ]
        mol_b_idxs = [
            self.c_to_b[idx]
            for idx in combined_idxs
            if self.c_flags[idx] in (AtomMapFlags.CORE, AtomMapFlags.MOL_B)
        ]
        return mol_a_idxs, mol_b_idxs

    @cached_property
    def base_rest_region_atom_idxs(self) -> set:
        """Combined-ligand atoms whose bond/angle/improper parameters differ
        between end states, plus all dummies (ref rest/single_topology.py:135-162)."""
        aligned_potentials = [self.aligned_bond, self.aligned_angle, self.aligned_improper]
        idxs = {
            int(idx)
            for aligned in aligned_potentials
            for idxs_row, params_a, params_b in zip(aligned.idxs, aligned.src_params, aligned.dst_params)
            if not np.all(np.asarray(params_a) == np.asarray(params_b))
            for idx in idxs_row
        }
        idxs |= self.get_dummy_atoms_a()
        idxs |= self.get_dummy_atoms_b()
        return idxs

    @cached_property
    def rest_region_atom_idxs(self) -> set:
        """(ref rest/single_topology.py:164-173)"""
        mol_a_idxs, mol_b_idxs = self.split_combined_idxs(self.base_rest_region_atom_idxs)
        expanded_a = self.expand_rest_region_in_mol(mol_a_idxs, self._cycles_a, self.mol_a)
        expanded_b = self.expand_rest_region_in_mol(mol_b_idxs, self._cycles_b, self.mol_b)
        return set(int(self.a_to_c[x]) for x in expanded_a) | set(int(self.b_to_c[x]) for x in expanded_b)

    @cached_property
    def aliphatic_ring_bonds(self) -> set:
        ring_bonds_a = {bond.translate(self.a_to_c) for bond in get_aliphatic_ring_bonds(self.mol_a)}
        ring_bonds_b = {bond.translate(self.b_to_c) for bond in get_aliphatic_ring_bonds(self.mol_b)}
        return ring_bonds_a | ring_bonds_b

    @cached_property
    def rotatable_bonds(self) -> set:
        rotatable_a = {bond.translate(self.a_to_c) for bond in get_rotatable_bonds(self.mol_a)}
        rotatable_b = {bond.translate(self.b_to_c) for bond in get_rotatable_bonds(self.mol_b)}
        return rotatable_a | rotatable_b

    @cached_property
    def propers(self) -> list:
        return [mkproper(*idxs) for idxs in super().setup_intermediate_state(0.0).proper.potential.idxs]

    @cached_property
    def candidate_propers(self) -> dict:
        """Propers whose central bond is rotatable or an aliphatic ring bond
        (ref rest/single_topology.py:198-207)."""
        return {
            idx: proper
            for idx, proper in enumerate(self.propers)
            for bond in [mkbond(proper.j, proper.k)]
            if bond in self.rotatable_bonds or bond in self.aliphatic_ring_bonds
        }

    @cached_property
    def target_propers(self) -> dict:
        return {
            idx: proper
            for (idx, proper) in self.candidate_propers.items()
            if any(i in self.rest_region_atom_idxs for i in proper.idxs)
        }

    @cached_property
    def target_proper_idxs(self) -> list:
        return list(self.target_propers.keys())

    def get_energy_scale_factor(self, lamb: float) -> float:
        return 1.0 / float(self._temperature_scale_interpolation_fxn(lamb))

    def setup_intermediate_state(self, lamb: float):
        """(ref rest/single_topology.py:230-257)"""
        ref_state = super().setup_intermediate_state(lamb)
        energy_scale = self.get_energy_scale_factor(lamb)

        proper = ref_state.proper.potential.bind(
            jnp.asarray(ref_state.proper.params).at[self.target_proper_idxs, 0].mul(energy_scale)
        )

        rest_region_pair_idxs = [
            idx
            for idx, (i, j) in enumerate(ref_state.nonbonded_pair_list.potential.idxs)
            if i in self.rest_region_atom_idxs or j in self.rest_region_atom_idxs
        ]

        nonbonded_pair_list = ref_state.nonbonded_pair_list.potential.bind(
            jnp.asarray(ref_state.nonbonded_pair_list.params)
            .at[rest_region_pair_idxs, NBParamIdx.Q_IDX]
            .mul(energy_scale)
            .at[rest_region_pair_idxs, NBParamIdx.LJ_EPS_IDX]
            .mul(energy_scale)
        )

        return replace(ref_state, proper=proper, nonbonded_pair_list=nonbonded_pair_list)

    def combine_with_host(self, host_system, lamb: float, num_water_atoms: int, ff, host_topology=None):
        """Additionally scales ligand charges/epsilons in the host-guest
        interaction group (ref rest/single_topology.py:259-289; scaling the
        ligand side keeps water-sampler parameter consistency)."""
        ref_state = super().combine_with_host(host_system, lamb, num_water_atoms, ff, host_topology)

        num_atoms_host = host_system.nonbonded_all_pairs.potential.num_atoms
        rest_region_atom_idxs = np.array(sorted(self.rest_region_atom_idxs)) + num_atoms_host
        energy_scale = self.get_energy_scale_factor(lamb)

        nonbonded_host_guest_ixn = ref_state.nonbonded_ixn_group.potential.bind(
            jnp.asarray(ref_state.nonbonded_ixn_group.params)
            .at[rest_region_atom_idxs, NBParamIdx.Q_IDX]
            .mul(energy_scale)
            .at[rest_region_atom_idxs, NBParamIdx.LJ_EPS_IDX]
            .mul(energy_scale)
        )

        return replace(ref_state, nonbonded_ixn_group=nonbonded_host_guest_ixn)
