"""MD utilities: bond-graph groups, box helpers, velocity sampling.

Parity targets: reference md/barostat/utils.py (get_bond_list,
get_group_indices, compute_box_volume/center) and md/thermostat/utils.py
(sample_velocities)."""

from __future__ import annotations

import networkx as nx
import numpy as np

from timemachine_tpu.constants import BOLTZ


def compute_box_volume(box) -> float:
    assert box.shape == (3, 3)
    return float(np.linalg.det(box))


def compute_box_center(box) -> np.ndarray:
    assert box.shape == (3, 3)
    assert np.linalg.norm(box - np.diag(np.diag(box))) == 0
    return np.sum(box / 2, axis=0)


def get_bond_list(harmonic_bond_potential) -> list[tuple[int, int]]:
    """(ref md/barostat/utils.py:26-37)"""
    return [(int(i), int(j)) for i, j in harmonic_bond_potential.idxs]


def get_group_indices(bond_list, num_atoms: int) -> list[np.ndarray]:
    """Connected components of the bond graph; unbonded atoms become
    singleton groups (ref md/barostat/utils.py:40-58)."""
    g = nx.Graph(bond_list)
    components = [np.array(sorted(c)) for c in nx.connected_components(g)]
    found = set()
    for grp in components:
        for idx in grp:
            assert idx < num_atoms
            found.add(int(idx))
    for atom_idx in range(num_atoms):
        if atom_idx not in found:
            components.append(np.array([atom_idx], dtype=np.int32))
    return components


def compute_intramolecular_distances(coords, group_indices):
    from scipy.spatial.distance import pdist

    return [pdist(coords[inds]) for inds in group_indices]


def sample_velocities(masses, temperature: float, seed: int) -> np.ndarray:
    """Maxwell-Boltzmann (ref md/thermostat/utils.py:7)."""
    rng = np.random.default_rng(seed)
    n = len(masses)
    sigma = np.sqrt(BOLTZ * temperature / np.asarray(masses, dtype=np.float64))
    return sigma[:, None] * rng.normal(size=(n, 3))
