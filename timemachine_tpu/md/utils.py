"""MD utilities: bond-graph groups, box helpers, velocity sampling.

Parity targets: reference md/barostat/utils.py (get_bond_list,
get_group_indices, compute_box_volume/center) and md/thermostat/utils.py
(sample_velocities). get_group_indices uses a numpy union-find instead of
the reference's networkx traversal (no graph dependency; same grouping,
components ordered by their smallest atom index)."""

from __future__ import annotations

import numpy as np

from timemachine_tpu.constants import BOLTZ


def compute_box_volume(box) -> float:
    assert box.shape == (3, 3)
    return float(np.linalg.det(box))


def compute_box_center(box) -> np.ndarray:
    box = np.asarray(box)
    assert box.shape == (3, 3)
    assert not np.any(box - np.diag(np.diagonal(box))), "expected an axis-aligned box"
    return 0.5 * np.diagonal(box).copy()


def get_bond_list(harmonic_bond_potential) -> list[tuple[int, int]]:
    """Topology read off the harmonic-bond indices (assumes every valence
    bond is represented there — ref md/barostat/utils.py:26-37)."""
    return [(int(i), int(j)) for i, j in harmonic_bond_potential.idxs]


def get_group_indices(bond_list, num_atoms: int) -> list[np.ndarray]:
    """Connected components of the bond graph over ALL atoms (unbonded atoms
    are singleton groups), each sorted ascending, components ordered by
    smallest member (ref md/barostat/utils.py:40-58)."""
    root = np.arange(num_atoms, dtype=np.int64)

    def find(a: int) -> int:
        while root[a] != a:
            root[a] = root[root[a]]  # path halving
            a = root[a]
        return a

    for i, j in bond_list:
        assert i < num_atoms and j < num_atoms
        ri, rj = find(int(i)), find(int(j))
        # union by smallest label keeps roots == component minima
        if ri != rj:
            lo, hi = (ri, rj) if ri < rj else (rj, ri)
            root[hi] = lo

    labels = np.array([find(a) for a in range(num_atoms)])
    order = np.argsort(labels, kind="stable")
    sorted_labels = labels[order]
    starts = np.flatnonzero(np.r_[True, sorted_labels[1:] != sorted_labels[:-1]])
    return [np.array(chunk) for chunk in np.split(order, starts[1:])]


def compute_intramolecular_distances(coords, group_indices):
    """Condensed pairwise distances within each group."""
    from scipy.spatial.distance import pdist

    return [pdist(coords[inds]) for inds in group_indices]


def sample_velocities(masses, temperature: float, seed: int) -> np.ndarray:
    """Maxwell-Boltzmann draw at `temperature` (ref md/thermostat/utils.py:7)."""
    rng = np.random.default_rng(seed)
    sigma = np.sqrt(BOLTZ * temperature / np.asarray(masses, dtype=np.float64))
    return sigma[:, None] * rng.normal(size=(len(sigma), 3))
