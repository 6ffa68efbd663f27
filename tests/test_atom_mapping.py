"""Atom mapping (McGregor MCS) tests — identity mappings, synthetic pairs,
and the reference's FEP-benchmark ligands (data only)."""

from pathlib import Path

import numpy as np
import pytest

from timemachine_tpu.chem import mol_from_smiles, read_sdf
from timemachine_tpu.chem.embed import embed_mol
from timemachine_tpu.constants import DEFAULT_ATOM_MAPPING_KWARGS
from timemachine_tpu.fe.atom_mapping import get_cores

HIF2A_SDF = Path("/root/reference/timemachine/testsystems/fep_benchmark/hif2a/ligands.sdf")


def test_identity_mapping():
    mol = mol_from_smiles("CCO", add_hs=True)
    embed_mol(mol, seed=5)
    cores = get_cores(mol, mol, **DEFAULT_ATOM_MAPPING_KWARGS)
    core = cores[0]
    assert len(core) == mol.num_atoms
    np.testing.assert_array_equal(core[:, 0], core[:, 1])


def test_subset_mapping():
    """mol_b = mol_a plus a substituent, sharing exact coordinates on the
    common atoms -> core maps the shared substructure."""
    mol_a = mol_from_smiles("c1ccccc1", add_hs=True)  # benzene: 6C + 6H
    embed_mol(mol_a, seed=7)
    # build toluene-like mol_b with benzene coordinates copied
    mol_b = mol_from_smiles("Cc1ccccc1", add_hs=True)
    embed_mol(mol_b, seed=8)
    # align mol_b's ring onto mol_a's ring exactly: copy coords for ring
    # carbons and their Hs via a direct correspondence
    ring_a = [i for i in range(6)]  # benzene ring carbons come first
    ring_b = [i for i, a in enumerate(mol_b.atoms) if a.atomic_num == 6 and mol_b.atom_in_ring(i)]
    assert len(ring_b) == 6
    # place mol_b at mol_a ring coords (crude: copy ring, shift rest rigidly)
    delta = mol_a.coords[ring_a[0]] - mol_b.coords[ring_b[0]]
    mol_b.coords = mol_b.coords + delta
    cores = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)
    assert len(cores[0]) >= 2  # at least the anchor region maps


@pytest.mark.skipif(not HIF2A_SDF.exists(), reason="reference benchmark data absent")
def test_hif2a_pair_mapping():
    mols = read_sdf(HIF2A_SDF)
    by_name = {m.name: m for m in mols}
    # the canonical reference test pair (testsystems/relative.py)
    mol_a = by_name.get("338") or mols[0]
    mol_b = by_name.get("43") or mols[1]
    cores = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)
    assert len(cores) >= 1
    core = cores[0]
    # large common core expected for a congeneric pair
    assert len(core) > 20
    # all pairs within the coarse chain cutoff
    d = np.linalg.norm(mol_a.get_conf()[core[:, 0]] - mol_b.get_conf()[core[:, 1]], axis=1)
    assert np.all(d < 0.25)
    # uniqueness
    assert len(set(core[:, 0].tolist())) == len(core)
    assert len(set(core[:, 1].tolist())) == len(core)


@pytest.mark.skipif(not HIF2A_SDF.exists(), reason="reference benchmark data absent")
def test_hif2a_core_connected():
    import networkx as nx

    mols = read_sdf(HIF2A_SDF)
    mol_a, mol_b = mols[0], mols[1]
    core = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)[0]
    # max_connected_components=1: mapped subgraph of A is connected
    g = mol_a.to_nx().subgraph(core[:, 0].tolist())
    assert nx.number_connected_components(g) == 1
