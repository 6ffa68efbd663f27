"""Coverage for small fe/ modules: SMARTS-core restraint mapping
(fe/restraints.py; ref tests/test_free_energy_restraints.py) and
local-geometry classification (fe/geometry.py; ref tests/test_geometry.py)."""

import numpy as np
import pytest

from timemachine_tpu.chem import mol_from_smiles
from timemachine_tpu.chem.embed import embed_mol
from timemachine_tpu.fe.geometry import LocalGeometry, assign_atom_geometry
from timemachine_tpu.fe.restraints import setup_relative_restraints_using_smarts


def _embedded(smiles, seed=7):
    mol = mol_from_smiles(smiles, add_hs=True)
    embed_mol(mol, seed=seed)
    return mol


def test_restraint_core_from_smarts_benzene_pair():
    mol_a = _embedded("c1ccccc1CC")  # ethylbenzene
    mol_b = _embedded("c1ccccc1CO")  # benzyl alcohol
    core = setup_relative_restraints_using_smarts(mol_a, mol_b, "c1ccccc1")
    assert core.shape == (6, 2)
    # every mapped atom is an aromatic carbon of its molecule
    arom_a, arom_b = mol_a.aromatic_atoms(), mol_b.aromatic_atoms()
    assert all(int(i) in arom_a for i in core[:, 0])
    assert all(int(j) in arom_b for j in core[:, 1])
    # the winning labeling pair has low assigned-coordinate RMSD for
    # identically-embedded rings
    xa, xb = mol_a.get_conf()[core[:, 0]], mol_b.get_conf()[core[:, 1]]
    assert np.linalg.norm(xa.mean(0) - xb.mean(0)) < 2.0


def test_restraint_core_rejects_disconnected_smarts():
    mol = _embedded("c1ccccc1CC")
    with pytest.raises(AssertionError):
        setup_relative_restraints_using_smarts(mol, mol, "[#6].[#6]")


@pytest.mark.parametrize(
    "smiles,atom_symbol,expected",
    [
        ("CC#N", "N", LocalGeometry.G1_TERMINAL),  # nitrile N: one neighbor
        ("C=O", "O", LocalGeometry.G1_TERMINAL),  # carbonyl O
        ("COC", "O", LocalGeometry.G2_KINK),  # ether O: sp3, 2 neighbors
        ("CC#CC", "C", None),  # checked separately below
    ],
)
def test_assign_atom_geometry_simple(smiles, atom_symbol, expected):
    mol = mol_from_smiles(smiles, add_hs=True)
    if expected is None:
        return
    idx = next(i for i, a in enumerate(mol.atoms) if a.symbol == atom_symbol)
    assert assign_atom_geometry(mol, idx) == expected


def test_assign_atom_geometry_hybridization_classes():
    # internal alkyne carbon: sp, 2 neighbors -> linear
    mol = mol_from_smiles("CC#CC", add_hs=True)
    sp_carbons = [
        i
        for i, a in enumerate(mol.atoms)
        if a.symbol == "C" and any(b.order == 3 and i in (b.src, b.dst) for b in mol.bonds)
    ]
    for i in sp_carbons:
        assert assign_atom_geometry(mol, i) == LocalGeometry.G2_LINEAR

    # methane-like sp3 carbon with 4 neighbors -> tetrahedral
    mol = mol_from_smiles("CC", add_hs=True)
    assert assign_atom_geometry(mol, 0) == LocalGeometry.G4_TETRAHEDRAL

    # benzene ring carbon: sp2 with 3 neighbors -> planar
    mol = mol_from_smiles("c1ccccc1", add_hs=True)
    assert assign_atom_geometry(mol, 0) == LocalGeometry.G3_PLANAR

    # ammonia-like sp3 N with 3 neighbors -> pyramidal
    mol = mol_from_smiles("CN", add_hs=True)
    n_idx = next(i for i, a in enumerate(mol.atoms) if a.symbol == "N")
    assert assign_atom_geometry(mol, n_idx) == LocalGeometry.G3_PYRAMIDAL
