"""Native cheminformatics layer: SMILES, SDF, rings, aromaticity, SMARTS."""

import numpy as np
import pytest

from timemachine_tpu.chem import Mol, match_smarts, mol_from_smiles, read_sdf_string, write_sdf
from timemachine_tpu.chem.sdf import mol_to_molblock, read_sdf


def test_smiles_basic():
    m = mol_from_smiles("CCO")
    assert m.num_atoms == 3
    assert list(m.atomic_nums) == [6, 6, 8]
    assert m.atoms[0].implicit_h == 3
    assert m.atoms[1].implicit_h == 2
    assert m.atoms[2].implicit_h == 1
    mh = mol_from_smiles("CCO", add_hs=True)
    assert mh.num_atoms == 9


def test_smiles_charges_and_brackets():
    m = mol_from_smiles("[NH4+]")
    assert m.atoms[0].formal_charge == 1
    assert m.atoms[0].implicit_h == 4
    m2 = mol_from_smiles("CC(=O)[O-]")
    assert m2.total_charge() == -1


def test_smiles_rings_and_kekulization():
    benzene = mol_from_smiles("c1ccccc1")
    assert benzene.num_bonds == 6
    orders = sorted(b.order for b in benzene.bonds)
    assert orders == [1, 1, 1, 2, 2, 2]
    for a in benzene.atoms:
        assert a.implicit_h == 1

    pyridine = mol_from_smiles("c1ccncc1")
    n_idx = [i for i, a in enumerate(pyridine.atoms) if a.atomic_num == 7][0]
    assert pyridine.atoms[n_idx].implicit_h == 0

    pyrrole = mol_from_smiles("c1cc[nH]c1")
    n_idx = [i for i, a in enumerate(pyrrole.atoms) if a.atomic_num == 7][0]
    assert pyrrole.atoms[n_idx].implicit_h == 1
    # pyrrole N has no double bond after kekulization
    n_orders = [b.order for b in pyrrole.bonds if n_idx in (b.src, b.dst)]
    assert all(o == 1 for o in n_orders)


def test_ring_perception():
    naphthalene = mol_from_smiles("c1ccc2ccccc2c1")
    rings = naphthalene.ring_info()
    assert len(rings) == 2
    assert all(len(r) == 6 for r in rings)
    # fusion atoms are in two rings
    fused = [i for i in range(10) if len([r for r in rings if i in r]) == 2]
    assert len(fused) == 2

    cyclopropane = mol_from_smiles("C1CC1")
    assert cyclopropane.atom_ring_sizes(0) == {3}


def test_mdl_aromaticity():
    benzene = mol_from_smiles("c1ccccc1")
    assert benzene.aromatic_atoms("mdl") == set(range(6))
    pyridine = mol_from_smiles("c1ccncc1")
    assert len(pyridine.aromatic_atoms("mdl")) == 6
    # 5-membered heteroaromatics are NOT aromatic under MDL
    pyrrole = mol_from_smiles("c1cc[nH]c1")
    assert pyrrole.aromatic_atoms("mdl") == set()
    furan = mol_from_smiles("c1ccoc1")
    assert furan.aromatic_atoms("mdl") == set()
    # cyclohexane not aromatic, cyclohexadiene not aromatic
    assert mol_from_smiles("C1CCCCC1").aromatic_atoms("mdl") == set()
    assert mol_from_smiles("C1=CCC=CC1").aromatic_atoms("mdl") == set()
    # naphthalene fully aromatic
    naph = mol_from_smiles("c1ccc2ccccc2c1")
    assert naph.aromatic_atoms("mdl") == set(range(10))
    # pyridone ring is not MDL-aromatic (exocyclic C=O)
    pyridone = mol_from_smiles("O=c1cccc[nH]1")
    assert len(pyridone.aromatic_atoms("mdl")) == 0


def test_am1bcc_aromaticity():
    benzene = mol_from_smiles("c1ccccc1")
    assert benzene.aromatic_atoms("am1bcc") == set(range(6))
    # 5-membered heteroaromatics ARE aromatic under AM1BCC (case 5)
    pyrrole = mol_from_smiles("c1cc[nH]c1")
    assert len(pyrrole.aromatic_atoms("am1bcc")) == 5
    furan = mol_from_smiles("c1ccoc1")
    assert len(furan.aromatic_atoms("am1bcc")) == 5
    thiophene = mol_from_smiles("c1ccsc1")
    assert len(thiophene.aromatic_atoms("am1bcc")) == 5
    imidazole = mol_from_smiles("c1c[nH]cn1")
    assert len(imidazole.aromatic_atoms("am1bcc")) == 5
    assert mol_from_smiles("C1CCCCC1").aromatic_atoms("am1bcc") == set()


def test_smarts_atom_primitives():
    m = mol_from_smiles("CC(=O)[O-]", add_hs=True)
    # atomic number
    assert len(match_smarts(m, "[#6]")) == 2
    assert len(match_smarts(m, "[#8]")) == 2
    # charge
    assert len(match_smarts(m, "[#8-1]")) == 1
    assert len(match_smarts(m, "[#8+0]")) == 1
    # connectivity: carbonyl C is X3
    assert len(match_smarts(m, "[#6X3]")) == 1
    assert len(match_smarts(m, "[#6X4]")) == 1
    # H count
    assert len(match_smarts(m, "[#6H3]")) == 1
    # negation and OR
    assert len(match_smarts(m, "[!#1]")) == 4
    assert len(match_smarts(m, "[#6,#8]")) == 4


def test_smarts_bonds_and_maps():
    m = mol_from_smiles("CC=CC#N")
    assert len(match_smarts(m, "[#6]=[#6]")) == 2  # both directions
    assert len(match_smarts(m, "[#6]#[#7]")) == 1
    assert len(match_smarts(m, "[#6]~[#6]")) == 6
    matches = match_smarts(m, "[#6:1]=[#6:2]")
    assert all(len(t) == 2 for t in matches)
    # map ordering honored
    matches4 = match_smarts(m, "[#6:2]=[#6:1]")
    assert sorted(matches) == sorted((b, a) for a, b in matches4)


def test_smarts_aromatic_and_ring():
    toluene = mol_from_smiles("Cc1ccccc1", add_hs=True)
    assert len(match_smarts(toluene, "[a]")) == 6
    assert len(match_smarts(toluene, "[#6a]")) == 6
    assert len(match_smarts(toluene, "[A;!#1]")) == 1
    assert len(match_smarts(toluene, "[ar6]")) == 6
    assert len(match_smarts(toluene, "[r6]")) == 6
    # aromatic bond primitive
    assert len(match_smarts(toluene, "[#6]:[#6]")) == 12
    # ring bond primitive
    cyclopropane = mol_from_smiles("C1CC1C")
    assert len(match_smarts(cyclopropane, "[#6]-@[#6]")) == 6
    assert len(match_smarts(cyclopropane, "[#6]-!@[#6]")) == 2


def test_smarts_recursive():
    m = mol_from_smiles("CC(=O)OC")  # methyl acetate
    # carbon double-bonded to oxygen
    matches = match_smarts(m, "[#6$(*=[#8])]")
    assert len(matches) == 1
    # ester O: O single-bonded to C=O carbon
    matches = match_smarts(m, "[#8X2$(*-[#6]=[#8])]")
    assert len(matches) == 1


def test_smarts_branch_and_torsion_shape():
    butane = mol_from_smiles("CCCC")
    t = match_smarts(butane, "[#6:1]~[#6:2]~[#6:3]~[#6:4]")
    assert len(t) == 2  # 0123 and 3210
    improper = match_smarts(mol_from_smiles("CC(=O)N"), "[*:1]~[#6X3:2](~[*:3])~[*:4]")
    assert len(improper) == 6  # 3 substituents in 3! orderings around center


def test_sdf_roundtrip():
    m = mol_from_smiles("c1ccccc1", add_hs=True, name="benzene")
    rng = np.random.default_rng(0)
    m.coords = rng.normal(0, 2, (m.num_atoms, 3))
    m.props["dG"] = "-3.2"
    text = mol_to_molblock(m)
    import io

    buf = io.StringIO()
    write_sdf([m], buf)
    mols = read_sdf_string(buf.getvalue())
    assert len(mols) == 1
    m2 = mols[0]
    assert m2.name == "benzene"
    assert m2.num_atoms == m.num_atoms
    assert m2.num_bonds == m.num_bonds
    assert m2.props["dG"] == "-3.2"
    np.testing.assert_allclose(m2.coords, m.coords, atol=1e-4)


@pytest.mark.skipif(not __import__("pathlib").Path("/root/reference").exists(), reason="reference data absent")
def test_read_reference_ligands():
    """Parse the reference's FEP benchmark ligand SDF (data only, not code)."""
    mols = read_sdf("/root/reference/timemachine/testsystems/data/ligands_40.sdf")
    assert len(mols) == 40
    for m in mols:
        assert m.num_atoms > 10
        assert np.all(np.abs(m.coords) < 100)
        # all-explicit-H ligands: H present
        assert (m.atomic_nums == 1).sum() > 0
