"""Native Amber-XML protein parameterization (ff/amber_xml.py) — semantics
validated against OpenMM ForceField assignment rules on a hand-built
forcefield + di-glycine structure (N-terminal NGLY + C-terminal CGLY):
template variant selection, name/parent matching, class-tuple bonded
assignment, wildcard-vs-exact proper precedence, improper atom ordering
(central third — the openmm_deserializer splitter convention), and 1-4
exclusion scaling. Parity target: the reference's OpenMM host path
(/root/reference/timemachine/ff/handlers/openmm_deserializer.py:131,
md/builders.py:197)."""

import os
import textwrap

import numpy as np
import pytest

MINI_XML = textwrap.dedent(
    """\
    <ForceField>
     <AtomTypes>
      <Type name="N3" class="N3" element="N" mass="14.01"/>
      <Type name="N" class="N" element="N" mass="14.01"/>
      <Type name="CT" class="CT" element="C" mass="12.01"/>
      <Type name="C" class="C" element="C" mass="12.01"/>
      <Type name="O" class="O" element="O" mass="16.00"/>
      <Type name="O2" class="O2" element="O" mass="16.00"/>
      <Type name="H" class="H" element="H" mass="1.008"/>
      <Type name="HP" class="HP" element="H" mass="1.008"/>
      <Type name="H1" class="H1" element="H" mass="1.008"/>
     </AtomTypes>
     <Residues>
      <Residue name="GLY">
       <Atom name="N" type="N" charge="-0.4157"/>
       <Atom name="H" type="H" charge="0.2719"/>
       <Atom name="CA" type="CT" charge="-0.0252"/>
       <Atom name="HA2" type="H1" charge="0.0698"/>
       <Atom name="HA3" type="H1" charge="0.0698"/>
       <Atom name="C" type="C" charge="0.5973"/>
       <Atom name="O" type="O" charge="-0.5679"/>
       <Bond atomName1="N" atomName2="H"/>
       <Bond atomName1="N" atomName2="CA"/>
       <Bond atomName1="CA" atomName2="HA2"/>
       <Bond atomName1="CA" atomName2="HA3"/>
       <Bond atomName1="CA" atomName2="C"/>
       <Bond atomName1="C" atomName2="O"/>
       <ExternalBond atomName="N"/>
       <ExternalBond atomName="C"/>
      </Residue>
      <Residue name="NGLY">
       <Atom name="N" type="N3" charge="0.2943"/>
       <Atom name="H1" type="HP" charge="0.1642"/>
       <Atom name="H2" type="HP" charge="0.1642"/>
       <Atom name="H3" type="HP" charge="0.1642"/>
       <Atom name="CA" type="CT" charge="-0.0100"/>
       <Atom name="HA2" type="H1" charge="0.0895"/>
       <Atom name="HA3" type="H1" charge="0.0895"/>
       <Atom name="C" type="C" charge="0.6163"/>
       <Atom name="O" type="O" charge="-0.5722"/>
       <Bond atomName1="N" atomName2="H1"/>
       <Bond atomName1="N" atomName2="H2"/>
       <Bond atomName1="N" atomName2="H3"/>
       <Bond atomName1="N" atomName2="CA"/>
       <Bond atomName1="CA" atomName2="HA2"/>
       <Bond atomName1="CA" atomName2="HA3"/>
       <Bond atomName1="CA" atomName2="C"/>
       <Bond atomName1="C" atomName2="O"/>
       <ExternalBond atomName="C"/>
      </Residue>
      <Residue name="CGLY">
       <Atom name="N" type="N" charge="-0.3821"/>
       <Atom name="H" type="H" charge="0.2681"/>
       <Atom name="CA" type="CT" charge="-0.2493"/>
       <Atom name="HA2" type="H1" charge="0.1056"/>
       <Atom name="HA3" type="H1" charge="0.1056"/>
       <Atom name="C" type="C" charge="0.7231"/>
       <Atom name="O" type="O2" charge="-0.7855"/>
       <Atom name="OXT" type="O2" charge="-0.7855"/>
       <Bond atomName1="N" atomName2="H"/>
       <Bond atomName1="N" atomName2="CA"/>
       <Bond atomName1="CA" atomName2="HA2"/>
       <Bond atomName1="CA" atomName2="HA3"/>
       <Bond atomName1="CA" atomName2="C"/>
       <Bond atomName1="C" atomName2="O"/>
       <Bond atomName1="C" atomName2="OXT"/>
       <ExternalBond atomName="N"/>
      </Residue>
     </Residues>
     <HarmonicBondForce>
      <Bond class1="N3" class2="HP" length="0.101" k="363171.2"/>
      <Bond class1="N3" class2="CT" length="0.1471" k="307105.6"/>
      <Bond class1="CT" class2="H1" length="0.109" k="284512.0"/>
      <Bond class1="CT" class2="C" length="0.1522" k="265265.6"/>
      <Bond class1="C" class2="O" length="0.1229" k="476976.0"/>
      <Bond class1="C" class2="N" length="0.1335" k="410032.0"/>
      <Bond class1="N" class2="H" length="0.101" k="363171.2"/>
      <Bond class1="N" class2="CT" length="0.1449" k="282001.6"/>
      <Bond class1="C" class2="O2" length="0.125" k="548940.8"/>
     </HarmonicBondForce>
     <HarmonicAngleForce>
      <Angle class1="HP" class2="N3" class3="HP" angle="1.9111" k="364.845"/>
      <Angle class1="HP" class2="N3" class3="CT" angle="1.9111" k="418.4"/>
      <Angle class1="N3" class2="CT" class3="H1" angle="1.9111" k="418.4"/>
      <Angle class1="N3" class2="CT" class3="C" angle="1.9391" k="669.44"/>
      <Angle class1="H1" class2="CT" class3="H1" angle="1.9111" k="292.88"/>
      <Angle class1="H1" class2="CT" class3="C" angle="1.9111" k="418.4"/>
      <Angle class1="CT" class2="C" class3="O" angle="2.1017" k="669.44"/>
      <Angle class1="CT" class2="C" class3="N" angle="2.0350" k="585.76"/>
      <Angle class1="O" class2="C" class3="N" angle="2.1450" k="669.44"/>
      <Angle class1="C" class2="N" class3="H" angle="2.0944" k="418.4"/>
      <Angle class1="C" class2="N" class3="CT" angle="2.1275" k="418.4"/>
      <Angle class1="H" class2="N" class3="CT" angle="2.0606" k="418.4"/>
      <Angle class1="N" class2="CT" class3="H1" angle="1.9111" k="418.4"/>
      <Angle class1="N" class2="CT" class3="C" angle="1.9391" k="669.44"/>
      <Angle class1="CT" class2="C" class3="O2" angle="2.0420" k="585.76"/>
      <Angle class1="O2" class2="C" class3="O2" angle="2.2689" k="669.44"/>
     </HarmonicAngleForce>
     <PeriodicTorsionForce>
      <Proper class1="O" class2="C" class3="N" class4="H" periodicity1="2" phase1="3.141592653589793" k1="10.46"/>
      <Proper class1="" class2="C" class3="N" class4="" periodicity1="2" phase1="3.141592653589793" k1="5.0"/>
      <Proper class1="" class2="" class3="" class4="" periodicity1="3" phase1="0.0" k1="0.5"/>
      <Improper class1="C" class2="CT" class3="N" class4="O" periodicity1="2" phase1="3.141592653589793" k1="43.932"/>
      <Improper class1="C" class2="CT" class3="O2" class4="O2" periodicity1="2" phase1="3.141592653589793" k1="43.932"/>
     </PeriodicTorsionForce>
     <NonbondedForce coulomb14scale="0.8333333333333334" lj14scale="0.5">
      <UseAttributeFromResidue name="charge"/>
      <Atom type="N3" sigma="0.325" epsilon="0.7113"/>
      <Atom type="N" sigma="0.325" epsilon="0.7113"/>
      <Atom type="CT" sigma="0.3399" epsilon="0.4577"/>
      <Atom type="C" sigma="0.3399" epsilon="0.3598"/>
      <Atom type="O" sigma="0.2959" epsilon="0.8786"/>
      <Atom type="O2" sigma="0.2959" epsilon="0.8786"/>
      <Atom type="H" sigma="0.1069" epsilon="0.0657"/>
      <Atom type="HP" sigma="0.1100" epsilon="0.0657"/>
      <Atom type="H1" sigma="0.2471" epsilon="0.0657"/>
     </NonbondedForce>
    </ForceField>
    """
)


def _pdb_line(serial, name, resname, chain, resseq, x, y, z, element):
    return (
        f"ATOM  {serial:5d} {name:<4s} {resname:<3s} {chain}{resseq:4d}    "
        f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          {element:>2s}"
    )


def digly_pdb() -> str:
    # coordinates only need to satisfy the perceiver's thresholds
    # (H within 1.2 A of its parent heavy atom, peptide C-N < 1.8 A)
    atoms = [
        # res 1: GLY (N-terminal: 3 H on N)
        ("N", "GLY", 1, (0.0, 0.0, 0.0), "N"),
        ("H1", "GLY", 1, (-0.5, 0.8, 0.0), "H"),
        ("H2", "GLY", 1, (-0.5, -0.8, 0.0), "H"),
        ("H3", "GLY", 1, (-0.9, 0.0, 0.3), "H"),
        ("CA", "GLY", 1, (1.45, 0.0, 0.0), "C"),
        ("HA2", "GLY", 1, (1.75, 0.9, 0.4), "H"),
        ("HA3", "GLY", 1, (1.75, -0.9, 0.4), "H"),
        ("C", "GLY", 1, (2.0, 0.0, -1.2), "C"),
        ("O", "GLY", 1, (3.2, 0.0, -1.3), "O"),
        # res 2: GLY (C-terminal: OXT, carboxylate)
        ("N", "GLY", 2, (1.6, 0.2, -2.4), "N"),
        ("H", "GLY", 2, (0.7, 0.3, -2.5), "H"),
        ("CA", "GLY", 2, (2.4, 0.4, -3.6), "C"),
        ("HA2", "GLY", 2, (3.1, 1.2, -3.4), "H"),
        ("HA3", "GLY", 2, (2.9, -0.5, -4.0), "H"),
        ("C", "GLY", 2, (1.4, 0.6, -4.7), "C"),
        ("O", "GLY", 2, (0.2, 0.5, -4.5), "O"),
        ("OXT", "GLY", 2, (1.8, 0.9, -5.9), "O"),
    ]
    lines = [
        _pdb_line(i + 1, nm, rn, "A", rs, *xyz, el)
        for i, (nm, rn, rs, xyz, el) in enumerate(atoms)
    ]
    return "\n".join(lines) + "\nEND\n"


@pytest.fixture(scope="module")
def assigned(tmp_path_factory):
    from timemachine_tpu.chem.pdb import parse_pdb, protein_mol_from_pdb
    from timemachine_tpu.ff.amber_xml import AmberForceField, assign_protein_parameters

    d = tmp_path_factory.mktemp("amberxml")
    xml_path = d / "mini.xml"
    xml_path.write_text(MINI_XML)
    structure = parse_pdb(digly_pdb())
    protein = protein_mol_from_pdb(structure)
    ff = AmberForceField.parse(str(xml_path))
    return structure, protein, ff, assign_protein_parameters(structure, protein, ff), str(xml_path)


def test_template_variant_selection(assigned):
    _, _, _, ap, _ = assigned
    # N-terminal residue must have taken the NGLY template (N3, HP types)
    assert ap.atom_types[0] == "N3"
    assert ap.atom_types[1] == ap.atom_types[2] == ap.atom_types[3] == "HP"
    # C-terminal residue: CGLY (O2 carboxylate oxygens)
    assert ap.atom_types[15] == "O2" and ap.atom_types[16] == "O2"
    # amide N of residue 2 is type N
    assert ap.atom_types[9] == "N"


def test_charges_and_masses(assigned):
    _, _, _, ap, _ = assigned
    np.testing.assert_allclose(ap.charges[0], 0.2943)
    np.testing.assert_allclose(ap.charges[8], -0.5722)  # res1 O
    np.testing.assert_allclose(ap.charges[15], -0.7855)  # res2 O
    np.testing.assert_allclose(ap.charges.sum(), 1.0 + (-1.0) + 0.0051 - 0.0051, atol=1e-9)
    assert ap.masses[0] == 14.01 and ap.masses[1] == 1.008


def test_bonds(assigned):
    _, protein, ff, ap, _ = assigned
    assert ap.bond_idxs.shape[0] == len(protein.bonds)
    # the peptide bond (C=7, N=9) gets (C, N) class params
    row = np.where((ap.bond_idxs == [7, 9]).all(axis=1))[0]
    assert len(row) == 1
    np.testing.assert_allclose(ap.bond_params[row[0]], [410032.0, 0.1335])


def test_angles_complete(assigned):
    _, protein, _, ap, _ = assigned
    # every i-j-k path must carry params: count paths from the graph
    nbrs = {}
    for b in protein.bonds:
        nbrs.setdefault(b.src, []).append(b.dst)
        nbrs.setdefault(b.dst, []).append(b.src)
    n_paths = sum(len(v) * (len(v) - 1) // 2 for v in nbrs.values())
    assert ap.angle_idxs.shape[0] == n_paths


def test_proper_exact_beats_wildcard(assigned):
    _, _, _, ap, _ = assigned
    # torsion O(8)-C(7)-N(9)-H(10): exact entry k=10.46 (not the C-N wildcard 5.0)
    for row, p in zip(ap.proper_idxs, ap.proper_params):
        t = tuple(row)
        if t in ((8, 7, 9, 10), (10, 9, 7, 8)):
            np.testing.assert_allclose(p[0], 10.46)
            break
    else:
        raise AssertionError("O-C-N-H torsion not found")
    # some other torsion around C-N uses the single-wildcard entry (k=5.0),
    # e.g. CA(4)-C(7)-N(9)-CA(11)
    ks = {
        tuple(row): p[0]
        for row, p in zip(ap.proper_idxs, ap.proper_params)
    }
    assert ks.get((4, 7, 9, 11), ks.get((11, 9, 7, 4))) == 5.0


def test_improper_ordering_and_split(assigned):
    _, protein, _, ap, _ = assigned
    assert ap.improper_idxs.shape[0] == 2
    bond_set = {(min(b.src, b.dst), max(b.src, b.dst)) for b in protein.bonds}
    for row in ap.improper_idxs:
        i, j, k, l = map(int, row)
        # central atom third: (j,k) and (k,l) bonded, (i,j) NOT — exactly one
        # internal angle, so the deserializer-style splitter calls it improper
        assert (min(j, k), max(j, k)) in bond_set
        assert (min(k, l), max(k, l)) in bond_set
        assert (min(i, j), max(i, j)) not in bond_set
    # res1 carbonyl improper central C=7; res2 central C=14
    assert {int(r[2]) for r in ap.improper_idxs} == {7, 14}


def test_exclusion_scales(assigned):
    _, _, ff, ap, _ = assigned
    scales = {tuple(i): tuple(s) for i, s in zip(ap.exclusion_idxs, ap.exclusion_scales)}
    assert scales[(0, 4)] == (1.0, 1.0)  # 1-2 N-CA
    assert scales[(0, 7)] == (1.0, 1.0)  # 1-3 N...C
    q14, lj14 = scales[(0, 8)]  # 1-4 N...O
    np.testing.assert_allclose(q14, 1.0 - 0.8333333333333334)
    np.testing.assert_allclose(lj14, 0.5)


def test_full_builder_pipeline(assigned, tmp_path, monkeypatch):
    _, _, _, _, xml_path = assigned
    from timemachine_tpu.md.builders import build_protein_system

    pdb_path = tmp_path / "digly.pdb"
    pdb_path.write_text(digly_pdb())
    monkeypatch.setenv("TM_AMBER_XML", xml_path)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no SMIRNOFF-fallback warning allowed
        cfg = build_protein_system(str(pdb_path), "amber99sbildn", "tip3p")
    n_p = 17
    assert cfg.conf.shape[0] == n_p + cfg.num_water_atoms
    # masses came from the XML type table
    np.testing.assert_allclose(cfg.masses[0], 14.01)
    # energies finite through the host system
    import jax.numpy as jnp

    u = sum(bp(jnp.asarray(cfg.conf), jnp.asarray(cfg.box)) for bp in cfg.host_system.get_U_fns())
    assert np.isfinite(float(u))
