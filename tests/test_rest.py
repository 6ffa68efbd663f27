"""REST2 single topology: interpolation functions, region selection, energy
scaling invariants (mirrors reference tests/test_rest.py strategy)."""

from pathlib import Path

import numpy as np
import pytest

from timemachine_tpu.fe.rest.interpolation import Exponential, Linear, Quadratic, Symmetric, get_interpolation_fxn

HIF2A_SDF = Path("/root/reference/timemachine/testsystems/data/ligands_40.sdf")


def test_interpolation_endpoints():
    for name in ("linear", "quadratic", "exponential"):
        f = get_interpolation_fxn(name, 1.0, 3.0)
        assert float(f(0.0)) == pytest.approx(1.0)
        assert float(f(1.0)) == pytest.approx(3.0)


def test_symmetric_interpolation():
    f = Symmetric(Exponential(1.0, 3.0))
    assert float(f(0.0)) == pytest.approx(1.0)
    assert float(f(1.0)) == pytest.approx(1.0)
    assert float(f(0.5)) == pytest.approx(3.0)
    xs = np.linspace(0, 1, 21)
    np.testing.assert_allclose(f(xs), f(1 - xs), rtol=1e-12)


def test_interpolation_monotone_on_half():
    for cls in (Linear, Quadratic, Exponential):
        f = cls(1.0, 3.0)
        ys = f(np.linspace(0, 1, 11))
        assert np.all(np.diff(ys) > 0)


def test_canonical_bonds():
    from timemachine_tpu.fe.rest.bond import mkbond, mkproper

    assert mkbond(3, 1) == mkbond(1, 3)
    assert mkbond(1, 3).idxs == (1, 3)
    assert mkproper(5, 4, 3, 2).idxs == (2, 3, 4, 5)
    b = mkbond(0, 2).translate([10, 11, 12])
    assert b.idxs == (10, 12)


def test_queries_on_small_mols():
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.fe.rest.queries import get_aliphatic_ring_bonds, get_rotatable_bonds

    cyclohexane = mol_from_smiles("C1CCCCC1")
    assert len(get_aliphatic_ring_bonds(cyclohexane)) == 6
    benzene = mol_from_smiles("c1ccccc1")
    assert len(get_aliphatic_ring_bonds(benzene)) == 0
    butane = mol_from_smiles("CCCC")
    assert len(get_rotatable_bonds(butane)) == 1  # the central C-C


@pytest.mark.skipif(not HIF2A_SDF.exists(), reason="reference benchmark data absent")
class TestSingleTopologyREST:
    @pytest.fixture(scope="class")
    def st_pair(self):
        import warnings

        from timemachine_tpu.fe.rest.single_topology import SingleTopologyREST
        from timemachine_tpu.fe.single_topology import SingleTopology
        from timemachine_tpu.ff import Forcefield
        from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

        mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
        ff = Forcefield.load_default()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            st_rest = SingleTopologyREST(mol_a, mol_b, core, ff, max_temperature_scale=3.0)
            st_plain = SingleTopology(mol_a, mol_b, core, ff)
        return st_rest, st_plain

    def test_endstates_unscaled(self, st_pair):
        st_rest, st_plain = st_pair
        for lamb in (0.0, 1.0):
            s_rest = st_rest.setup_intermediate_state(lamb)
            s_ref = st_plain.setup_intermediate_state(lamb)
            np.testing.assert_allclose(np.asarray(s_rest.proper.params), np.asarray(s_ref.proper.params))
            np.testing.assert_allclose(
                np.asarray(s_rest.nonbonded_pair_list.params), np.asarray(s_ref.nonbonded_pair_list.params)
            )

    def test_midpoint_scaling(self, st_pair):
        st_rest, st_plain = st_pair
        s_mid_rest = st_rest.setup_intermediate_state(0.5)
        s_mid_ref = st_plain.setup_intermediate_state(0.5)
        tp = st_rest.target_proper_idxs
        assert len(tp) > 0
        np.testing.assert_allclose(
            np.asarray(s_mid_rest.proper.params)[tp, 0],
            np.asarray(s_mid_ref.proper.params)[tp, 0] / 3.0,
            rtol=1e-10,
        )
        # untargeted propers untouched
        other = [i for i in range(len(st_rest.propers)) if i not in set(tp)]
        np.testing.assert_allclose(
            np.asarray(s_mid_rest.proper.params)[other], np.asarray(s_mid_ref.proper.params)[other]
        )

    def test_rest_region_includes_dummies(self, st_pair):
        st_rest, _ = st_pair
        region = st_rest.rest_region_atom_idxs
        assert st_rest.get_dummy_atoms_a() <= region
        assert st_rest.get_dummy_atoms_b() <= region
