"""SingleTopology: end states, intermediate interpolation, vacuum energies
(mirrors reference tests/test_single_topology.py at small scale)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.chem import read_sdf
from timemachine_tpu.constants import DEFAULT_ATOM_MAPPING_KWARGS
from timemachine_tpu.fe.atom_mapping import get_cores
from timemachine_tpu.fe.single_topology import AtomMapFlags, SingleTopology
from timemachine_tpu.ff import Forcefield

HIF2A_SDF = Path("/root/reference/timemachine/testsystems/fep_benchmark/hif2a/ligands.sdf")

pytestmark = pytest.mark.skipif(not HIF2A_SDF.exists(), reason="reference benchmark data absent")


@pytest.fixture(scope="module")
def hif2a_pair():
    mols = read_sdf(HIF2A_SDF)
    by_name = {m.name: m for m in mols}
    mol_a = by_name["338"]
    mol_b = by_name["43"]
    core = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)[0]
    return mol_a, mol_b, core


@pytest.fixture(scope="module")
def st(hif2a_pair):
    import warnings

    mol_a, mol_b, core = hif2a_pair
    ff = Forcefield.load_default()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return SingleTopology(mol_a, mol_b, core, ff)


def test_atom_map_bookkeeping(st, hif2a_pair):
    mol_a, mol_b, core = hif2a_pair
    assert st.get_num_atoms() == mol_a.num_atoms + mol_b.num_atoms - len(core)
    # a_to_c identity
    np.testing.assert_array_equal(st.a_to_c, np.arange(mol_a.num_atoms))
    # flags consistent
    assert len(st.get_core_atoms()) == len(core)
    assert len(st.get_dummy_atoms_a()) == mol_a.num_atoms - len(core)
    assert len(st.get_dummy_atoms_b()) == mol_b.num_atoms - len(core)


def test_combine_confs(st, hif2a_pair):
    mol_a, mol_b, _ = hif2a_pair
    x_a, x_b = mol_a.get_conf(), mol_b.get_conf()
    x0 = st.combine_confs(x_a, x_b, lamb=0.0)
    x1 = st.combine_confs(x_a, x_b, lamb=1.0)
    assert x0.shape == (st.get_num_atoms(), 3)
    # at λ=0, core positions from mol_a; at λ=1, from mol_b
    np.testing.assert_array_equal(x0[st.a_to_c], x_a)
    np.testing.assert_array_equal(x1[st.b_to_c], x_b)


def test_end_states_match_systems(st):
    """At λ=0 the interpolated system reproduces src end-state energies."""
    x_a = st.mol_a.get_conf()
    x_b = st.mol_b.get_conf()
    x0 = st.combine_confs(x_a, x_b, lamb=0.0)

    src = st.src_system
    state0 = st.setup_intermediate_state(0.0)

    u_src = sum(float(bp(jnp.asarray(x0), None)) for bp in src.get_U_fns())
    u_state0 = sum(float(bp(jnp.asarray(x0), None)) for bp in state0.get_U_fns())
    np.testing.assert_allclose(u_state0, u_src, rtol=1e-8)

    x1 = st.combine_confs(x_a, x_b, lamb=1.0)
    dst = st.dst_system
    state1 = st.setup_intermediate_state(1.0)
    u_dst = sum(float(bp(jnp.asarray(x1), None)) for bp in dst.get_U_fns())
    u_state1 = sum(float(bp(jnp.asarray(x1), None)) for bp in state1.get_U_fns())
    np.testing.assert_allclose(u_state1, u_dst, rtol=1e-8)


def test_intermediate_states_finite(st):
    x = st.combine_confs(st.mol_a.get_conf(), st.mol_b.get_conf(), lamb=0.5)
    for lamb in [0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0]:
        system = st.setup_intermediate_state(lamb)
        u = sum(float(bp(jnp.asarray(x), None)) for bp in system.get_U_fns())
        assert np.isfinite(u), f"non-finite energy at lambda={lamb}"


def test_interpolation_continuity(st):
    """Parameters are continuous in λ (no jumps bigger than the local slope
    suggests)."""
    lambdas = np.linspace(0, 1, 21)
    bond_params = np.array([np.asarray(st.aligned_bond.interpolate_params(l)) for l in lambdas])
    diffs = np.abs(np.diff(bond_params, axis=0)).max()
    # bounded change per 0.05 λ step
    assert np.isfinite(diffs)
    # end states exact
    np.testing.assert_allclose(bond_params[0], np.asarray(st.aligned_bond.src_params), rtol=1e-10)
    np.testing.assert_allclose(bond_params[-1], np.asarray(st.aligned_bond.dst_params), rtol=1e-10)


def test_combine_masses(st):
    masses = st.combine_masses()
    assert len(masses) == st.get_num_atoms()
    assert all(m > 0 for m in masses)
    masses_hmr = st.combine_masses(use_hmr=True)
    assert len(masses_hmr) == st.get_num_atoms()
    # HMR must conserve each molecule's total mass (per-mol invariant)
    from timemachine_tpu.fe.model_utils import apply_hmr

    m_a = st.mol_a.masses
    hmr_a = apply_hmr(m_a, st.mol_a.bond_list())
    np.testing.assert_allclose(hmr_a.sum(), m_a.sum(), rtol=1e-12)
    # hydrogens got heavier
    h_idx = np.flatnonzero(st.mol_a.atomic_nums == 1)
    assert np.all(hmr_a[h_idx] > m_a[h_idx])


def test_vmapped_lambda_ladder(st):
    """TPU contract: interpolate_params is vmappable over λ — one traced
    program for the whole ladder."""
    lambdas = jnp.linspace(0, 1, 8)
    batched = jax.vmap(st.aligned_nonbonded_pair_list.interpolate_params)(lambdas)
    assert batched.shape == (8, len(st.aligned_nonbonded_pair_list.idxs), 4)
    assert bool(jnp.all(jnp.isfinite(batched)))
