"""End-to-end slice 1: native water box -> FIRE minimize -> NPT equilibrate,
with and without a ligand (mirrors reference tests/test_minimizer.py and
tests/test_builders.py at small scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.chem import mol_from_smiles
from timemachine_tpu.ff import Forcefield
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.barostat import MonteCarloBarostat
from timemachine_tpu.md.builders import build_water_system
from timemachine_tpu.md.context import Context
from timemachine_tpu.md.fire import FireMinimizationConfig
from timemachine_tpu.md.minimizer import check_force_norm, fire_minimize, pre_equilibrate_host
from timemachine_tpu.md.utils import compute_box_volume, get_bond_list, get_group_indices, sample_velocities
from timemachine_tpu.potentials import HarmonicBond, get_bound_potential_by_type


@pytest.fixture(scope="module")
def ff():
    return Forcefield.load_default()


def _embed_ligand(smiles, seed=3):
    """Native embedding + forcefield relaxation for test ligands."""
    import warnings

    from timemachine_tpu.chem.embed import embed_mol
    from timemachine_tpu.fe.model_utils import get_vacuum_val_and_grad_fn
    from timemachine_tpu.md.fire import ScipyMinimizationConfig
    from timemachine_tpu.md.minimizer import local_minimize

    mol = mol_from_smiles(smiles, add_hs=True, name="lig")
    embed_mol(mol, seed=seed)
    ff = Forcefield.load_default()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vag = get_vacuum_val_and_grad_fn(mol, ff)

    def vag_np(xx):
        u, g = vag(jnp.asarray(xx))
        return float(u), np.asarray(g)

    x = local_minimize(
        mol.get_conf(), None, vag_np, np.arange(mol.num_atoms), ScipyMinimizationConfig("BFGS"),
        verbose=False, assert_energy_decreased=False,
    )
    mol.set_conf(np.asarray(x))
    return mol


def test_build_water_system():
    host_config = build_water_system(2.5)
    n_waters = host_config.num_water_atoms // 3
    # density within 5% of bulk
    assert abs(n_waters / 2.5**3 - 33.3) / 33.3 < 0.05
    assert host_config.conf.shape == (host_config.num_water_atoms, 3)
    assert len(host_config.masses) == host_config.num_water_atoms
    # OH geometry
    d = np.linalg.norm(host_config.conf[0] - host_config.conf[1])
    np.testing.assert_allclose(d, 0.09572, rtol=1e-5)


def test_build_water_system_with_ligand_deletes_clashes(ff):
    mol = _embed_ligand("c1ccccc1")
    no_lig = build_water_system(2.5)
    with_lig = build_water_system(2.5, mols=[mol])
    assert with_lig.num_water_atoms < no_lig.num_water_atoms
    # no water atom within 0.21 of ligand
    d = np.linalg.norm(with_lig.conf[:, None, :] - mol.get_conf()[None, :, :], axis=-1)
    assert d.min() >= 0.21


def test_water_box_fire_minimize_and_npt(ff):
    """Water box energy decreases under FIRE; NPT holds the box together."""
    host_config = build_water_system(2.5)
    system = host_config.host_system
    bps = system.get_U_fns()
    box = jnp.asarray(host_config.box)

    u_fn = jax.jit(lambda x: sum(bp(x, box) for bp in bps))
    du_dx = jax.jit(jax.grad(u_fn))

    x0 = jnp.asarray(host_config.conf)
    u0 = float(u_fn(x0))
    x_min = fire_minimize(x0, lambda x: np.asarray(du_dx(jnp.asarray(x))), FireMinimizationConfig(200))
    u_min = float(u_fn(jnp.asarray(x_min)))
    assert u_min < u0
    check_force_norm(-np.asarray(du_dx(jnp.asarray(x_min))))

    # short NPT
    masses = host_config.masses
    intg = LangevinIntegrator(300.0, 1e-3, 1.0, masses, 2024)
    bond_pot = get_bound_potential_by_type(bps, HarmonicBond).potential
    groups = get_group_indices(get_bond_list(bond_pot), len(masses))
    baro = MonteCarloBarostat(len(masses), 1.013, 300.0, groups, 15, 2025)
    v0 = sample_velocities(masses, 300.0, 2026)
    ctxt = Context(x_min, v0, host_config.box, intg, bps, movers=[baro])
    ctxt.multiple_steps(300)
    assert np.all(np.isfinite(ctxt.get_x_t()))
    vol = compute_box_volume(ctxt.get_box())
    assert 0.7 * 2.5**3 < vol < 1.3 * 2.5**3


@pytest.mark.nightly
def test_pre_equilibrate_host_with_ligand(ff):
    mol = _embed_ligand("CCO")
    host_config = build_water_system(2.5, mols=[mol])
    x_host, box = pre_equilibrate_host(
        [mol],
        host_config,
        ff,
        minimizer_steps_per_window=100,
        minimizer_windows=2,
        equilibration_steps=200,
    )
    assert x_host.shape == host_config.conf.shape
    assert np.all(np.isfinite(x_host))
    assert box.shape == (3, 3)
