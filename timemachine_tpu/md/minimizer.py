"""Minimization / pre-equilibration stack.

Parity target: reference timemachine/md/minimizer.py — FIRE minimization
(here one jitted XLA loop), λ-window host insertion (fire_minimize_host),
host pre-equilibration with frozen ligand + barostat (pre_equilibrate_host),
Barker-proposal equilibration, and subset minimization (local_minimize) via
FIRE or scipy with optional positional restraints.
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from timemachine_tpu.constants import BOLTZ, DEFAULT_PRESSURE, DEFAULT_TEMP, MAX_FORCE_NORM
from timemachine_tpu.fe import topology
from timemachine_tpu.fe.utils import get_romol_conf
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.barker import barker_chain
from timemachine_tpu.md.barostat import MonteCarloBarostat
from timemachine_tpu.md.context import Context
from timemachine_tpu.md.fire import FireMinimizationConfig, ScipyMinimizationConfig, fire_minimize_jax
from timemachine_tpu.md.utils import get_bond_list, get_group_indices
from timemachine_tpu.ops.bonded import harmonic_positional_restraint
from timemachine_tpu import potentials
from timemachine_tpu.potentials import (
    BoundPotential,
    HarmonicBond,
    Nonbonded,
    SummedPotential,
    get_potential_by_type,
)


class MinimizationError(Exception):
    pass


class MinimizationWarning(UserWarning):
    pass


def check_force_norm(forces, threshold: float = MAX_FORCE_NORM):
    """(ref minimizer.py:65-77)"""
    per_atom = np.linalg.norm(np.asarray(forces), axis=-1)
    if np.any(~np.isfinite(per_atom)) or np.max(per_atom, initial=0.0) > threshold:
        bad = int(np.argmax(np.where(np.isfinite(per_atom), per_atom, np.inf)))
        raise MinimizationError(f"Forces exceeded threshold {threshold} (atom {bad}: |F| = {per_atom[bad]})")


def parameterize_system(topo, ff, lamb: float):
    """(ref minimizer.py:80-98)"""
    params_potential_pairs = [
        topo.parameterize_harmonic_bond(ff.hb_handle.params),
        topo.parameterize_harmonic_angle(ff.ha_handle.params),
        topo.parameterize_proper_torsion(ff.pt_handle.params),
        topo.parameterize_improper_torsion(ff.it_handle.params),
        topo.parameterize_nonbonded(
            ff.q_handle.params,
            ff.q_handle_intra.params,
            ff.lj_handle.params,
            ff.lj_handle_intra.params,
            lamb,
        ),
    ]
    return [pot for _, pot in params_potential_pairs], [p for p, _ in params_potential_pairs]


def fire_minimize(x0, du_dx_fxn: Callable, config: FireMinimizationConfig):
    """FIRE descent. If du_dx_fxn is jax-traceable the whole descent compiles
    to one XLA loop; otherwise falls back to an eager loop around the same
    update (ref minimizer.py:110-157)."""
    try:
        return np.asarray(fire_minimize_jax(x0, lambda x: -du_dx_fxn(x), config))
    except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
        pass
    from timemachine_tpu.md.fire import fire_descent

    init_fn, apply_fn = fire_descent(
        lambda x: -du_dx_fxn(np.asarray(x)),
        lambda x, dx: x + dx,
        dt_start=config.dt_start,
        dt_max=config.dt_max,
        n_min=config.n_min,
        f_inc=config.f_inc,
        f_dec=config.f_dec,
        alpha_start=config.alpha_start,
        f_alpha=config.f_alpha,
    )
    state = init_fn(jnp.asarray(x0))
    for _ in range(config.n_steps):
        state = apply_fn(state)
    return np.asarray(state[0])


def make_host_du_dx_fxn(mols, host_config, ff, mol_coords=None, lamb: float = 0.0):
    """du/dx of host atoms with mols inserted at λ, ligand frozen
    (ref minimizer.py:371-427)."""
    if len(mols) == 1:
        top = topology.BaseTopology(mols[0], ff)
    elif len(mols) == 2:
        top = topology.DualTopology(mols[0], mols[1], ff)
    else:
        raise ValueError("mols must be length 1 or 2")

    hgt = topology.HostGuestTopology(
        host_config.host_system.get_U_fns(), top, host_config.num_water_atoms, ff, host_config.host_topology
    )
    pots, params = parameterize_system(hgt, ff, lamb)
    bps = [pot.bind(p) for pot, p in zip(pots, params)]
    num_host_atoms = host_config.conf.shape[0]

    if mol_coords is None:
        mol_coords = [get_romol_conf(mol) for mol in mols]
    lig_coords = jnp.concatenate(mol_coords)
    box = jnp.asarray(host_config.box)

    # protein-scale hosts: the dense N² path materializes (N, N) work per
    # energy eval; use the tiled neighborlisted impl (pure XLA, so jax.grad
    # below still works — the Pallas kernel has no VJP and stays MD-only)
    for bp in bps:
        pot = bp.potential
        if isinstance(pot, potentials.Nonbonded) and pot.impl == "dense" and pot.num_atoms >= 4096:
            x_full = np.concatenate([np.asarray(host_config.conf), np.asarray(lig_coords)])
            pot.set_impl("tiled").configure_tiled(np.asarray(box), conf=x_full)

    def u_host(x_host):
        x = jnp.concatenate([x_host, lig_coords])
        return sum(bp(x, box) for bp in bps)

    du_dx = jax.jit(jax.grad(u_host))

    def du_dx_host_fxn(x_host):
        return np.asarray(du_dx(jnp.asarray(x_host)))

    # traceable gradient for callers that embed it in a jitted chain
    du_dx_host_fxn.jax_grad = du_dx
    return du_dx_host_fxn


def fire_minimize_host(
    mols,
    host_config,
    ff,
    mol_coords=None,
    n_steps_per_window: int = 500,
    max_lambda: float = 0.1,
    n_windows: int = 2,
):
    """Minimize host coords with mols inserted over decreasing λ windows,
    ligand fixed (ref minimizer.py:310-369)."""
    assert 1.0 >= max_lambda > 0.0
    x_host = np.asarray(host_config.conf)
    config = FireMinimizationConfig(n_steps_per_window)
    du_dx_fxn = None
    for lamb in np.linspace(max_lambda, 0.0, n_windows):
        du_dx_fxn = make_host_du_dx_fxn(mols, host_config, ff, mol_coords=mol_coords, lamb=lamb)
        x_host = fire_minimize(x_host, du_dx_fxn, config)
    check_force_norm(-du_dx_fxn(x_host))
    return x_host


def pre_equilibrate_host(
    mols,
    host_config,
    ff,
    mol_coords=None,
    minimizer_steps_per_window: int = 500,
    minimizer_windows: int = 2,
    minimizer_max_lambda: float = 0.1,
    equilibration_steps: int = 1000,
    pressure: float = DEFAULT_PRESSURE,
    temperature: float = DEFAULT_TEMP,
    barostat_interval: int = 5,
    seed: int = 2024,
):
    """FIRE-minimize then NPT-equilibrate the host with the ligand frozen
    (ref minimizer.py:159-307). Returns (host coords, box)."""
    box = np.asarray(host_config.box)
    assert box.shape == (3, 3)

    minimized_host_coords = fire_minimize_host(
        mols,
        host_config,
        ff,
        mol_coords=mol_coords,
        n_windows=minimizer_windows,
        n_steps_per_window=minimizer_steps_per_window,
        max_lambda=minimizer_max_lambda,
    )
    num_host_atoms = minimized_host_coords.shape[0]

    if len(mols) == 1:
        top = topology.BaseTopology(mols[0], ff)
    elif len(mols) == 2:
        top = topology.DualTopology(mols[0], mols[1], ff)
    else:
        raise ValueError("mols must be length 1 or 2")

    if mol_coords is None:
        mol_coords = [get_romol_conf(mol) for mol in mols]

    combined_masses = np.concatenate(
        [np.array(host_config.masses)] + [np.ones(mol.num_atoms) * np.inf for mol in mols]
    )
    combined_coords = np.concatenate([minimized_host_coords] + list(mol_coords))

    hgt = topology.HostGuestTopology(
        host_config.host_system.get_U_fns(), top, host_config.num_water_atoms, ff, host_config.host_topology
    )
    pots, params = parameterize_system(hgt, ff, 0.0)
    bps = [pot.bind(p) for pot, p in zip(pots, params)]

    # same kernel policy as fe.free_energy.get_context: large condensed-phase
    # hosts route the all-pairs term through the Pallas tile kernel. The
    # dense N² path materializes (N, N) f32 intermediates — at complex-leg
    # size (~14k atoms ⇒ ~0.8 GB per intermediate) that crashes the TPU
    # worker outright (measured r5: reproducible worker fault in this
    # function on the hif2a complex leg).
    for pot in pots:
        inner = pot.potentials if isinstance(pot, SummedPotential) else [pot]
        for p in inner:
            if (
                isinstance(p, Nonbonded)
                and p.impl == "dense"
                and p.num_atoms >= 4096
                and jax.default_backend() != "cpu"
            ):
                p.configure_pallas(box, combined_coords)

    bond_pot = get_potential_by_type(pots, HarmonicBond)
    group_idxs = get_group_indices(get_bond_list(bond_pot), combined_coords.shape[0])
    non_ligand_group_idxs = [g for g in group_idxs if np.all(g < num_host_atoms)]

    intg = LangevinIntegrator(temperature, 1.5e-3, 1.0, combined_masses, seed)
    baro = MonteCarloBarostat(
        combined_coords.shape[0], pressure, temperature, non_ligand_group_idxs, barostat_interval, seed + 1
    )
    ctxt = Context(combined_coords, np.zeros_like(combined_coords), box, intg, bps, movers=[baro])
    ctxt.multiple_steps(equilibration_steps)
    x = ctxt.get_x_t()
    box = ctxt.get_box()

    # frozen ligand atoms are bitwise unmoved in the simulation dtype (which
    # is f32 on TPU when x64 is disabled — compare after the same cast)
    expected_ligand = np.concatenate(mol_coords).astype(x.dtype)
    assert np.all(x[num_host_atoms:] == expected_ligand), "Ligand atoms unexpectedly moved"

    du_dx = jax.jit(jax.grad(lambda xx: sum(bp(xx, jnp.asarray(box)) for bp in bps)))(jnp.asarray(x))
    check_force_norm(-np.asarray(du_dx)[:num_host_atoms])

    return x[:num_host_atoms], box


def equilibrate_host_barker(
    mols,
    host_config,
    ff,
    mol_coords=None,
    temperature: float = DEFAULT_TEMP,
    proposal_stddev: float = 0.0001,
    n_steps: int = 1000,
    seed: Optional[int] = None,
):
    """Clash-robust equilibration via un-Metropolized Barker proposals,
    run as one jitted on-device chain (ref semantics: minimizer.py:429-471)."""
    assert 0 < proposal_stddev <= 0.0001
    du_dx_host_fxn = make_host_du_dx_fxn(mols, host_config, ff, mol_coords)
    kT = BOLTZ * temperature
    grad_log_q = lambda x_host: -du_dx_host_fxn.jax_grad(x_host) / kT

    if seed is None:
        seed = np.random.randint(100000)
    key = jax.random.key(seed)
    x_host = np.asarray(
        barker_chain(key, jnp.asarray(host_config.conf), grad_log_q, proposal_stddev, n_steps)
    )
    check_force_norm(-du_dx_host_fxn(x_host))
    return x_host


def get_val_and_grad_fn(bps: Sequence[BoundPotential], box, precision=None):
    """(ref minimizer.py:473-497)"""
    box = jnp.asarray(box)

    @jax.jit
    def u_total(x):
        return sum(bp(x, box) for bp in bps)

    val_grad = jax.jit(jax.value_and_grad(u_total))

    def val_and_grad_fn(coords):
        u, g = val_grad(jnp.asarray(coords))
        return float(u), np.asarray(g)

    return val_and_grad_fn


def wrap_val_and_grad_with_positional_restraint(val_and_grad_fn, x0, box0, restrained_idxs, k: float):
    """(ref minimizer.py:500-518)"""
    x0 = jnp.asarray(x0)
    box0 = jnp.asarray(box0)
    restraint_grad = jax.jit(
        jax.value_and_grad(lambda x: harmonic_positional_restraint(x0[restrained_idxs], x[restrained_idxs], box0, k=k))
    )

    def wrapped(x):
        u, g = val_and_grad_fn(x)
        u_r, g_r = restraint_grad(jnp.asarray(x))
        return u + float(u_r), g + np.asarray(g_r)

    return wrapped


def scipy_minimize(x0, val_and_grad_fn, config: ScipyMinimizationConfig):
    """(ref minimizer.py:521-544)"""
    shape = x0.shape

    def f(x_flat):
        u, g = val_and_grad_fn(x_flat.reshape(shape))
        return u, np.asarray(g, dtype=np.float64).reshape(-1)

    res = scipy.optimize.minimize(
        f, np.asarray(x0).reshape(-1), method=config.method, jac=True, bounds=config.bounds, options=config.options or {}
    )
    return res.x.reshape(shape)


def local_minimize(
    x0,
    box0,
    val_and_grad_fn,
    local_idxs,
    minimizer_config,
    verbose: bool = True,
    assert_energy_decreased: bool = True,
    restraint_k: float = 0.0,
    restrained_idxs=None,
):
    """Minimize only local_idxs, everything else frozen
    (ref minimizer.py:546-680)."""
    if not isinstance(minimizer_config, (FireMinimizationConfig, ScipyMinimizationConfig)):
        raise ValueError(f"Invalid minimizer config: {type(minimizer_config)}")
    assert restraint_k >= 0.0
    if restrained_idxs is not None:
        assert restraint_k > 0.0
        assert set(map(int, restrained_idxs)).issubset(set(map(int, local_idxs)))

    method = minimizer_config.method if isinstance(minimizer_config, ScipyMinimizationConfig) else "FIRE"
    assert len(local_idxs) == len(set(map(int, local_idxs)))
    free_idxs = np.asarray(local_idxs)
    x0 = np.asarray(x0)

    u_0, _ = val_and_grad_fn(x0)

    minimizer_val_and_grad = val_and_grad_fn
    if restraint_k > 0.0:
        if restrained_idxs is None:
            restrained_idxs = free_idxs
        minimizer_val_and_grad = wrap_val_and_grad_with_positional_restraint(
            val_and_grad_fn, x0, box0, np.asarray(restrained_idxs), restraint_k
        )

    def val_and_grad_local(x_local):
        x_prime = x0.copy()
        x_prime[free_idxs] = x_local
        u_full, grad_full = minimizer_val_and_grad(x_prime)
        if method != "FIRE" and np.isnan(u_full):
            u_full = np.inf
            grad_full = np.nan * grad_full
        return u_full, grad_full[free_idxs]

    if verbose:
        print(f"performing {method} minimization on {len(free_idxs)} atoms (holding {len(x0) - len(free_idxs)} frozen)")
        print(f"U(x_0) = {u_0:.3f}")

    x_local_0 = x0[free_idxs]
    if isinstance(minimizer_config, ScipyMinimizationConfig):
        x_local_final = scipy_minimize(x_local_0, val_and_grad_local, minimizer_config)
    else:
        x_local_final = fire_minimize(x_local_0, lambda x: val_and_grad_local(x)[1], minimizer_config)

    x_final = x0.copy()
    x_final[free_idxs] = x_local_final

    u_final, grad_final = val_and_grad_fn(x_final)
    forces = -grad_final
    if verbose:
        print(f"U(x_final) = {u_final:.3f}")
    check_force_norm(forces)

    if assert_energy_decreased:
        if not np.isnan(u_0):
            assert u_final < u_0, f"U_0: {u_0:.3f}, U_f: {u_final:.3f}"
        else:
            assert np.isfinite(u_final), f"U_0: {u_0:.3f}, U_f: {u_final:.3f}"
    elif u_final >= u_0:
        warnings.warn(f"Energy did not decrease: U_0: {u_0:.3f}, U_f: {u_final:.3f}", MinimizationWarning)

    return x_final


def replace_conformer_with_minimized(mol, ff, minimizer_config=None, conf_id: int = 0):
    """(ref minimizer.py:683-713)"""
    from timemachine_tpu.fe.model_utils import get_vacuum_val_and_grad_fn

    config = minimizer_config or ScipyMinimizationConfig(method="BFGS")
    val_and_grad = get_vacuum_val_and_grad_fn(mol, ff)

    def vag(x):
        u, g = val_and_grad(jnp.asarray(x))
        return float(u), np.asarray(g)

    x0 = get_romol_conf(mol)
    x_min = local_minimize(x0, None, vag, np.arange(mol.num_atoms), config, verbose=False)
    mol.set_conf(x_min)
