"""Enhanced sampling: importance-weighted vacuum conformer generation and
aligned ligand-swap proposals for condensed-phase endstates.

Parity target: reference `timemachine/md/enhanced.py` — VacuumState with
U_easy/U_full/U_decharged (:68-220), log-weighted vacuum sampling (:222-352),
weighted resampling (:353-406), solvent-phase setup/equilibration (:407-504),
aligned batch proposals (:505-552), pregeneration drivers (:553-612).

TPU design: the reference farms vacuum MD to CPU workers via
multiprocessing + pmap; here the walkers are a vmapped batch inside ONE
jitted lax.scan Langevin program — the natural TPU formulation (the batch
dimension fills the VPU/MXU; no process pool, no host sync per batch).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import jax.random as jrandom
import numpy as np
from jax.scipy.special import logsumexp as jlogsumexp
from scipy.special import logsumexp

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.fe import topology
from timemachine_tpu.fe.utils import get_mol_masses, get_romol_conf
from timemachine_tpu.integrators import langevin_coefficients
from timemachine_tpu.md import builders, minimizer
from timemachine_tpu.md.moves import NPTMove
from timemachine_tpu.md.states import CoordsVelBox
from timemachine_tpu.md.utils import get_bond_list, get_group_indices
from timemachine_tpu.ops import bonded
from timemachine_tpu.ops.rmsd import align_x2_unto_x1

logger = logging.getLogger(__name__)

ROTATABLE_BOND_SMARTS = "[!$(*#*)&!D1]-&!@[!$(*#*)&!D1]"


def identify_rotatable_bonds(mol):
    """Rotatable bonds via the Lipinski-style (non-strict) SMARTS, matched
    with the native engine; canonicalized (i < j) pairs."""
    from timemachine_tpu.chem.smarts import match_smarts

    return {(min(i, j), max(i, j)) for i, j in match_smarts(mol, ROTATABLE_BOND_SMARTS)}


class VacuumState:
    """Vacuum energy ladder for barrier-crossing proposals: U_easy (rigid
    scaffold only — rotatable torsions and nonbonded off) -> U_decharged ->
    U_full. Built once as a table of bound term closures."""

    def __init__(self, mol, ff):
        self.mol = mol
        bt = topology.BaseTopology(mol, ff)
        self.box = None
        vac_box = np.eye(3) * 1000.0

        hb_p, hb = bt.parameterize_harmonic_bond(ff.hb_handle.params)
        ha_p, ha = bt.parameterize_harmonic_angle(ff.ha_handle.params)
        pt_p, pt = bt.parameterize_proper_torsion(ff.pt_handle.params)
        it_p, it = bt.parameterize_improper_torsion(ff.it_handle.params)
        nb_p, nb = bt.parameterize_nonbonded(
            ff.q_handle.params, ff.q_handle_intra.params, ff.lj_handle.params, ff.lj_handle_intra.params, 0.0
        )
        # kept public: estimator tests and reweighting introspect these
        self.bond_params, self.hb_potential = hb_p, hb
        self.angle_params, self.ha_potential = ha_p, ha
        self.proper_torsion_params, self.pt_potential = pt_p, pt
        self.improper_torsion_params, self.it_potential = it_p, it
        self.nb_params, self.nb_potential = nb_p, nb
        self.lamb = 0.0

        # vectorized easy-torsion selection: keep propers whose central bond
        # is NOT rotatable
        rotatable = identify_rotatable_bonds(mol)
        pt_idxs = np.asarray(pt.idxs).reshape(-1, 4)
        central = np.stack(
            [np.minimum(pt_idxs[:, 1], pt_idxs[:, 2]), np.maximum(pt_idxs[:, 1], pt_idxs[:, 2])], axis=1
        )
        keep = np.array([tuple(b) not in rotatable for b in central], dtype=bool)
        self._easy_torsion_idxs = pt_idxs[keep].astype(np.int32)
        self._easy_torsion_params = np.asarray(pt_p, np.float64).reshape(-1, 3)[keep]

        scaffold = lambda x: hb(x, hb_p, None) + ha(x, ha_p, None) + it(x, it_p, None)
        decharged_nb = jnp.asarray(nb_p).at[:, 0].set(0.0)
        self._terms = {
            "scaffold": scaffold,
            "easy_torsions": lambda x: bonded.periodic_torsion(
                x, self._easy_torsion_params, None, self._easy_torsion_idxs
            ),
            "propers": lambda x: pt(x, pt_p, None),
            "nonbonded": lambda x: nb(x, nb_p, vac_box),
            "nonbonded_decharged": lambda x: nb(x, decharged_nb, vac_box),
        }

    def U_easy(self, x):
        """Proposal potential: rotatable torsions and all nonbonded off."""
        return self._terms["scaffold"](x) + self._terms["easy_torsions"](x)

    def U_full(self, x):
        return self._terms["scaffold"](x) + self._terms["propers"](x) + self._terms["nonbonded"](x)

    def U_decharged(self, x):
        """Interacting but decharged — better overlap with condensed states."""
        return self._terms["scaffold"](x) + self._terms["propers"](x) + self._terms["nonbonded_decharged"](x)


def simulate_batch(x0, U_fn, temperature, masses, steps_per_batch, num_batches, num_walkers, seed, dt=1.5e-3, friction=1.0):
    """Batched vacuum Langevin: num_walkers trajectories advanced in one
    jitted scan, emitting a frame every steps_per_batch steps.

    Replaces reference `integrator.simulate` + multiprocessing pmap
    (enhanced.py:222-279) with a single vmapped program.

    Returns (xs, vs) with shape (num_walkers, num_batches, N, 3).
    """
    masses = np.asarray(masses)
    ca, cb, cc = langevin_coefficients(temperature, dt, friction, masses)
    ca = jnp.asarray(ca)
    cb = jnp.asarray(cb[:, None] if np.ndim(cb) == 1 else cb)
    cc = jnp.asarray(cc[:, None] if np.ndim(cc) == 1 else cc)

    force_fn = lambda x: -jax.grad(U_fn)(x)
    key = jrandom.key(seed)

    # slightly perturbed replicas decorrelate the walkers (they share x0)
    init_keys = jrandom.split(key, num_walkers + 1)
    walker_keys, noise_key = init_keys[:-1], init_keys[-1]
    x_init = jnp.asarray(x0)[None, :, :] + 0.01 * jrandom.normal(noise_key, (num_walkers, *np.shape(x0)))
    kT = BOLTZ * temperature
    v_init = jnp.sqrt(kT / jnp.asarray(masses))[None, :, None] * jrandom.normal(
        jrandom.fold_in(noise_key, 1), (num_walkers, *np.shape(x0))
    )

    def one_walker(x0_w, v0_w, key_w):
        def step(carry, key_t):
            x, v = carry
            noise = jrandom.normal(key_t, x.shape)
            v_mid = v + cb * force_fn(x)
            v_new = ca * v_mid + cc * noise
            x_new = x + 0.5 * dt * (v_mid + v_new)
            return (x_new, v_new), None

        def batch(carry, key_b):
            keys = jrandom.split(key_b, steps_per_batch)
            carry, _ = jax.lax.scan(step, carry, keys)
            return carry, carry

        batch_keys = jrandom.split(key_w, num_batches)
        _, (xs, vs) = jax.lax.scan(batch, (x0_w, v0_w), batch_keys)
        return xs, vs

    xs, vs = jax.jit(jax.vmap(one_walker))(x_init, v_init, walker_keys)
    return np.asarray(xs), np.asarray(vs)


def generate_log_weighted_samples(
    mol,
    temperature,
    U_proposal,
    U_target,
    seed,
    steps_per_batch: int = 250,
    num_batches: int = 24000,
    num_workers=None,
    burn_in_batches: int = 2000,
):
    """Sample from U_proposal, weight by U_target − U_proposal
    (ref enhanced.py:285-351).

    Returns (xvs, log_weights): xvs has shape (num_batches, 2, N, 3) stacking
    coordinates and velocities.
    """
    masses = get_mol_masses(mol)
    num_walkers = num_workers or 8
    x0 = get_romol_conf(mol)
    kT = temperature * BOLTZ

    batches_per_walker = int(np.ceil(num_batches / num_walkers))
    xs, vs = simulate_batch(
        x0,
        U_proposal,
        temperature,
        masses,
        steps_per_batch,
        batches_per_walker + burn_in_batches,
        num_walkers,
        seed,
    )
    xs = xs[:, burn_in_batches:]
    vs = vs[:, burn_in_batches:]

    batch_U = jax.jit(jax.vmap(jax.vmap(U_target)))
    batch_U_prop = jax.jit(jax.vmap(jax.vmap(U_proposal)))
    log_weights = (-np.asarray(batch_U(xs)) + np.asarray(batch_U_prop(xs))).reshape(-1) / kT

    n_atoms = len(masses)
    xs = xs.reshape(-1, n_atoms, 3)[:num_batches]
    vs = vs.reshape(-1, n_atoms, 3)[:num_batches]
    xvs = np.stack([xs, vs], axis=1)
    return xvs, log_weights[:num_batches]


def sample_from_log_weights(weighted_samples, log_weights, size):
    """Multinomial resample into an unweighted collection (ref enhanced.py:353-379)."""
    if len(log_weights) != len(weighted_samples):
        raise ValueError("one log weight per sample required")
    weights = np.exp(log_weights - logsumexp(log_weights))
    assert np.abs(np.sum(weights) - 1) < 1e-5
    chosen = np.random.choice(len(weights), size=size, p=weights)
    return [weighted_samples[i] for i in chosen]


def jax_sample_from_log_weights(weighted_samples, log_weights, size, key):
    """On-device variant: categorical draw directly from the log weights
    (ref enhanced.py:381-405)."""
    chosen = jrandom.categorical(key, jnp.asarray(log_weights), shape=(size,))
    return weighted_samples[chosen]


def get_solvent_phase_system(
    mol, ff, lamb: float, box_width: float = 3.0, margin: float = 0.5, minimize_energy: bool = True
):
    """Solvated alchemical system for a single mol (ref enhanced.py:407-450).

    Returns (potentials, params, masses, coords, box)."""
    from timemachine_tpu.fe.free_energy import AbsoluteFreeEnergy

    host_config = builders.build_water_system(box_width, ff.water_ff, mols=[mol])
    host_config.box += np.eye(3) * margin

    bt = topology.BaseTopology(mol, ff)
    afe = AbsoluteFreeEnergy(mol, bt)
    potentials, params, masses = afe.prepare_host_edge(ff, host_config, lamb)

    ligand_coords = get_romol_conf(mol)
    if minimize_energy:
        new_water_coords = minimizer.fire_minimize_host([mol], host_config, ff)
        coords = np.concatenate([new_water_coords, ligand_coords])
    else:
        coords = np.concatenate([host_config.conf, ligand_coords])

    return potentials, params, masses, coords, host_config.box


def equilibrate_solvent_phase(
    potentials,
    params,
    masses,
    coords,
    box,
    temperature,
    pressure,
    num_steps,
    seed=None,
):
    """NPT equilibration from minimized coords, small timestep (1e-4 ps),
    zeroed velocities in and out (ref enhanced.py:452-503)."""
    from timemachine_tpu.integrators import LangevinIntegrator
    from timemachine_tpu.md.barostat import MonteCarloBarostat
    from timemachine_tpu.md.context import Context
    from timemachine_tpu.potentials import HarmonicBond, get_potential_by_type

    group_idxs = get_group_indices(get_bond_list(get_potential_by_type(potentials, HarmonicBond)), len(masses))
    ctxt = Context(
        coords,
        np.zeros_like(coords),
        box,
        LangevinIntegrator(temperature, 1e-4, 1.0, masses, seed),
        [pot.bind(p) for pot, p in zip(potentials, params)],
        movers=[MonteCarloBarostat(len(masses), pressure, temperature, group_idxs, 5, seed + 1)],
    )
    ctxt.multiple_steps(num_steps)
    x_eq = ctxt.get_x_t()
    return CoordsVelBox(x_eq, np.zeros_like(x_eq), ctxt.get_box())


def align_sample(x_vacuum, x_solvent):
    """Rigidly align x_vacuum onto the ligand region of x_solvent
    (ref enhanced.py:505-518)."""
    num_atoms = len(x_vacuum)
    return align_x2_unto_x1(x_solvent[-num_atoms:], x_vacuum)


def align_and_replace(x_vacuum, x_solvent):
    """(ref enhanced.py:520-527)"""
    num_ligand_atoms = len(x_vacuum)
    aligned = align_sample(x_vacuum, x_solvent)
    return jnp.asarray(x_solvent).at[jnp.index_exp[-num_ligand_atoms:]].set(aligned)


batch_align_and_replace = jax.jit(jax.vmap(align_and_replace, in_axes=(0, None)))


def aligned_batch_propose(xvb, K, key, vacuum_samples, vacuum_log_weights):
    """K solvent proposals with the ligand swapped for aligned vacuum samples
    (ref enhanced.py:530-546)."""
    chosen = jax_sample_from_log_weights(vacuum_samples, vacuum_log_weights, K, key)
    replaced = batch_align_and_replace(chosen, xvb.coords)
    return [CoordsVelBox(np.asarray(x_r), xvb.velocities, xvb.box) for x_r in replaced]


def jax_aligned_batch_propose_coords(x, K, key, vacuum_samples, vacuum_log_weights):
    """(ref enhanced.py:548-551)"""
    chosen = jax_sample_from_log_weights(vacuum_samples, vacuum_log_weights, K, key)
    return batch_align_and_replace(chosen, x)


def generate_solvent_samples(
    coords,
    box,
    masses,
    potentials,
    params,
    temperature,
    pressure,
    seed,
    n_samples,
    num_equil_steps=50000,
    md_steps_per_move=1000,
):
    """NPT chain over the solvated system: equilibrate once, then each sample
    is md_steps_per_move steps past the previous (ref enhanced.py:578-601)."""
    state = equilibrate_solvent_phase(
        potentials, params, masses, coords, box, temperature, pressure, num_equil_steps, seed
    )
    mover = NPTMove(
        [pot.bind(p) for pot, p in zip(potentials, params)],
        masses,
        temperature,
        pressure,
        n_steps=md_steps_per_move,
        seed=seed,
    )
    return [state, *mover.sample_chain(state, n_samples)]


def generate_ligand_samples(num_batches, mol, ff, temperature, seed, num_workers=None):
    """Weighted vacuum ligand samples via importance sampling from U_easy
    (ref enhanced.py:604-612)."""
    state = VacuumState(mol, ff)
    return generate_log_weighted_samples(
        mol, temperature, state.U_easy, state.U_full, num_batches=num_batches, seed=seed, num_workers=num_workers
    )


def pregenerate_samples(
    mol,
    ff,
    lamb,
    seed,
    n_solvent_samples=1000,
    n_ligand_batches=30000,
    temperature=300.0,
    pressure=1.0,
    num_workers=None,
):
    """Both ingredient ensembles of the aligned-swap MTM move: solvent-phase
    NPT frames and weighted vacuum ligand conformers (ref enhanced.py:553-576)."""
    potentials, params, masses, coords, box = get_solvent_phase_system(mol, ff, lamb)
    print(f"Generating {n_solvent_samples} solvent samples")
    solvent_xvbs = generate_solvent_samples(
        coords, box, masses, potentials, params, temperature, pressure, seed, n_solvent_samples
    )
    print("Generating ligand samples")
    ligand_samples, ligand_log_weights = generate_ligand_samples(
        n_ligand_batches, mol, ff, temperature, seed, num_workers=num_workers
    )
    return solvent_xvbs, ligand_samples, ligand_log_weights
