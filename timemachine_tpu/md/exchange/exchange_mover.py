"""Water exchange Monte Carlo: Biased Deletion (BD) and Targeted Insertion
Biased Deletion (TIBD) movers.

Parity target: reference `timemachine/md/exchange/exchange_mover.py` —
BDExchangeMove (:64-235), insertion-region helpers (:237-324),
TIBDExchangeMove (:326-467). The reference file is itself the pure-python/JAX
prototype of the CUDA `custom_ops.TIBDExchangeMove`; the production
scan-based Context mover for this framework lives in
`md/exchange/targeted_insertion.py`.

Algorithm: deletion is biased toward high-interaction-energy waters
(w_i = exp(+beta U_i)), insertion targets a sphere around the ligand centroid
(TIBD) or the whole box (BD); the acceptance ratio uses the ratio of
normalization constants, computed incrementally — one 3x(N-3) interaction
block per proposal instead of the full NxN matrix (the "transposition
trick").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray
from scipy.special import logsumexp

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.md import moves
from timemachine_tpu.md.states import CoordsVelBox
from timemachine_tpu.ops.nonbonded import nonbonded_block_unsummed


def get_water_idxs(mol_groups: list, ligand_idxs: Optional[NDArray] = None) -> list:
    """Subset of molecule groups that are waters (size 3, not the ligand)
    (ref exchange_mover.py:17-26)."""
    water_groups = [g for g in mol_groups if len(g) == 3]
    if ligand_idxs is not None and len(ligand_idxs) == 3:
        ligand_atom_set = set(np.asarray(ligand_idxs).tolist())
        water_groups = [g for g in water_groups if set(np.asarray(g).tolist()) != ligand_atom_set]
    return water_groups


def random_rotation_matrix(rng: np.random.Generator) -> np.ndarray:
    """Haar-uniform SO(3) rotation via quaternion."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def randomly_rotate_and_translate(coords, new_loc, rng: Optional[np.random.Generator] = None):
    """Random rigid placement with centroid at new_loc (ref exchange_mover.py:29-42)."""
    rng = rng or np.random.default_rng()
    centroid = np.mean(coords, axis=0, keepdims=True)
    centered = coords - centroid
    rot = random_rotation_matrix(rng)
    return centered @ rot.T + new_loc


def translate_coordinates(coords, new_loc):
    """(ref exchange_mover.py:45-52)"""
    centroid = np.mean(coords, axis=0, keepdims=True)
    return coords - centroid + new_loc


# -- weight math shared by the python prototype and the scan mover -----------


def make_weight_fns_paramized(water_idxs, nb_beta, nb_cutoff, kT, n_atoms, weight_chunk: int = 128):
    """Build (batch_log_weights, batch_log_weights_incremental) taking the
    nonbonded params as a RUNTIME argument (first position): HREX swaps the
    water sampler's per-state params without retracing the Context runner
    (mirroring the reference's device-side set-params,
    bd_exchange_move.hpp)."""
    water_idxs = jnp.asarray(water_idxs, dtype=jnp.int32)
    num_waters = water_idxs.shape[0]
    beta_T = 1.0 / kT

    # atom -> water id (num_waters for non-water atoms)
    atom_to_water_np = np.full(n_atoms, num_waters, dtype=np.int32)
    atom_to_water_np[np.asarray(water_idxs).ravel()] = np.repeat(np.arange(num_waters, dtype=np.int32), 3)
    atom_to_water = jnp.asarray(atom_to_water_np)

    def water_block(nb_params, conf, box, a_idxs):
        """(3, N) interaction energies of water atoms a_idxs vs all atoms,
        with the water's own columns zeroed and NaN -> +inf."""
        u = nonbonded_block_unsummed(
            conf[a_idxs], conf, box, nb_params[a_idxs], nb_params, nb_beta, nb_cutoff
        )
        u = jnp.where(jnp.isnan(u), jnp.inf, u)
        col_is_self = atom_to_water == atom_to_water[a_idxs][0]
        return jnp.where(col_is_self[None, :], 0.0, u)

    @jax.jit
    def batch_log_weights(nb_params, conf, box):
        """(W,) weights via a chunked scan over waters (memory: chunk x 3 x N)."""
        conf = jnp.asarray(conf)

        pad = (-num_waters) % weight_chunk
        padded = jnp.concatenate(
            [water_idxs, jnp.zeros((pad, 3), dtype=water_idxs.dtype)], axis=0
        ).reshape(-1, weight_chunk, 3)

        def chunk_fn(_, chunk_idxs):
            # (C, 3, N)
            u = nonbonded_block_unsummed(
                conf[chunk_idxs.reshape(-1)].reshape(-1, 3),
                conf,
                box,
                nb_params[chunk_idxs.reshape(-1)].reshape(-1, 4),
                nb_params,
                nb_beta,
                nb_cutoff,
            ).reshape(weight_chunk, 3, n_atoms)
            u = jnp.where(jnp.isnan(u), jnp.inf, u)
            # zero each water's interaction with its own atoms
            own = atom_to_water[chunk_idxs[:, 0]][:, None] == atom_to_water[None, :]
            u = jnp.where(own[:, None, :], 0.0, u)
            return None, jnp.sum(u, axis=(1, 2))

        _, sums = jax.lax.scan(chunk_fn, None, padded)
        return beta_T * sums.reshape(-1)[:num_waters]

    @jax.jit
    def batch_log_weights_incremental(nb_params, conf, box, water_idx, new_pos, initial_weights):
        """Z(x') from Z(x) after moving water_idx to new_pos.

        Returns (final_weights, new_conf)."""
        conf = jnp.asarray(conf)
        a_idxs = water_idxs[water_idx]

        old_u = water_block(nb_params, conf, box, a_idxs)
        old_atom_nrg = jnp.sum(old_u, axis=0)  # (N,)
        old_per_water = jax.ops.segment_sum(old_atom_nrg, atom_to_water, num_segments=num_waters + 1)[:num_waters]

        new_conf = conf.at[a_idxs].set(new_pos)
        new_u = water_block(nb_params, new_conf, box, a_idxs)
        new_atom_nrg = jnp.sum(new_u, axis=0)
        new_per_water = jax.ops.segment_sum(new_atom_nrg, atom_to_water, num_segments=num_waters + 1)[:num_waters]

        final_weights = initial_weights + beta_T * (new_per_water - old_per_water)
        final_weights = final_weights.at[water_idx].set(beta_T * jnp.sum(new_atom_nrg))
        return final_weights, new_conf

    return batch_log_weights, batch_log_weights_incremental


def make_weight_fns(nb_params, water_idxs, nb_beta, nb_cutoff, kT, weight_chunk: int = 128):
    """Weight fns with nb_params baked in (python-prototype movers; see
    make_weight_fns_paramized for the runtime-params variant)."""
    nb_params = jnp.asarray(nb_params)
    blw, blwi = make_weight_fns_paramized(
        water_idxs, nb_beta, nb_cutoff, kT, nb_params.shape[0], weight_chunk=weight_chunk
    )

    def batch_log_weights(conf, box):
        return blw(nb_params, conf, box)

    def batch_log_weights_incremental(conf, box, water_idx, new_pos, initial_weights):
        return blwi(nb_params, conf, box, water_idx, new_pos, initial_weights)

    return batch_log_weights, batch_log_weights_incremental


class BDExchangeMove(moves.MonteCarloMove):
    """Untargeted biased-deletion water exchange (ref exchange_mover.py:64-235)."""

    def __init__(
        self,
        nb_beta: float,
        nb_cutoff: float,
        nb_params: NDArray,
        water_idxs: NDArray,
        temperature: float,
        seed: Optional[int] = None,
    ):
        super().__init__()
        self.nb_beta = nb_beta
        self.nb_cutoff = nb_cutoff
        self.nb_params = jnp.array(nb_params)
        self.water_idxs_np = np.array(water_idxs)
        self.num_waters = len(water_idxs)
        assert self.num_waters > 0
        self.n_atoms = len(nb_params)
        kT = BOLTZ * temperature
        self.beta = 1 / kT
        self.rng = np.random.default_rng(seed)

        self.batch_log_weights_fn, self.batch_log_weights_incremental = make_weight_fns(
            nb_params, water_idxs, nb_beta, nb_cutoff, kT
        )

        self.last_conf = None
        self.last_bw = None

    def batch_log_weights(self, conf, box):
        """Cached on conf (ref exchange_mover.py:141-151)."""
        if self.last_conf is None or not np.array_equal(self.last_conf, conf):
            self.last_conf = np.array(conf)
            self.last_bw = np.array(self.batch_log_weights_fn(conf, box))
        return self.last_bw

    def propose(self, x: CoordsVelBox) -> tuple[CoordsVelBox, float]:
        coords, box = x.coords, x.box
        log_weights_before = self.batch_log_weights(coords, box)
        log_probs_before = log_weights_before - logsumexp(log_weights_before)
        chosen_water = self.rng.choice(np.arange(self.num_waters), p=np.exp(log_probs_before))
        chosen_water_atoms = self.water_idxs_np[chosen_water]

        trial_translation = np.diag(box) * self.rng.random(3)
        moved_coords = randomly_rotate_and_translate(coords[chosen_water_atoms], trial_translation, self.rng)

        log_weights_after, trial_coords = self.batch_log_weights_incremental(
            coords, box, chosen_water, moved_coords, log_weights_before
        )
        log_weights_after = np.array(log_weights_after)

        log_acceptance_probability = np.minimum(
            logsumexp(log_weights_before) - logsumexp(log_weights_after), 0.0
        )
        return CoordsVelBox(np.array(trial_coords), x.velocities, x.box), log_acceptance_probability


def delta_r_np(ri, rj, box):
    """(ref exchange_mover.py:237-243)"""
    diff = ri - rj
    if box is not None:
        box_diag = np.diag(box)
        diff -= box_diag * np.floor(diff / box_diag + 0.5)
    return diff


def inner_insertion(radius, center, box, rng: Optional[np.random.Generator] = None):
    """Uniform point in the sphere (ref exchange_mover.py:245-257)."""
    rng = rng or np.random.default_rng()
    xyz = rng.normal(size=3)
    xyz /= np.linalg.norm(xyz)
    c = np.cbrt(rng.random())
    new_xyz = xyz * c * radius + center
    assert np.linalg.norm(delta_r_np(new_xyz, center, box)) < radius
    return new_xyz


def outer_insertion(radius, center, box, rng: Optional[np.random.Generator] = None):
    """Uniform point in box minus sphere, by rejection (ref exchange_mover.py:260-267)."""
    rng = rng or np.random.default_rng()
    for _ in range(1_000_000):
        xyz = rng.random(3) * np.diag(box)
        if np.linalg.norm(delta_r_np(xyz, center, box)) >= radius:
            return xyz
    raise AssertionError("outer_insertion failed")


def get_water_groups(coords, box, center, water_idxs, radius):
    """Waters inside/outside the sphere (ref exchange_mover.py:270-280)."""
    mol_centroids = np.mean(coords[water_idxs], axis=1)
    dijs = np.linalg.norm(delta_r_np(mol_centroids, center, box), axis=1)
    inner_mols = np.argwhere(dijs < radius).reshape(-1)
    outer_mols = np.argwhere(dijs >= radius).reshape(-1)
    assert len(inner_mols) + len(outer_mols) == len(water_idxs)
    return inner_mols, outer_mols


def compute_proposal_probabilities_given_counts(n_a, n_b):
    """(ref exchange_mover.py:283-295)"""
    assert n_a >= 0 and n_b >= 0
    if n_a > 0 and n_b > 0:
        return 0.5
    if n_a > 0 or n_b > 0:
        return 1.0
    raise AssertionError("invalid corner")


def compute_raw_ratio_given_weights(log_weights_before, log_weights_after, vi_mols, vj_mols, vol_i, vol_j):
    """(ref exchange_mover.py:298-324)"""
    assert len(vi_mols) > 0
    fwd_n_i, fwd_n_j = len(vi_mols), len(vj_mols)
    g_fwd = compute_proposal_probabilities_given_counts(fwd_n_i, fwd_n_j)
    g_rev = compute_proposal_probabilities_given_counts(fwd_n_i - 1, fwd_n_j + 1)
    return (
        logsumexp(log_weights_before)
        - logsumexp(log_weights_after)
        + np.log(vol_j)
        - np.log(vol_i)
        + np.log(g_rev)
        - np.log(g_fwd)
    )


class TIBDExchangeMove(BDExchangeMove):
    """Targeted Insertion + Biased Deletion over a ligand-centered sphere
    (ref exchange_mover.py:326-467)."""

    def __init__(
        self,
        nb_beta: float,
        nb_cutoff: float,
        nb_params: NDArray,
        water_idxs: NDArray,
        temperature: float,
        ligand_idxs,
        radius: float,
        seed: Optional[int] = None,
    ):
        super().__init__(nb_beta, nb_cutoff, nb_params, water_idxs, temperature, seed=seed)
        self.ligand_idxs = np.array(ligand_idxs)
        self.radius = radius

    def swap_vi_into_vj(self, vi_mols, vj_mols, x: CoordsVelBox, vj_site, vol_i, vol_j):
        coords, box = x.coords, x.box
        log_weights_before_full = self.batch_log_weights(coords, box)
        log_weights_before = log_weights_before_full[vi_mols]
        probs_before = np.exp(log_weights_before - logsumexp(log_weights_before))
        water_idx = self.rng.choice(vi_mols, p=probs_before)

        chosen_water_atoms = self.water_idxs_np[water_idx]
        new_coords = randomly_rotate_and_translate(coords[chosen_water_atoms], vj_site, self.rng)

        vj_plus_one_idxs = np.concatenate([[water_idx], vj_mols])
        log_weights_after_full, trial_coords = self.batch_log_weights_incremental(
            coords, box, water_idx, new_coords, log_weights_before_full
        )
        log_weights_after_full = np.array(log_weights_after_full)
        log_weights_after = log_weights_after_full[vj_plus_one_idxs]

        raw_log_p = compute_raw_ratio_given_weights(
            log_weights_before, log_weights_after, vi_mols, vj_mols, vol_i, vol_j
        )
        return CoordsVelBox(np.array(trial_coords), x.velocities, x.box), min(0.0, raw_log_p)

    def propose(self, x: CoordsVelBox) -> tuple[CoordsVelBox, float]:
        coords, box = x.coords, x.box
        center = np.mean(coords[self.ligand_idxs], axis=0)
        inner_mols, outer_mols = get_water_groups(coords, box, center, self.water_idxs_np, self.radius)
        n1, n2 = len(inner_mols), len(outer_mols)

        vol_1 = (4 / 3) * np.pi * self.radius**3
        vol_2 = np.prod(np.diag(box)) - vol_1

        v1_site = inner_insertion(self.radius, center, box, self.rng)
        v2_site = outer_insertion(self.radius, center, box, self.rng)

        if n1 > 0 and n2 == 0:
            return self.swap_vi_into_vj(inner_mols, outer_mols, x, v2_site, vol_1, vol_2)
        if n1 == 0 and n2 > 0:
            return self.swap_vi_into_vj(outer_mols, inner_mols, x, v1_site, vol_2, vol_1)
        if n1 > 0 and n2 > 0:
            if self.rng.random() < 0.5:
                return self.swap_vi_into_vj(inner_mols, outer_mols, x, v2_site, vol_1, vol_2)
            return self.swap_vi_into_vj(outer_mols, inner_mols, x, v1_site, vol_2, vol_1)
        raise AssertionError("no waters to swap")
