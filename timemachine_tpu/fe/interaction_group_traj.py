"""Compact ligand-environment interaction-group trajectories for fast
re-evaluation of U_ig over parameter sweeps (forcefield fitting).

Parity target: reference `timemachine/fe/interaction_group_traj.py` —
per-frame env neighbor masks (:41-52), padded env selection + storage savings
(:55-118), npz round trip (:120-148), make_U_fxn (:151-191).
"""

from typing import Callable

import numpy as np
from jax import jit, vmap
from jax import numpy as jnp

from timemachine_tpu.ops import nonbonded
from timemachine_tpu.ops.pbc import distance_sq

Position = np.ndarray
PairFxn = Callable


def nb_pair_fxn(x_a, x_b, param_a, param_b, box):
    """Example pair function: 4D reaction-field + LJ (ref interaction_group_traj.py:19-38)."""
    beta = 2.0
    cutoff = 1.2
    r2 = distance_sq(x_a, x_b, box)
    w_offset = param_b[3] - param_a[3]
    r = jnp.sqrt(r2 + w_offset**2)
    q_prod = param_a[0] * param_b[0]
    e_q = nonbonded.switched_direct_space_pme(r, q_prod, beta, cutoff)
    sig = nonbonded.combine_sigma(param_a[1], param_b[1])
    eps = nonbonded.combine_epsilon(param_a[2], param_b[2])
    e_lj = nonbonded.lennard_jones(r, sig, eps)
    return jnp.where(r < cutoff, e_q + e_lj, 0.0)


@jit
def env_mask_within_cutoff(x_env, x_lig, box, cutoff):
    """result[i] = any distance(x_env[i], y) < cutoff for y in x_lig
    (ref interaction_group_traj.py:41-52)."""

    def within_cutoff(point):
        d2 = vmap(distance_sq, (None, 0, None))(point, x_lig, box)
        return jnp.any(d2 < cutoff**2)

    return vmap(within_cutoff)(x_env)


class InteractionGroupTraj:
    """(ref interaction_group_traj.py:55-191)"""

    def __init__(self, xs, box_diags, ligand_idxs, env_idxs, cutoff=1.2, verbose=True):
        self.cutoff = cutoff
        self.n_frames = len(xs)
        self.ligand_idxs = np.asarray(ligand_idxs)
        all_env_idxs = np.asarray(env_idxs)
        num_lig, num_env = len(ligand_idxs), len(env_idxs)

        xs = np.asarray(xs)
        self.xs_lig = xs[:, self.ligand_idxs]
        _xs_env = xs[:, all_env_idxs]

        if verbose:
            print(f"precomputing neighborlist on ({num_lig}, {num_env}) interaction group, at cutoff={cutoff}")

        # frame-by-frame to bound memory at num_env x num_lig
        mask = np.array(
            [
                np.asarray(env_mask_within_cutoff(_xs_env[i], self.xs_lig[i], np.diag(box_diags[i]), cutoff))
                for i in range(self.n_frames)
            ]
        )
        padded_num_env_atoms = int(mask.sum(1).max())

        if verbose:
            num_stored = padded_num_env_atoms + num_lig
            max_nbrs, mean_nbrs = padded_num_env_atoms, mask.sum(1).mean()
            print(
                f"saving {(xs.shape[1] / num_stored):.2f}x on storage (relative to storing all env atoms); "
                f"padding to max_nbrs = {max_nbrs} (~{max_nbrs / mean_nbrs:.2f}x larger than unpadded)"
            )

        idxs_within_env_block = np.argsort(mask, axis=1)[:, -padded_num_env_atoms:]
        self.selected_env_idxs = np.asarray(all_env_idxs[idxs_within_env_block], dtype=np.uint32)
        self.xs_env = np.array([_x_env[idxs] for (_x_env, idxs) in zip(_xs_env, idxs_within_env_block)])
        self.box_diags = np.asarray(box_diags)

    def to_dict(self):
        return dict(
            xs_lig=np.array(self.xs_lig),
            xs_env=np.array(self.xs_env),
            box_diags=np.array(self.box_diags),
            cutoff=self.cutoff,
            selected_env_idxs=np.array(self.selected_env_idxs),
            ligand_idxs=np.array(self.ligand_idxs),
        )

    @classmethod
    def from_dict(cls, archive):
        traj = cls.__new__(cls)
        traj.xs_lig = archive["xs_lig"]
        traj.xs_env = archive["xs_env"]
        traj.box_diags = archive["box_diags"]
        traj.cutoff = archive["cutoff"]
        traj.selected_env_idxs = archive["selected_env_idxs"]
        traj.ligand_idxs = archive["ligand_idxs"]
        traj.n_frames = len(traj.xs_env)
        return traj

    def to_npz(self, fname):
        np.savez_compressed(fname, **self.to_dict())

    @classmethod
    def from_npz(cls, fname):
        return cls.from_dict(np.load(fname, allow_pickle=False))

    def make_U_fxn(self, pair_fxn: PairFxn):
        """Vector-valued fn of nb params: [U_ig(x; params) for x in traj]
        (ref interaction_group_traj.py:151-191)."""
        axes_a = (0, None, 0, None, None)
        axes_b = (None, 0, None, 0, None)
        all_pairs_fxn = vmap(vmap(pair_fxn, axes_a), axes_b)
        ligand_idxs = jnp.asarray(self.ligand_idxs)

        def compute_Us(nb_params):
            nb_params = jnp.array(nb_params)
            lig_params = nb_params[ligand_idxs]
            selected_env_idxs = jnp.array(self.selected_env_idxs)

            @jit
            def U_snapshot(x_ligand, x_env, env_idxs, box_diag):
                env_params = nb_params[env_idxs]
                return jnp.sum(all_pairs_fxn(x_ligand, x_env, lig_params, env_params, jnp.diag(box_diag)))

            Us = vmap(U_snapshot, (0, 0, 0, 0))(
                jnp.asarray(self.xs_lig), jnp.asarray(self.xs_env), selected_env_idxs, jnp.asarray(self.box_diags)
            )
            assert Us.shape == (self.n_frames,)
            return Us

        return compute_Us
