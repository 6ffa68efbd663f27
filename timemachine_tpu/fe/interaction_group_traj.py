"""Compact ligand-environment interaction-group trajectories: store only the
env atoms that ever enter the ligand's cutoff shell per frame, so U_ig can be
re-evaluated cheaply over nonbonded-parameter sweeps (forcefield fitting).

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

_TRAJ_FIELDS = ("xs_lig", "xs_env", "box_diags", "cutoff", "selected_env_idxs", "ligand_idxs")


def nb_pair_fxn(x_a, x_b, param_a, param_b, box):
    """Example pair function: 4D reaction-field + LJ (ref interaction_group_traj.py:19-38)."""
    beta, cutoff = 2.0, 1.2
    dw = param_b[3] - param_a[3]
    r = jnp.sqrt(distance_sq(x_a, x_b, box) + dw * dw)
    e_q = nonbonded.switched_direct_space_pme(r, param_a[0] * param_b[0], beta, cutoff)
    e_lj = nonbonded.lennard_jones(
        r, nonbonded.combine_sigma(param_a[1], param_b[1]), nonbonded.combine_epsilon(param_a[2], param_b[2])
    )
    return jnp.where(r < cutoff, e_q + e_lj, 0.0)


@jit
def env_mask_within_cutoff(x_env, x_lig, box, cutoff):
    """result[i] = min-image distance(x_env[i], x_lig) < cutoff for ANY
    ligand atom (ref interaction_group_traj.py:41-52)."""
    d2 = vmap(vmap(distance_sq, (None, 0, None)), (0, None, None))(x_env, x_lig, box)
    return jnp.any(d2 < cutoff * cutoff, axis=1)


class InteractionGroupTraj:
    """Padded near-shell trajectory storage + U_ig evaluators
    (ref interaction_group_traj.py:55-191)."""

    def __init__(self, xs, box_diags, ligand_idxs, env_idxs, cutoff=1.2, verbose=True):
        self.cutoff = cutoff
        self.ligand_idxs = np.asarray(ligand_idxs)
        env_idxs = np.asarray(env_idxs)

        xs = np.asarray(xs)
        self.n_frames = xs.shape[0]
        self.box_diags = np.asarray(box_diags)
        self.xs_lig = xs[:, self.ligand_idxs]
        xs_env_full = xs[:, env_idxs]

        if verbose:
            print(
                f"precomputing neighborlist on ({len(self.ligand_idxs)}, {len(env_idxs)}) "
                f"interaction group, at cutoff={cutoff}"
            )

        # one frame at a time: bounds device memory at (num_env, num_lig)
        shell = np.stack(
            [
                np.asarray(env_mask_within_cutoff(xs_env_full[f], self.xs_lig[f], np.diag(self.box_diags[f]), cutoff))
                for f in range(self.n_frames)
            ]
        )
        per_frame = shell.sum(axis=1)
        width = int(per_frame.max())  # pad every frame to the worst shell

        if verbose:
            kept = width + len(self.ligand_idxs)
            print(
                f"saving {(xs.shape[1] / kept):.2f}x on storage (relative to storing all env atoms); "
                f"padding to max_nbrs = {width} (~{width / per_frame.mean():.2f}x larger than unpadded)"
            )

        # per frame: the `width` highest-mask env positions = all in-shell
        # atoms plus arbitrary out-of-shell padding (gated to zero energy by
        # the pair function's cutoff)
        if width:
            take = np.argpartition(shell, len(env_idxs) - width, axis=1)[:, -width:]
        else:
            take = np.empty((self.n_frames, 0), dtype=np.int64)  # ligand never sees the env
        self.selected_env_idxs = env_idxs[take].astype(np.uint32)
        self.xs_env = np.take_along_axis(xs_env_full, take[:, :, None], axis=1)

    # --- serialization -----------------------------------------------------

    def to_dict(self):
        return {name: np.asarray(getattr(self, name)) for name in _TRAJ_FIELDS}

    @classmethod
    def from_dict(cls, archive):
        traj = cls.__new__(cls)
        for name in _TRAJ_FIELDS:
            setattr(traj, name, archive[name])
        traj.n_frames = len(traj.xs_env)
        return traj

    def to_npz(self, fname):
        np.savez_compressed(fname, **self.to_dict())

    @classmethod
    def from_npz(cls, fname):
        return cls.from_dict(np.load(fname, allow_pickle=False))

    # --- evaluation ---------------------------------------------------------

    def make_U_fxn(self, pair_fxn: PairFxn):
        """params -> [U_ig(frame; params) for frame in traj]
        (ref interaction_group_traj.py:151-191)."""
        # pair_fxn lifted to the (lig x env) grid of one frame
        grid_fxn = vmap(vmap(pair_fxn, (0, None, 0, None, None)), (None, 0, None, 0, None))
        lig_idxs = jnp.asarray(self.ligand_idxs)
        env_idxs = jnp.asarray(self.selected_env_idxs)
        xs_lig = jnp.asarray(self.xs_lig)
        xs_env = jnp.asarray(self.xs_env)
        box_diags = jnp.asarray(self.box_diags)

        @jit
        def compute_Us(nb_params):
            nb_params = jnp.asarray(nb_params)

            def u_frame(x_lig, x_env, idxs, box_diag):
                return jnp.sum(grid_fxn(x_lig, x_env, nb_params[lig_idxs], nb_params[idxs], jnp.diag(box_diag)))

            return vmap(u_frame)(xs_lig, xs_env, env_idxs, box_diags)

        def checked(nb_params):
            Us = compute_Us(nb_params)
            assert Us.shape == (self.n_frames,)
            return Us

        return checked
