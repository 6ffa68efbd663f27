"""Monte Carlo barostat (NPT volume moves) + centroid rescaling.

Parity targets: reference `timemachine/cpp/src/barostat.cu` +
`kernels/k_barostat.cuh` (production semantics: adaptive volume-scale factor,
molecule-centroid scaling, Metropolis on w = ΔU + PΔV − N_mol kT ln(V'/V)),
and `timemachine/md/barostat/moves.py:39-82` (CentroidRescaler reference).

TPU design: the barostat is a pure `Mover` — `(state, x, box, key) ->
(state, x', box')` — with its counters/scale factor carried as a small pytree
through the Context's `lax.scan`. Accept/reject is `jnp.where` (both branches
are cheap relative to the two energy evaluations).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.constants import AVOGADRO, BOLTZ


def scatter_idxs_from_group_idxs(group_idxs: Sequence[np.ndarray], n_atoms: int) -> tuple[np.ndarray, np.ndarray]:
    """Flatten molecule groups to (scatter_idxs[atom] -> mol, group_sizes).

    Atoms not in any group get their own singleton implicit group id.
    (ref barostat/moves.py:19-36)"""
    scatter = np.full(n_atoms, -1, dtype=np.int32)
    for mol_id, grp in enumerate(group_idxs):
        scatter[np.asarray(grp)] = mol_id
    n_mols = len(group_idxs)
    for i in range(n_atoms):
        if scatter[i] < 0:
            scatter[i] = n_mols
            n_mols += 1
    sizes = np.bincount(scatter, minlength=n_mols).astype(np.float64)
    return scatter, sizes


class CentroidRescaler:
    """Scale molecule centroids about a center, rigidly displacing each
    molecule (ref barostat/moves.py:39-82). segment_sum keeps it O(N)."""

    def __init__(self, group_idxs, n_atoms: Optional[int] = None):
        if n_atoms is None:
            n_atoms = int(max(int(np.max(np.asarray(g))) for g in group_idxs)) + 1
        self.scatter_idxs, self.group_sizes = scatter_idxs_from_group_idxs(group_idxs, n_atoms)
        self.num_groups = len(self.group_sizes)
        # atoms not in any explicit group are NOT moved (the CUDA barostat only
        # displaces grouped atoms; ref barostat.cu num_grouped_atoms_)
        grouped = np.zeros(n_atoms, dtype=bool)
        for g in group_idxs:
            grouped[np.asarray(g)] = True
        self.grouped_mask = grouped[:, None]

    def compute_centroids(self, coords):
        sums = jax.ops.segment_sum(coords, self.scatter_idxs, num_segments=self.num_groups)
        return sums / jnp.asarray(self.group_sizes, dtype=coords.dtype)[:, None]

    def scale_centroids(self, coords, center, scale):
        centroids = self.compute_centroids(coords)
        displacement = (center + scale * (centroids - center)) - centroids
        return coords + jnp.where(self.grouped_mask, displacement[self.scatter_idxs], 0.0)


class BarostatState(NamedTuple):
    volume_scale: jax.Array  # adaptive ΔV proposal width (nm³)
    n_accepted: jax.Array  # int32, window counter
    n_attempted: jax.Array  # int32, window counter
    total_accepted: jax.Array  # int32, lifetime counter
    total_attempted: jax.Array  # int32


@dataclass(eq=False)
class MonteCarloBarostat:
    """Descriptor (picklable; ref lib/__init__.py:43-62). Build the pure move
    fn with `.make_move_fn(energy_fn)` where energy_fn(x, box) -> scalar U.

    Semantics (ref k_barostat.cuh k_setup_barostat_move / k_decide_move):
      ΔV ~ U(-s, s); s auto-inits to 0.01·V; molecules rigidly displaced so
      centroids scale by (V'/V)^(1/3);
      w = ΔU + P ΔV − N_mol kT ln(V'/V), reject iff w > 0 and u > e^(−w/kT);
      adaptive: per ≥10-attempt window, accept rate < 0.25 → s /= 1.1,
      > 0.75 → s = min(1.1 s, 0.3 V).
    """

    # volume moves displace each molecule rigidly: the Context may evaluate
    # dU with bond-graph-local terms skipped (they cancel exactly)
    rigid_group_move = True

    num_atoms: int
    pressure: float  # bar
    temperature: float  # K
    group_idxs: Sequence[np.ndarray]
    interval: int
    seed: int = 0
    adaptive_scaling_enabled: bool = True
    initial_volume_scale_factor: float = 0.0

    def init_state(self) -> BarostatState:
        # default float dtype: f64 under x64 (CPU tests), f32 on TPU — forcing
        # f64 on TPU would just emit truncation warnings
        return BarostatState(
            volume_scale=jnp.asarray(self.initial_volume_scale_factor, dtype=jnp.result_type(float)),
            n_accepted=jnp.asarray(0, dtype=jnp.int32),
            n_attempted=jnp.asarray(0, dtype=jnp.int32),
            total_accepted=jnp.asarray(0, dtype=jnp.int32),
            total_attempted=jnp.asarray(0, dtype=jnp.int32),
        )

    def make_move_fn(self, energy_fn):
        """energy_fn(x, box) -> scalar potential energy (kJ/mol)."""
        rescaler = CentroidRescaler(self.group_idxs, self.num_atoms)
        num_mols = len(self.group_idxs)
        kt = BOLTZ * self.temperature
        pressure_kj_nm3 = self.pressure * AVOGADRO * 1e-25
        adaptive = self.adaptive_scaling_enabled

        def move(state: BarostatState, x, v, box, key):
            k1, k2 = jax.random.split(key)
            volume = box[0, 0] * box[1, 1] * box[2, 2]
            volume_scale = jnp.where(
                adaptive & (state.volume_scale == 0.0), 0.01 * volume, state.volume_scale
            )
            delta_volume = volume_scale * 2.0 * (jax.random.uniform(k1, dtype=jnp.result_type(float)) - 0.5)
            new_volume = volume + delta_volume
            length_scale = jnp.cbrt(new_volume / volume)

            center = jnp.zeros(3, dtype=x.dtype)  # scale about the origin, like the CUDA impl
            x_prop = rescaler.scale_centroids(x, center, length_scale.astype(x.dtype))
            box_prop = box * length_scale.astype(box.dtype)

            u_init = energy_fn(x, box)
            u_prop = energy_fn(x_prop, box_prop)
            du = u_prop - u_init
            du = jnp.where(jnp.isnan(du), jnp.inf, du)

            w = du + pressure_kj_nm3 * delta_volume - num_mols * kt * jnp.log(new_volume / volume)
            u_rand = jax.random.uniform(k2, dtype=jnp.result_type(float))
            rejected = (w > 0) & (u_rand > jnp.exp(-w / kt))
            accepted = ~rejected

            x_new = jnp.where(accepted, x_prop, x)
            box_new = jnp.where(accepted, box_prop, box)

            n_acc = state.n_accepted + accepted.astype(jnp.int32)
            n_att = state.n_attempted + 1

            def adapt(args):
                vs, na, nt = args
                low = na < 0.25 * nt
                high = na > 0.75 * nt
                vs = jnp.where(low, vs / 1.1, vs)
                vs = jnp.where(high, jnp.minimum(vs * 1.1, 0.3 * volume), vs)
                reset = low | high
                return vs, jnp.where(reset, 0, na), jnp.where(reset, 0, nt)

            vs, na, nt = jax.lax.cond(
                adaptive & (n_att >= 10),
                adapt,
                lambda args: args,
                (volume_scale, n_acc, n_att),
            )

            new_state = BarostatState(
                volume_scale=vs,
                n_accepted=na,
                n_attempted=nt,
                total_accepted=state.total_accepted + accepted.astype(jnp.int32),
                total_attempted=state.total_attempted + 1,
            )
            return new_state, x_new, v, box_new

        return move

    def impl(self, *_args):
        return self
