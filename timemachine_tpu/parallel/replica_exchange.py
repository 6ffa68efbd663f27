"""Replica-parallel HREX: the production sampling engine.

This replaces the reference's time-multiplexed HREX inner loop
(timemachine/fe/free_energy.py:1383-1531 — one Context, per-replica
set_params/set_x_t swaps and a host round-trip per replica per frame) with a
single device program per HREX iteration:

* all K replicas advance their MD segments TOGETHER — the full production
  step (integrator + barostat + water-exchange movers, from
  md/context.Context's step function) vmapped over a leading replica axis,
  sharded over a `jax.sharding.Mesh` axis "replica" when one is given
  (XLA partitions the vmapped batch across devices, one slice per device,
  collectives riding ICI),
* the banded replica-state energy matrix U[r, l] (|l − state(r)| ≤
  max_delta_states, +inf outside — the same neighbor-window convention as
  the reference's execute_batch_sparse path) is computed on device,
* the neighbor-swap scan (md/hrex.neighbor_swap_scan) runs inside the same
  program; replicas never migrate between devices — only the K-vector state
  assignment and the parameter rows each replica reads are permuted.

The host sees one transfer per iteration: the frames, ordered by state.

Randomness: replica r draws noise from fold_in(fold_in(master, r), t) with t
the global step index — independent streams per replica, chunking-invariant,
no cross-replica seed collisions (the reference derives per-segment seeds as
state_idx + frame, which collide along anti-diagonals).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.md.hrex import draw_swap_randomness, neighbor_swap_scan


def make_replica_mesh(devices=None, axis_name: str = "replica") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


@dataclass
class IterationResult:
    """One HREX iteration's host-visible outputs (everything state-ordered)."""

    frames_by_state: np.ndarray  # (K, N, 3)
    boxes_by_state: np.ndarray  # (K, 3, 3)
    replica_idx_by_state: np.ndarray  # (K,) permutation DURING the segment
    accepted_by_pair: np.ndarray  # (n_pairs,)
    proposed_by_pair: np.ndarray  # (n_pairs,)
    U_kl: np.ndarray  # (K, K) replica-by-state energies (inf outside band)


class ReplicaExchangeRunner:
    """Drives K alchemical states of one topology, replica-parallel.

    Built from a template Context (defines potentials, integrator, movers)
    plus per-state parameter lists. All states must be potentials-compatible
    (identical term topology, different parameters) — the standard HREX
    ladder contract.
    """

    def __init__(
        self,
        context,
        params_list_by_state: Sequence[Sequence],
        *,
        temperature: float,
        neighbor_pairs,
        n_swap_attempts_per_iter: int,
        max_delta_states: Optional[int],
        seed: int,
        water_params_by_state=None,
        mesh: Optional[Mesh] = None,
    ):
        from timemachine_tpu.md.exchange.targeted_insertion import TIBDExchangeMove

        self._context = context
        self.n_states = len(params_list_by_state)
        self.kT = BOLTZ * temperature
        self.neighbor_pairs = jnp.asarray(np.asarray(neighbor_pairs))
        self.n_swap_attempts = n_swap_attempts_per_iter
        self.max_delta = max_delta_states if max_delta_states is not None else self.n_states
        self.mesh = mesh

        n_pots = len(context.potentials)
        self._params_by_state = [
            jnp.stack([jnp.asarray(pls[i]) for pls in params_list_by_state]) for i in range(n_pots)
        ]
        self._water_params = (
            jnp.stack([jnp.asarray(w) for w in water_params_by_state])
            if water_params_by_state is not None
            else None
        )
        self._water_mover_idx = [
            i for i, m in enumerate(context.movers) if isinstance(m, TIBDExchangeMove)
        ]

        master = jax.random.key(seed)
        self._replica_keys = jax.vmap(lambda r: jax.random.fold_in(master, r))(
            jnp.arange(self.n_states)
        )
        self._swap_key_base = jax.random.fold_in(master, 2**31 - 1)

        self._runner_cache: dict = {}
        # dynamic state, populated by initialize()
        self.xs = self.vs = self.boxes = None
        self.mover_states = None
        self.perm = np.arange(self.n_states)
        self.t = 0
        self.iteration = 0

    # -- setup ----------------------------------------------------------------

    def initialize(self, xs0, vs0, boxes0):
        """Stack per-replica dynamic state; replica r starts at state r."""
        K = self.n_states
        assert len(xs0) == K
        self.xs = jnp.asarray(np.asarray(xs0))
        self.vs = jnp.asarray(np.asarray(vs0))
        self.boxes = jnp.asarray(np.asarray(boxes0))

        ctx = self._context
        per_state_mover_states = []
        for k in range(K):
            states_k = list(m.init_state() for m in ctx.movers)
            if self._water_params is not None:
                for i in self._water_mover_idx:
                    states_k[i] = states_k[i]._replace(
                        params=jnp.asarray(self._water_params[k], states_k[i].params.dtype)
                    )
            per_state_mover_states.append(tuple(states_k))
        if ctx.movers:
            self.mover_states = jax.tree.map(
                lambda *leaves: jnp.stack(leaves), *per_state_mover_states
            )
        else:
            self.mover_states = ()
        self.perm = np.arange(K)
        self.t = 0
        self.iteration = 0

    # -- compiled iteration ---------------------------------------------------

    def _constrain(self, tree):
        if self.mesh is None:
            return tree
        sharding = NamedSharding(self.mesh, P("replica"))
        return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, sharding), tree)

    def _generation(self) -> int:
        return self._context._runner_cache.get("_gen", 0)

    def _bump_generation(self):
        # Context.set_barostat_interval clears ctx._runner_cache; key our own
        # cache on a generation counter so stale step closures are dropped
        self._context._runner_cache["_gen"] = self._generation() + 1

    def _get_iteration_fn(self, n_steps: int, with_swaps: bool):
        cache_key = (n_steps, with_swaps, self._generation())
        if cache_key in self._runner_cache:
            return self._runner_cache[cache_key]

        ctx = self._context
        step_fn = ctx._make_step_fn()
        energy_fn = ctx._energy_fn
        providers = {i: ctx.potentials[i].md_force_provider() for i in ctx._stateful_provider_idx}
        prov_init_fns = {i: prov[0] for i, prov in providers.items()}
        # tile-reusing cross-params energies for the banded U_kl (provider
        # tuple slot 4); fall back to the full potential call otherwise
        prov_u_params = {i: prov[4] for i, prov in providers.items() if len(prov) > 4}
        prov_order = sorted(prov_init_fns.keys())
        params_by_state = self._params_by_state
        water_params = self._water_params
        water_idx = self._water_mover_idx
        K = self.n_states
        kT = self.kT
        delta = min(self.max_delta, K - 1)
        neighbor_pairs = self.neighbor_pairs
        n_attempts = self.n_swap_attempts

        def gather_params(state_of_replica):
            return [P_[state_of_replica] for P_ in params_by_state]

        def segment(x, v, box, t0, mstates, plist, rkey):
            # stateful providers (Pallas tile lists) rebuild here, per
            # iteration, from the replica's CURRENT params — mirroring
            # Context.multiple_steps, and necessary because swaps re-point
            # replicas at different parameter rows
            pstates = tuple(prov_init_fns[i](x, plist[i], box) for i in prov_order)

            def body(carry, _):
                return step_fn(carry, plist, rkey)

            carry = (x, v, box, t0, mstates, pstates)
            (x, v, box, _, mstates, pstates), _ = jax.lax.scan(body, carry, None, length=n_steps)
            return x, v, box, mstates, pstates

        def total_energy(x, box, plist, pstates):
            """Full potential energy; stateful providers reuse their (fresh,
            in-skin) tile lists with the target state's parameter rows."""
            u = 0.0
            for i, pot in enumerate(ctx.potentials):
                if i in prov_u_params:
                    u = u + prov_u_params[i](pstates[prov_order.index(i)], x, plist[i], box)
                else:
                    u = u + pot(x, plist[i], box)
            return u

        def banded_energies(x, box, s_r, pstates):
            """One replica's energies at its 2Δ+1 neighboring states."""
            cols = jnp.clip(s_r + jnp.arange(-delta, delta + 1), 0, K - 1)
            u = jax.vmap(lambda c: total_energy(x, box, gather_params(c), pstates))(cols)
            return jnp.full((K,), jnp.inf, u.dtype).at[cols].set(u)

        @jax.jit
        def run(xs, vs, boxes, t0, mover_states, perm, iteration, replica_keys):
            state_of_replica = jnp.argsort(perm)
            params_r = gather_params(state_of_replica)
            if water_params is not None:
                mover_states = list(mover_states)
                for i in water_idx:
                    mover_states[i] = mover_states[i]._replace(
                        params=water_params[state_of_replica].astype(mover_states[i].params.dtype)
                    )
                mover_states = tuple(mover_states)

            xs, vs, boxes, mover_states, pstates = jax.vmap(segment, in_axes=(0, 0, 0, None, 0, 0, 0))(
                self._constrain(xs),
                self._constrain(vs),
                boxes,
                t0,
                mover_states,
                params_r,
                replica_keys,
            )
            xs = self._constrain(xs)
            vs = self._constrain(vs)

            if not with_swaps:
                return xs, vs, boxes, mover_states, perm

            frames_by_state = xs[perm]
            boxes_by_state = boxes[perm]

            U = jax.vmap(banded_energies)(xs, boxes, state_of_replica, pstates)
            U = jnp.where(jnp.isnan(U), jnp.inf, U)
            log_q = -U / kT

            pair_idxs, uniforms = draw_swap_randomness(
                jax.random.fold_in(self._swap_key_base, iteration),
                neighbor_pairs.shape[0],
                n_attempts,
            )
            new_perm, accepted, proposed = neighbor_swap_scan(
                perm, log_q, neighbor_pairs, pair_idxs, uniforms
            )
            return (
                xs,
                vs,
                boxes,
                mover_states,
                new_perm,
                frames_by_state,
                boxes_by_state,
                U,
                accepted,
                proposed,
            )

        self._runner_cache[cache_key] = run
        return run

    # -- public stepping ------------------------------------------------------

    def equilibrate(self, n_eq_steps: int, barostat_interval: Optional[int] = 15):
        """Advance all replicas n_eq_steps at their current states — no
        swaps, no frame storage; optionally with a faster barostat."""
        if n_eq_steps <= 0:
            return
        prev = None
        if barostat_interval is not None:
            prev = self._context.set_barostat_interval(barostat_interval)
            if prev is not None and prev != barostat_interval:
                self._bump_generation()
        run = self._get_iteration_fn(n_eq_steps, with_swaps=False)
        self.xs, self.vs, self.boxes, self.mover_states, _ = run(
            self.xs,
            self.vs,
            self.boxes,
            jnp.asarray(self.t, jnp.result_type(int)),
            self.mover_states,
            jnp.asarray(self.perm),
            jnp.asarray(self.iteration),
            self._replica_keys,
        )
        self.t += n_eq_steps
        if prev is not None and prev != barostat_interval:
            self._context.set_barostat_interval(prev)
            self._bump_generation()
        assert np.all(np.isfinite(np.asarray(self.xs))), "Equilibration resulted in a nan"

    def advance_frame(self, n_steps: int) -> IterationResult:
        """One HREX iteration: MD segment + banded U + swap batch."""
        run = self._get_iteration_fn(n_steps, with_swaps=True)
        perm_during_segment = np.asarray(self.perm).copy()
        (
            self.xs,
            self.vs,
            self.boxes,
            self.mover_states,
            new_perm,
            frames,
            fboxes,
            U,
            accepted,
            proposed,
        ) = run(
            self.xs,
            self.vs,
            self.boxes,
            jnp.asarray(self.t, jnp.result_type(int)),
            self.mover_states,
            jnp.asarray(self.perm),
            jnp.asarray(self.iteration),
            self._replica_keys,
        )
        self.perm = np.asarray(new_perm)
        self.t += n_steps
        self.iteration += 1

        U_host = np.asarray(U)
        # replica r sampled at state argsort(perm)[r]; its own-state energy
        # must be finite
        own_state = np.argsort(perm_during_segment)
        self_energies = U_host[np.arange(self.n_states), own_state]
        assert np.all(np.isfinite(self_energies)), "Replicas have non-finite energies"

        return IterationResult(
            frames_by_state=np.asarray(frames),
            boxes_by_state=np.asarray(fboxes),
            replica_idx_by_state=perm_during_segment,
            accepted_by_pair=np.asarray(accepted),
            proposed_by_pair=np.asarray(proposed),
            U_kl=U_host,
        )

    # -- checkpoint / resume ---------------------------------------------------

    def state_dict(self) -> dict:
        """Everything needed to resume EXACTLY (the per-step RNG is a pure
        function of (seed, replica, global step), so a resumed run is
        bitwise-identical to an uninterrupted one — step-level preemption
        tolerance the reference lacks)."""
        leaves, _ = jax.tree.flatten(self.mover_states)
        return {
            "xs": np.asarray(self.xs),
            "vs": np.asarray(self.vs),
            "boxes": np.asarray(self.boxes),
            "mover_leaves": [np.asarray(leaf) for leaf in leaves],
            "perm": np.asarray(self.perm),
            "t": int(self.t),
            "iteration": int(self.iteration),
        }

    def load_state_dict(self, state: dict):
        """Restore from `state_dict()`. The runner must have been constructed
        with the same context/params; mover-state STRUCTURE comes from a
        fresh initialize, leaves from the checkpoint."""
        self.initialize(state["xs"], state["vs"], state["boxes"])
        _, treedef = jax.tree.flatten(self.mover_states)
        self.mover_states = jax.tree.unflatten(
            treedef, [jnp.asarray(leaf) for leaf in state["mover_leaves"]]
        )
        self.xs = jnp.asarray(state["xs"])
        self.vs = jnp.asarray(state["vs"])
        self.boxes = jnp.asarray(state["boxes"])
        self.perm = np.asarray(state["perm"])
        self.t = int(state["t"])
        self.iteration = int(state["iteration"])

    # -- state-ordered observers ----------------------------------------------

    def final_state_arrays(self):
        """(coords, velocities, boxes) ordered by state."""
        perm = np.asarray(self.perm)
        return (
            np.asarray(self.xs)[perm],
            np.asarray(self.vs)[perm],
            np.asarray(self.boxes)[perm],
        )

    def mover_state_field_by_state(self, mover_idx: int, field: str) -> np.ndarray:
        """A per-replica mover-state field, reordered by state."""
        leaf = getattr(self.mover_states[mover_idx], field)
        return np.asarray(leaf)[np.asarray(self.perm)]
