"""Multi-device HREX over a bare (u_fn, params-ladder) interface.

NOTE: the PRODUCTION replica-parallel engine is
parallel/replica_exchange.ReplicaExchangeRunner (full Context step with
movers, banded U_kl, InitialState-driven; wired into
fe/free_energy.run_sims_hrex). This module is the minimal standalone
variant used by bench_hrex.py and kernel-level mesh tests — whole HREX
iterations in ONE lax.scan with zero host involvement, for measuring the
pure scaling envelope. Contrast with the reference's driver
(free_energy.py:1383-1531): replicas TIME-MULTIPLEXED on one GPU — one
Context, set_params/set_x_t swaps per frame and host round-trips every
iteration. Here:

* replica state (K, N, 3) lives sharded over the mesh axis "replica"; each
  device integrates its replicas' MD segments in parallel (vmap over the
  sharded axis — XLA partitions it),
* the (K, K) log_q matrix is computed on device (vmap over states) and
  implicitly all-gathered by XLA (it is tiny),
* the neighbor-swap scan runs replicated and deterministically on every
  device — replicas never move between devices; only their STATE ASSIGNMENT
  (a K-vector) and the per-state parameter rows they read are permuted,
* whole iterations (MD segment + U_kl + swaps) run inside ONE jit; the host
  sees only the emitted frames. This removes the per-frame host round-trip
  that bounds the reference's HREX overhead (SURVEY §7 hard part 5).

Runs unchanged on 1 device (everything local) and on N devices
(xla_force_host_platform_device_count for tests; real slices in production).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from timemachine_tpu.constants import BOLTZ


def make_replica_mesh(devices=None, axis_name: str = "replica") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


@dataclass
class ShardedHREXResult:
    frames: np.ndarray  # (n_iters, K, N, 3) coords by state
    boxes: np.ndarray  # (n_iters, K, 3, 3)
    replica_idx_by_state_by_iter: np.ndarray  # (n_iters, K)
    accepted_by_pair_by_iter: np.ndarray  # (n_iters, n_pairs)
    proposed_by_pair_by_iter: np.ndarray  # (n_iters, n_pairs)
    final_coords: np.ndarray  # (K, N, 3) by replica
    final_velocities: np.ndarray
    final_boxes: np.ndarray
    log_q_kl_by_iter: np.ndarray  # (n_iters, K, K) replica-state reduced log-probs


def run_hrex_sharded(
    u_fn: Callable,  # (x, box, params) -> potential energy (kJ/mol)
    params_by_state,  # (K, P) flat parameter rows per λ state
    xs0,  # (K, N, 3) initial coords per replica
    vs0,  # (K, N, 3)
    boxes0,  # (K, 3, 3)
    masses,  # (N,)
    temperature: float,
    dt: float,
    friction: float,
    n_iters: int,
    steps_per_iter: int,
    neighbor_pairs,  # (n_pairs, 2)
    n_swap_attempts_per_iter: int,
    seed: int,
    mesh: Optional[Mesh] = None,
    barostat_move: Optional[Callable] = None,
    barostat_interval: int = 0,
) -> ShardedHREXResult:
    """Run HREX fully on device. Replica r always integrates on its home
    device; swapping exchanges which parameter row each replica reads."""
    from timemachine_tpu.integrators import langevin_coefficients

    params_by_state = jnp.asarray(params_by_state)
    k_states = params_by_state.shape[0]
    xs0 = jnp.asarray(xs0)
    vs0 = jnp.asarray(vs0)
    boxes0 = jnp.asarray(boxes0)
    neighbor_pairs = jnp.asarray(np.asarray(neighbor_pairs))
    kt = BOLTZ * temperature

    ca, cb, cc = langevin_coefficients(temperature, dt, friction, np.asarray(masses))
    cb = jnp.asarray(cb[:, None], xs0.dtype)
    cc = jnp.asarray(cc[:, None], xs0.dtype)

    base_key = jax.random.key(seed)

    grad_u = jax.grad(u_fn)

    def md_segment(x, v, box, params, replica_key, iter_idx):
        def step(carry, t):
            x, v = carry
            key_t = jax.random.fold_in(replica_key, t)
            force = -grad_u(x, box, params)
            noise = jax.random.normal(key_t, x.shape, dtype=x.dtype)
            v_mid = v + cb * force
            v_new = ca * v_mid + cc * noise
            x_new = x + 0.5 * dt * (v_mid + v_new)
            return (x_new, v_new), None

        t0 = iter_idx * steps_per_iter
        (x, v), _ = jax.lax.scan(step, (x, v), t0 + jnp.arange(steps_per_iter))
        return x, v, box

    def swap_scan(replica_idx_by_state, log_q_kl, key):
        k1, k2 = jax.random.split(key)
        pair_idxs = jax.random.choice(k1, len(neighbor_pairs), (n_swap_attempts_per_iter,))
        uniforms = jax.random.uniform(k2, (n_swap_attempts_per_iter,))

        def swap(carry, inputs):
            perm, proposed, accepted = carry
            pair_idx, u = inputs
            s_a, s_b = neighbor_pairs[pair_idx][0], neighbor_pairs[pair_idx][1]
            proposed = proposed.at[pair_idx].add(1)
            r_a, r_b = perm[s_a], perm[s_b]
            log_q_diff = log_q_kl[r_a, s_b] + log_q_kl[r_b, s_a] - log_q_kl[r_a, s_a] - log_q_kl[r_b, s_b]
            ok = u < jnp.exp(jnp.minimum(log_q_diff, 0.0))
            perm = jnp.where(ok, perm.at[s_a].set(r_b).at[s_b].set(r_a), perm)
            accepted = accepted.at[pair_idx].add(ok.astype(jnp.uint32))
            return (perm, proposed, accepted), None

        init = (
            replica_idx_by_state,
            jnp.zeros(len(neighbor_pairs), jnp.uint32),
            jnp.zeros(len(neighbor_pairs), jnp.uint32),
        )
        (perm, proposed, accepted), _ = jax.lax.scan(swap, init, (pair_idxs, uniforms))
        return perm, proposed, accepted

    replica_sharding = None
    if mesh is not None:
        replica_sharding = NamedSharding(mesh, P("replica"))

    def constrain(t):
        if replica_sharding is None:
            return t
        return jax.lax.with_sharding_constraint(t, replica_sharding)

    def one_iteration(carry, iter_idx):
        xs, vs, boxes, replica_idx_by_state = carry

        # state index of each replica = inverse permutation
        state_by_replica = jnp.zeros(k_states, dtype=replica_idx_by_state.dtype).at[replica_idx_by_state].set(
            jnp.arange(k_states, dtype=replica_idx_by_state.dtype)
        )
        replica_params = params_by_state[state_by_replica]  # (K, P)

        # MD segments, vmapped over replicas (sharded over the mesh)
        iter_key = jax.random.fold_in(base_key, iter_idx)
        replica_keys = jax.random.split(jax.random.fold_in(iter_key, 0), k_states)
        xs, vs, boxes = jax.vmap(md_segment, in_axes=(0, 0, 0, 0, 0, None))(
            constrain(xs), constrain(vs), boxes, replica_params, replica_keys, iter_idx
        )
        xs = constrain(xs)
        vs = constrain(vs)

        # (K replicas, K states) reduced log probabilities
        u_rk = jax.vmap(  # over replicas
            lambda x, box: jax.vmap(lambda p: u_fn(x, box, p))(params_by_state)
        )(xs, boxes)
        log_q_kl = -u_rk / kt
        log_q_kl = jnp.where(jnp.isnan(log_q_kl), -jnp.inf, log_q_kl)

        # deterministic swap scan (replicated; tiny)
        swap_key = jax.random.fold_in(iter_key, 1)
        replica_idx_by_state, proposed, accepted = swap_scan(replica_idx_by_state, log_q_kl, swap_key)

        # emit frames ordered BY STATE (matching the reference's trajectory
        # layout, free_energy.py:1528-1531)
        frames_by_state = xs[replica_idx_by_state]
        boxes_by_state = boxes[replica_idx_by_state]

        return (xs, vs, boxes, replica_idx_by_state), (
            frames_by_state,
            boxes_by_state,
            replica_idx_by_state,
            accepted,
            proposed,
            log_q_kl,
        )

    @jax.jit
    def run(xs, vs, boxes):
        init_perm = jnp.arange(k_states)
        carry = (xs, vs, boxes, init_perm)
        carry, outputs = jax.lax.scan(one_iteration, carry, jnp.arange(n_iters))
        return carry, outputs

    (xs, vs, boxes, _), (frames, frame_boxes, perms, accepted, proposed, log_q_kls) = run(xs0, vs0, boxes0)

    return ShardedHREXResult(
        frames=np.asarray(frames),
        boxes=np.asarray(frame_boxes),
        replica_idx_by_state_by_iter=np.asarray(perms),
        accepted_by_pair_by_iter=np.asarray(accepted),
        proposed_by_pair_by_iter=np.asarray(proposed),
        final_coords=np.asarray(xs),
        final_velocities=np.asarray(vs),
        final_boxes=np.asarray(boxes),
        log_q_kl_by_iter=np.asarray(log_q_kls),
    )
