"""Hamiltonian replica exchange: permutation sampler + diagnostics.

Parity target: reference timemachine/md/hrex.py. The neighbor-swap batch is
one jitted `lax.scan` over K^3 swap attempts (the Chodera-Shirts "many swaps
per iteration" scheme, JCP 135:194110), operating on the (replica, state)
log-probability matrix that the TPU driver computes fully on device.

The multi-device story (replicas sharded over a Mesh, log_q_kl via
all_gather) lives in timemachine_tpu/parallel/hrex_sharded.py; this module is
the single-host permutation logic both paths share.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Generic, Optional, Sequence, TypeVar

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import entropy

from timemachine_tpu.md.moves import MixtureOfMoves, MonteCarloMove
from timemachine_tpu.utils import batches, not_ragged

Replica = TypeVar("Replica")
Samples = TypeVar("Samples")
StateIdx = int
ReplicaIdx = int


class NeighborSwapMove(MonteCarloMove):
    """Reference (slow-path) swap move at a fixed state pair (ref hrex.py:25-47)."""

    def __init__(self, log_q: Callable, s_a: int, s_b: int):
        super().__init__()
        self.log_q = log_q
        self.s_a = s_a
        self.s_b = s_b

    def propose(self, state):
        s_a, s_b = self.s_a, self.s_b
        proposed = list(state)
        proposed[s_a], proposed[s_b] = state[s_b], state[s_a]
        r_a, r_b = state[s_a], state[s_b]
        log_q_diff = self.log_q(r_a, s_b) + self.log_q(r_b, s_a) - self.log_q(r_a, s_a) - self.log_q(r_b, s_b)
        return proposed, np.minimum(log_q_diff, 0.0)


@jax.jit
def _run_neighbor_swaps(replica_idx_by_state, neighbor_pairs, log_q_kl, pair_idxs, uniform_samples):
    """Batch of sequential swap attempts as one scan (ref hrex.py:50-128)."""

    def swap(carry, inputs):
        replica_idx_by_state, proposed, accepted = carry
        pair_idx, u = inputs
        s_a, s_b = neighbor_pairs[pair_idx]
        proposed = proposed.at[pair_idx].add(1)
        r_a = replica_idx_by_state[s_a]
        r_b = replica_idx_by_state[s_b]
        log_q_diff = log_q_kl[r_a, s_b] + log_q_kl[r_b, s_a] - log_q_kl[r_a, s_a] - log_q_kl[r_b, s_b]
        is_accepted = u < jnp.exp(jnp.minimum(log_q_diff, 0.0))
        new_perm = jnp.where(
            is_accepted,
            replica_idx_by_state.at[s_a].set(r_b).at[s_b].set(r_a),
            replica_idx_by_state,
        )
        accepted = accepted.at[pair_idx].add(is_accepted.astype(jnp.uint32))
        return (new_perm, proposed, accepted), None

    n_pairs = neighbor_pairs.shape[0]
    init = (replica_idx_by_state, jnp.zeros(n_pairs, jnp.uint32), jnp.zeros(n_pairs, jnp.uint32))
    (replica_idx_by_state, proposed, accepted), _ = jax.lax.scan(swap, init, (pair_idxs, uniform_samples))
    return replica_idx_by_state, proposed, accepted


@dataclass(frozen=True)
class HREX(Generic[Replica]):
    replicas: list
    replica_idx_by_state: list

    @classmethod
    def from_replicas(cls, replicas: Sequence) -> "HREX":
        return HREX(list(replicas), list(range(len(replicas))))

    def sample_replicas(self, sample_replica: Callable, replica_from_samples: Callable):
        samples_by_state = [sample_replica(replica, state_idx) for state_idx, replica in self.state_replica_pairs]
        replicas_by_state = [replica_from_samples(s) for s in samples_by_state]
        replicas = list(self.replicas)
        for state_idx, replica in enumerate(replicas_by_state):
            replicas[self.replica_idx_by_state[state_idx]] = replica
        return HREX(replicas, self.replica_idx_by_state), samples_by_state

    def attempt_neighbor_swaps(self, neighbor_pairs, log_q: Callable, n_swap_attempts: int):
        """Reference path via MixtureOfMoves (ref hrex.py:155-188)."""
        move = MixtureOfMoves([NeighborSwapMove(log_q, s_a, s_b) for s_a, s_b in neighbor_pairs])
        replica_idx_by_state = move.move_n(list(self.replica_idx_by_state), n_swap_attempts)
        fraction_accepted_by_pair = list(zip(move.n_accepted_by_move, move.n_proposed_by_move))
        return HREX(self.replicas, replica_idx_by_state), fraction_accepted_by_pair

    def attempt_neighbor_swaps_fast(self, neighbor_pairs, log_q_kl, n_swap_attempts: int, seed: int):
        """Jitted scan path (ref hrex.py:190-234)."""
        key = jax.random.key(seed)
        key, subkey = jax.random.split(key)
        pair_idxs = jax.random.choice(subkey, len(neighbor_pairs), (n_swap_attempts,))
        uniform_samples = jax.random.uniform(key, (n_swap_attempts,))
        perm, proposed, accepted = _run_neighbor_swaps(
            jnp.asarray(self.replica_idx_by_state),
            jnp.asarray(np.asarray(neighbor_pairs)),
            jnp.asarray(log_q_kl),
            pair_idxs,
            uniform_samples,
        )
        return (
            HREX(self.replicas, [int(i) for i in np.asarray(perm)]),
            list(zip(np.asarray(accepted).tolist(), np.asarray(proposed).tolist())),
        )

    @property
    def state_replica_pairs(self):
        return [(i, self.replicas[r]) for i, r in enumerate(self.replica_idx_by_state)]


def get_normalized_kl_divergence(replica_idx_by_state_by_iter) -> float:
    """Uniformity-of-state-visits heuristic; 0 = perfectly uniform
    (ref hrex.py:241-262)."""
    cumulative = get_cumulative_replica_state_counts(replica_idx_by_state_by_iter)
    n_iters, n_states, _ = cumulative.shape
    fraction = cumulative[-1] / n_iters
    return -np.mean(entropy(fraction, axis=0)) + np.log(n_states)


def get_cumulative_replica_state_counts(replica_idx_by_state_by_iter):
    """(iter, state, replica) -> cumulative occupancy (ref hrex.py:265-278)."""
    arr = np.array(replica_idx_by_state_by_iter)
    _, n_states = arr.shape
    states = np.arange(n_states)
    replica_in_state = arr[:, :, None] == states
    return np.cumsum(replica_in_state.astype(int), axis=0)


def estimate_transition_matrix(replica_idx_by_state_by_iter):
    """Doubly-stochastic (to, from) state transition estimate
    (ref hrex.py:281-305)."""
    arr = np.array(replica_idx_by_state_by_iter)
    n_iters, _ = arr.shape
    transition_by_iter = arr[:-1, None, :] == arr[1:, :, None]
    return np.sum(transition_by_iter, axis=0) / (n_iters - 1)


def estimate_relaxation_time(transition_matrix) -> float:
    """1 / (1 - mu_2) of the symmetrized transition matrix (ref hrex.py:308-330)."""
    assert np.allclose(np.sum(transition_matrix, axis=0), 1.0), "columns of transition matrix must sum to 1"
    sym = (transition_matrix + transition_matrix.T) / 2.0
    eigvals = np.linalg.eigvalsh(sym)
    return 1 / (1 - eigvals[-2])


def get_samples_by_iter_by_replica(samples_by_state_by_iter, replica_idx_by_state_by_iter):
    """(iter, state) -> samples reshaped to (replica, iter) -> samples
    (ref hrex.py:333-356)."""
    assert len(samples_by_state_by_iter) == len(replica_idx_by_state_by_iter)
    assert not_ragged(samples_by_state_by_iter)
    assert not_ragged(replica_idx_by_state_by_iter)
    samples_by_replica_by_iter = [
        [samples_by_state[state_idx] for state_idx in np.argsort(replica_idx_by_state)]
        for samples_by_state, replica_idx_by_state in zip(samples_by_state_by_iter, replica_idx_by_state_by_iter)
    ]
    return [list(xs) for xs in zip(*samples_by_replica_by_iter)]


@dataclass
class HREXDiagnostics:
    replica_idx_by_state_by_iter: list
    fraction_accepted_by_pair_by_iter: list

    @property
    def cumulative_swap_acceptance_rates(self):
        n_accepted, n_proposed = np.moveaxis(np.array(self.fraction_accepted_by_pair_by_iter), -1, 0)
        return np.cumsum(n_accepted, axis=0) / np.cumsum(n_proposed, axis=0)

    @property
    def cumulative_replica_state_counts(self):
        return get_cumulative_replica_state_counts(self.replica_idx_by_state_by_iter)

    @property
    def transition_matrix(self):
        return estimate_transition_matrix(self.replica_idx_by_state_by_iter)

    @property
    def relaxation_time(self):
        return estimate_relaxation_time(self.transition_matrix)

    @property
    def normalized_kl_divergence(self):
        return get_normalized_kl_divergence(self.replica_idx_by_state_by_iter)


def get_swap_attempts_per_iter_heuristic(n_states: int) -> int:
    """K^3 (ref hrex.py:386-394, JCP 135:194110)."""
    return n_states**3


def run_hrex(
    replicas,
    sample_replica: Callable,
    replica_from_samples: Callable,
    neighbor_pairs,
    get_log_q: Callable,
    n_samples: int,
    n_samples_per_iter: int,
    seed: int,
    n_swap_attempts_per_iter: Optional[int] = None,
):
    """Generic HREX driver (ref hrex.py:397-491)."""
    n_replicas = len(replicas)
    if n_swap_attempts_per_iter is None:
        n_swap_attempts_per_iter = get_swap_attempts_per_iter_heuristic(n_replicas)

    hrex = HREX.from_replicas(replicas)
    samples_by_state_by_iter = []
    replica_idx_by_state_by_iter = []
    fraction_accepted_by_pair_by_iter = []

    for iteration, n_samples_batch in enumerate(batches(n_samples, n_samples_per_iter)):
        log_q = get_log_q(hrex.replicas)
        log_q_kl = (
            jnp.array([[log_q(r, s) for s in range(n_replicas)] for r in range(n_replicas)])
            if callable(log_q)
            else log_q
        )
        hrex, fraction_accepted_by_pair = hrex.attempt_neighbor_swaps_fast(
            neighbor_pairs, log_q_kl, n_swap_attempts_per_iter, seed + iteration
        )
        hrex, samples_by_state = hrex.sample_replicas(
            lambda replica, state_idx: sample_replica(replica, state_idx, n_samples_batch), replica_from_samples
        )
        fraction_accepted_by_pair_by_iter.append(fraction_accepted_by_pair)
        replica_idx_by_state_by_iter.append(hrex.replica_idx_by_state)
        samples_by_state_by_iter.append(samples_by_state)

    return samples_by_state_by_iter, HREXDiagnostics(replica_idx_by_state_by_iter, fraction_accepted_by_pair_by_iter)
