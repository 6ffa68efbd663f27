"""Hamiltonian replica exchange: permutation sampling + mixing diagnostics.

Capability target: reference timemachine/md/hrex.py (generic HREX driver,
neighbor-swap batches per Chodera & Shirts JCP 135:194110, diagnostics).

The swap batch is expressed once, as a pure jitted `lax.scan` over attempts
(`neighbor_swap_scan`), shared by three callers: the generic single-host
driver here, the replica-parallel production sampler
(parallel/replica_exchange.py) where it runs *inside* the per-iteration
device program, and the standalone sharded benchmark driver. Replicas never
move; the K-vector `replica_idx_by_state` (state -> replica) is what swaps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Generic, Optional, Sequence, TypeVar

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import entropy

from timemachine_tpu.md.moves import MixtureOfMoves, MonteCarloMove
from timemachine_tpu.utils import batches, not_ragged

Replica = TypeVar("Replica")


def get_swap_attempts_per_iter_heuristic(n_states: int) -> int:
    """K^3 attempts mixes the permutation chain in one iteration
    (JCP 135:194110)."""
    return n_states**3


def neighbor_swap_scan(replica_idx_by_state, log_q_kl, neighbor_pairs, pair_idxs, uniforms):
    """Sequential Metropolis swap attempts as one scan (pure, jit/vmap-safe).

    replica_idx_by_state: (K,) int — current permutation (state -> replica)
    log_q_kl: (K, K) replica-by-state reduced log probabilities
    neighbor_pairs: (n_pairs, 2) candidate state pairs
    pair_idxs, uniforms: (n_attempts,) pre-drawn pair choices and MH draws

    Returns (final permutation, accepted-per-pair, proposed-per-pair).
    """

    def attempt(carry, inputs):
        perm, n_acc, n_prop = carry
        which, u = inputs
        s_lo, s_hi = neighbor_pairs[which][0], neighbor_pairs[which][1]
        r_lo, r_hi = perm[s_lo], perm[s_hi]
        # ΔlogQ of exchanging which replica sits at which state
        gain = (
            log_q_kl[r_lo, s_hi] + log_q_kl[r_hi, s_lo] - log_q_kl[r_lo, s_lo] - log_q_kl[r_hi, s_hi]
        )
        accept = jnp.log(u) < jnp.minimum(gain, 0.0)
        perm = jnp.where(accept, perm.at[s_lo].set(r_hi).at[s_hi].set(r_lo), perm)
        n_prop = n_prop.at[which].add(1)
        n_acc = n_acc.at[which].add(accept.astype(jnp.uint32))
        return (perm, n_acc, n_prop), None

    n_pairs = neighbor_pairs.shape[0]
    zeros = jnp.zeros(n_pairs, jnp.uint32)
    (perm, n_acc, n_prop), _ = jax.lax.scan(
        attempt, (replica_idx_by_state, zeros, zeros), (pair_idxs, uniforms)
    )
    return perm, n_acc, n_prop


_run_neighbor_swaps = jax.jit(neighbor_swap_scan)


def draw_swap_randomness(key_or_seed, n_pairs: int, n_attempts: int):
    """(pair choices, MH uniforms) for one swap batch, from a key or seed."""
    key = key_or_seed if isinstance(key_or_seed, jax.Array) else jax.random.key(key_or_seed)
    k_pick, k_mh = jax.random.split(key)
    return (
        jax.random.choice(k_pick, n_pairs, (n_attempts,)),
        jax.random.uniform(k_mh, (n_attempts,)),
    )


class NeighborSwapMove(MonteCarloMove):
    """Python-oracle swap move at one fixed state pair (slow path, used to
    cross-check the scan statistically)."""

    def __init__(self, log_q: Callable, s_a: int, s_b: int):
        super().__init__()
        self.log_q = log_q
        self.s_a = s_a
        self.s_b = s_b

    def propose(self, state):
        a, b = self.s_a, self.s_b
        swapped = list(state)
        swapped[a], swapped[b] = state[b], state[a]
        gain = (
            self.log_q(state[a], b)
            + self.log_q(state[b], a)
            - self.log_q(state[a], a)
            - self.log_q(state[b], b)
        )
        return swapped, np.minimum(gain, 0.0)


@dataclass(frozen=True)
class HREX(Generic[Replica]):
    replicas: list
    replica_idx_by_state: list

    @classmethod
    def from_replicas(cls, replicas: Sequence) -> "HREX":
        return HREX(list(replicas), list(range(len(replicas))))

    @property
    def state_replica_pairs(self):
        return [(s, self.replicas[r]) for s, r in enumerate(self.replica_idx_by_state)]

    def sample_replicas(self, sample_replica: Callable, replica_from_samples: Callable):
        """Advance every (state, replica) pairing one segment; returns the
        updated ensemble and per-state samples."""
        samples_by_state = [sample_replica(replica, s) for s, replica in self.state_replica_pairs]
        replicas = list(self.replicas)
        for s, samples in enumerate(samples_by_state):
            replicas[self.replica_idx_by_state[s]] = replica_from_samples(samples)
        return HREX(replicas, self.replica_idx_by_state), samples_by_state

    def attempt_neighbor_swaps(self, neighbor_pairs, log_q: Callable, n_swap_attempts: int):
        """Oracle path: sequential Python moves through MixtureOfMoves."""
        move = MixtureOfMoves([NeighborSwapMove(log_q, a, b) for a, b in neighbor_pairs])
        perm = move.move_n(list(self.replica_idx_by_state), n_swap_attempts)
        stats = list(zip(move.n_accepted_by_move, move.n_proposed_by_move))
        return HREX(self.replicas, perm), stats

    def attempt_neighbor_swaps_fast(self, neighbor_pairs, log_q_kl, n_swap_attempts: int, seed: int):
        """Production path: the jitted scan."""
        pair_idxs, uniforms = draw_swap_randomness(seed, len(neighbor_pairs), n_swap_attempts)
        perm, n_acc, n_prop = _run_neighbor_swaps(
            jnp.asarray(self.replica_idx_by_state),
            jnp.asarray(log_q_kl),
            jnp.asarray(np.asarray(neighbor_pairs)),
            pair_idxs,
            uniforms,
        )
        stats = list(zip(np.asarray(n_acc).tolist(), np.asarray(n_prop).tolist()))
        return HREX(self.replicas, [int(r) for r in np.asarray(perm)]), stats


# -- diagnostics --------------------------------------------------------------


def get_cumulative_replica_state_counts(replica_idx_by_state_by_iter) -> np.ndarray:
    """(iter, state, replica) cumulative visit counts."""
    perms = np.asarray(replica_idx_by_state_by_iter)  # (T, K): state -> replica
    n_iters, n_states = perms.shape
    occupancy = np.zeros((n_iters, n_states, n_states), dtype=int)
    t_idx = np.repeat(np.arange(n_iters), n_states)
    s_idx = np.tile(np.arange(n_states), n_iters)
    occupancy[t_idx, s_idx, perms.reshape(-1)] = 1
    return occupancy.cumsum(axis=0)


def get_normalized_kl_divergence(replica_idx_by_state_by_iter) -> float:
    """How non-uniformly replicas visit states: mean KL(visit dist ‖ uniform)
    scaled so 0 = perfect mixing, log(K) = frozen."""
    visits = get_cumulative_replica_state_counts(replica_idx_by_state_by_iter)[-1]
    n_states = visits.shape[0]
    visit_fraction = visits / visits.sum(axis=0, keepdims=True)
    return float(np.log(n_states) - entropy(visit_fraction, axis=0).mean())


def estimate_transition_matrix(replica_idx_by_state_by_iter) -> np.ndarray:
    """(to_state, from_state) single-iteration transition probabilities,
    counted over every replica's state track."""
    perms = np.asarray(replica_idx_by_state_by_iter)
    n_iters, n_states = perms.shape
    # state_track[t, r] = state of replica r at iteration t
    state_track = np.argsort(perms, axis=1)
    counts = np.zeros((n_states, n_states))
    np.add.at(counts, (state_track[1:].reshape(-1), state_track[:-1].reshape(-1)), 1.0)
    return counts / (n_iters - 1)


def estimate_relaxation_time(transition_matrix) -> float:
    """1/(1 − μ₂) of the symmetrized transition matrix."""
    assert np.allclose(transition_matrix.sum(axis=0), 1.0), "columns of transition matrix must sum to 1"
    reversible = 0.5 * (transition_matrix + transition_matrix.T)
    mu = np.linalg.eigvalsh(reversible)
    return float(1.0 / (1.0 - mu[-2]))


def get_samples_by_iter_by_replica(samples_by_state_by_iter, replica_idx_by_state_by_iter):
    """Regroup (iter, state)-indexed samples into (replica, iter) tracks."""
    assert len(samples_by_state_by_iter) == len(replica_idx_by_state_by_iter)
    assert not_ragged(samples_by_state_by_iter)
    assert not_ragged(replica_idx_by_state_by_iter)
    tracks = []
    state_of_replica = np.argsort(np.asarray(replica_idx_by_state_by_iter), axis=1)
    n_replicas = state_of_replica.shape[1]
    for r in range(n_replicas):
        tracks.append(
            [samples_by_state[state_of_replica[t, r]] for t, samples_by_state in enumerate(samples_by_state_by_iter)]
        )
    return tracks


@dataclass
class HREXDiagnostics:
    replica_idx_by_state_by_iter: list
    fraction_accepted_by_pair_by_iter: list

    @property
    def cumulative_swap_acceptance_rates(self) -> np.ndarray:
        stats = np.asarray(self.fraction_accepted_by_pair_by_iter)  # (T, n_pairs, 2)
        accepted = stats[..., 0].cumsum(axis=0)
        proposed = stats[..., 1].cumsum(axis=0)
        return accepted / proposed

    @property
    def cumulative_replica_state_counts(self) -> np.ndarray:
        return get_cumulative_replica_state_counts(self.replica_idx_by_state_by_iter)

    @property
    def transition_matrix(self) -> np.ndarray:
        return estimate_transition_matrix(self.replica_idx_by_state_by_iter)

    @property
    def relaxation_time(self) -> float:
        return estimate_relaxation_time(self.transition_matrix)

    @property
    def normalized_kl_divergence(self) -> float:
        return get_normalized_kl_divergence(self.replica_idx_by_state_by_iter)


# -- generic single-host driver ----------------------------------------------


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
    """Generic HREX loop over arbitrary replica objects ("fake backend"
    pattern — estimator tests drive this with exact 1D samplers)."""
    n_states = len(replicas)
    if n_swap_attempts_per_iter is None:
        n_swap_attempts_per_iter = get_swap_attempts_per_iter_heuristic(n_states)

    ensemble = HREX.from_replicas(replicas)
    samples_by_state_by_iter = []
    perm_by_iter = []
    swap_stats_by_iter = []

    for iteration, batch in enumerate(batches(n_samples, n_samples_per_iter)):
        log_q = get_log_q(ensemble.replicas)
        log_q_kl = (
            jnp.array([[log_q(r, s) for s in range(n_states)] for r in range(n_states)])
            if callable(log_q)
            else log_q
        )
        ensemble, swap_stats = ensemble.attempt_neighbor_swaps_fast(
            neighbor_pairs, log_q_kl, n_swap_attempts_per_iter, seed + iteration
        )
        ensemble, samples_by_state = ensemble.sample_replicas(
            lambda replica, s: sample_replica(replica, s, batch), replica_from_samples
        )
        samples_by_state_by_iter.append(samples_by_state)
        perm_by_iter.append(ensemble.replica_idx_by_state)
        swap_stats_by_iter.append(swap_stats)

    return samples_by_state_by_iter, HREXDiagnostics(perm_by_iter, swap_stats_by_iter)
