"""HREX permutation sampler + sharded multi-device HREX tests
(mirrors reference tests/hrex/test_hrex_1d.py + the TPU-native sharded
driver's correctness on a virtual 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.md.hrex import (
    HREX,
    HREXDiagnostics,
    estimate_relaxation_time,
    estimate_transition_matrix,
    get_normalized_kl_divergence,
    get_swap_attempts_per_iter_heuristic,
    run_hrex,
)
from timemachine_tpu.parallel.hrex_sharded import make_replica_mesh, run_hrex_sharded
from timemachine_tpu.testsystems.gaussian1d import make_gaussian_testsystem


def test_run_hrex_gaussian_mixing():
    """HREX over λ-interpolated Gaussians: exact per-state sampling, swap
    decisions via the jitted scan; states should mix (low KL, finite
    relaxation time)."""
    u_fn, sample_fn, exact = make_gaussian_testsystem(mu1=0.5, sigma1=1.5)
    lambdas = np.linspace(0, 1, 5)
    n_states = len(lambdas)
    rng = np.random.default_rng(0)

    def sample_replica(replica, state_idx, n_samples):
        # exact resampling from the state's Gaussian ("fake backend")
        mu = (1 - lambdas[state_idx]) * 0.0 + lambdas[state_idx] * 0.5
        sigma = (1 - lambdas[state_idx]) * 1.0 + lambdas[state_idx] * 1.5
        return rng.normal(mu, sigma, n_samples)

    def replica_from_samples(samples):
        return samples[-1]

    def get_log_q(replicas):
        xs = np.array(replicas)
        return jnp.asarray(-np.stack([u_fn(xs, l) for l in lambdas], axis=1))

    neighbor_pairs = [(i, i + 1) for i in range(n_states - 1)]
    samples_by_state_by_iter, diagnostics = run_hrex(
        replicas=[sample_fn(l, 1, seed=i)[0] for i, l in enumerate(lambdas)],
        sample_replica=sample_replica,
        replica_from_samples=replica_from_samples,
        neighbor_pairs=neighbor_pairs,
        get_log_q=get_log_q,
        n_samples=200,
        n_samples_per_iter=1,
        seed=2023,
    )
    assert len(samples_by_state_by_iter) == 200
    rates = diagnostics.cumulative_swap_acceptance_rates[-1]
    assert np.all(rates > 0.2), f"swap rates too low: {rates}"
    assert diagnostics.normalized_kl_divergence < 0.3
    assert diagnostics.relaxation_time < 50
    tm = diagnostics.transition_matrix
    np.testing.assert_allclose(tm.sum(0), 1.0, atol=1e-9)
    np.testing.assert_allclose(tm.sum(1), 1.0, atol=1e-9)


def test_swap_heuristic():
    assert get_swap_attempts_per_iter_heuristic(4) == 64


def test_neighbor_swaps_fast_matches_slow_statistics():
    """Fast (scan) and reference (Python) swap paths produce statistically
    consistent permutation distributions."""
    n_states = 4
    rng = np.random.default_rng(1)
    log_q_kl = rng.normal(0, 1, (n_states, n_states))
    neighbor_pairs = [(i, i + 1) for i in range(n_states - 1)]

    counts_fast = np.zeros((n_states, n_states))
    counts_slow = np.zeros((n_states, n_states))
    n_trials = 300
    for t in range(n_trials):
        hrex = HREX.from_replicas(list(range(n_states)))
        hrex_fast, _ = hrex.attempt_neighbor_swaps_fast(neighbor_pairs, log_q_kl, 64, seed=t)
        for s, r in enumerate(hrex_fast.replica_idx_by_state):
            counts_fast[s, r] += 1

        np.random.seed(t)
        hrex_slow, _ = hrex.attempt_neighbor_swaps(
            neighbor_pairs, lambda r, s: log_q_kl[r, s], 64
        )
        for s, r in enumerate(hrex_slow.replica_idx_by_state):
            counts_slow[s, r] += 1

    p_fast = counts_fast / n_trials
    p_slow = counts_slow / n_trials
    np.testing.assert_allclose(p_fast, p_slow, atol=0.12)


def _harmonic_u_fn(x, box, params):
    """3D harmonic wells: params = (k_spring,); U = k/2 |x|^2."""
    del box
    return 0.5 * params[0] * jnp.sum(x**2)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_run_hrex_sharded_harmonic(use_mesh):
    """Sharded HREX on K=8 harmonic states: runs on the 8-device virtual
    mesh, mixes replicas, and MBAR over emitted log_q recovers the exact
    free energies f_k = (3N/2) log(k_k) up to a constant."""
    k_states = 8
    n_atoms = 4
    temperature = 300.0
    kt = BOLTZ * temperature
    spring_ks = np.linspace(1000.0, 3000.0, k_states)
    params_by_state = spring_ks[:, None]

    rng = np.random.default_rng(0)
    # start each replica from its state's equilibrium-ish width
    xs0 = rng.normal(0, np.sqrt(kt / spring_ks)[:, None, None], (k_states, n_atoms, 3))
    vs0 = np.zeros_like(xs0)
    boxes0 = np.tile(np.eye(3) * 100.0, (k_states, 1, 1))
    masses = np.full(n_atoms, 12.0)

    mesh = make_replica_mesh() if use_mesh else None
    if use_mesh:
        assert len(jax.devices()) == 8

    neighbor_pairs = np.array([(i, i + 1) for i in range(k_states - 1)])
    result = run_hrex_sharded(
        _harmonic_u_fn,
        params_by_state,
        xs0,
        vs0,
        boxes0,
        masses,
        temperature=temperature,
        dt=2e-3,
        friction=1.0,
        n_iters=150,
        steps_per_iter=40,
        neighbor_pairs=neighbor_pairs,
        n_swap_attempts_per_iter=k_states**3,
        seed=2024,
        mesh=mesh,
    )

    assert result.frames.shape == (150, k_states, n_atoms, 3)
    # swaps happen
    total_rate = result.accepted_by_pair_by_iter.sum() / result.proposed_by_pair_by_iter.sum()
    assert total_rate > 0.2
    # replicas visit many states
    visits = np.array([len(set(result.replica_idx_by_state_by_iter[:, s].tolist())) for s in range(k_states)])
    assert np.all(visits >= k_states // 2)

    # MBAR over per-iteration reduced energies recovers exact Δf
    from timemachine_tpu.fe.mbar import MBAR

    burn = 50
    # log_q_kl_by_iter is (iter, replica, state): -u/kT for each replica x state
    u_rk = -result.log_q_kl_by_iter[burn:]  # (T, K, K)
    # samples: replica r at iteration t was sampling from state s(r, t)
    perms = result.replica_idx_by_state_by_iter[burn:]
    u_kn = []
    n_k = np.zeros(k_states)
    samples_by_state = [[] for _ in range(k_states)]
    for t in range(u_rk.shape[0]):
        state_of_replica = np.argsort(perms[t])
        for r in range(k_states):
            samples_by_state[state_of_replica[r]].append(u_rk[t, r, :])
    n_k = np.array([len(s) for s in samples_by_state])
    u_kn = np.concatenate([np.array(s) for s in samples_by_state]).T  # (K, N_tot)
    mbar = MBAR(u_kn, n_k)
    exact_f = 1.5 * n_atoms * np.log(spring_ks / spring_ks[0])
    np.testing.assert_allclose(mbar.f_k - mbar.f_k[0], exact_f, atol=0.35)
