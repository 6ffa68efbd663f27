"""MTM (multiple-try Metropolis) sampling correctness against an analytic
Gaussian target (ref tests/test_mtm.py validates the same movers on a
solvated ligand; here the target's moments are exact, so the check is
sharper and runs in seconds)."""

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.md.moves import OptimizedMTMMove, ReferenceMTMMove
from timemachine_tpu.md.states import CoordsVelBox

MU, SIG = 1.5, 0.7
STEP = 1.0  # proposal scale (deliberately mismatched to the target width)
K = 8


def log_pi(x):
    return -0.5 * jnp.sum((x - MU) ** 2) / SIG**2


def batch_log_pi(states):
    return jnp.stack([log_pi(jnp.asarray(s)) for s in states])


def propose_batch(x, k, key):
    noise = jax.random.normal(key, (k,) + np.shape(x))
    return jnp.asarray(x)[None] + STEP * noise


def run_chain(move, n_moves, x0):
    xvb = CoordsVelBox(x0, np.zeros_like(x0), np.eye(3))
    samples = []
    for _ in range(n_moves):
        xvb = move.move(xvb)
        samples.append(float(np.asarray(xvb.coords).ravel()[0]))
    return np.asarray(samples)


def check_moments(samples, burn=200):
    s = samples[burn:]
    # MC standard errors at these chain lengths ~0.05; use generous 4-sigma
    assert abs(s.mean() - MU) < 0.2, s.mean()
    assert abs(s.std() - SIG) < 0.2, s.std()


def test_optimized_mtm_samples_gaussian():
    move = OptimizedMTMMove(
        K, propose_batch, lambda states, box: batch_log_pi(states), seed=2026
    )
    samples = run_chain(move, 2500, np.full((1, 1), -2.0))
    check_moments(samples)
    assert 0.05 < move.acceptance_fraction < 1.0
    assert move.n_proposed == 2500


def test_reference_mtm_matches_optimized_special_case():
    """With symmetric Q and lambda = pi / (Q_fwd Q_rev), the general-form
    weights reduce to log pi up to state-independent terms; the general
    mover must therefore sample the same target."""

    def batch_log_Q(states, ref):
        ref = jnp.asarray(ref)
        return jnp.stack(
            [-0.5 * jnp.sum((jnp.asarray(s) - ref) ** 2) / STEP**2 for s in states]
        )

    def batch_log_lambda(states, ref):
        # lambda(a, b) symmetric: -logQ(a|b) - logQ(b|a) + logpi-free terms;
        # with symmetric Q this cancels batch_log_Q in the selection weights
        return -2.0 * batch_log_Q(states, ref) + batch_log_Q(states, ref)

    move = ReferenceMTMMove(
        K, propose_batch, batch_log_Q, batch_log_pi, batch_log_lambda, seed=7
    )
    samples = run_chain(move, 2500, np.full((1, 1), 4.0))
    check_moments(samples)
    assert 0.05 < move.acceptance_fraction < 1.0


def test_mtm_acceptance_is_one_for_k1_symmetric_uniform_target():
    """K=1 MTM with a flat target reduces to plain symmetric-proposal
    Metropolis on a uniform density: every move accepts."""
    move = OptimizedMTMMove(
        1, propose_batch, lambda states, box: jnp.zeros(len(states)), seed=3
    )
    xvb = CoordsVelBox(np.zeros((1, 1)), np.zeros((1, 1)), np.eye(3))
    for _ in range(50):
        xvb = move.move(xvb)
    assert move.n_accepted == move.n_proposed == 50
