"""Generic local resampling move: update a probabilistically-selected subset
of particles under a restrained target (ref timemachine/md/local_resampling.py).

The Bernoulli-restraint correction keeps the move exact w.r.t. the original
target even though the selection depends on the current state.
"""

import numpy as np
from jax import numpy as jnp


def bernoulli_logpdf(log_p_i, selection_mask):
    """log P(mask | p): sum of log p_i over selected + log(1-p_i) over rest,
    computed stably from log p_i."""
    log_p_i = jnp.asarray(log_p_i)
    log_one_minus_p = jnp.log1p(-jnp.exp(jnp.minimum(log_p_i, -1e-12)))
    return jnp.sum(jnp.where(selection_mask, log_p_i, log_one_minus_p))


def local_resampling_move(
    x,
    target_logpdf_fxn,
    particle_selection_log_prob_fxn,
    mcmc_move,
):
    """(ref local_resampling.py:7-38)"""
    x = jnp.array(x)
    n_particles = len(x)

    selection_probs = np.exp(particle_selection_log_prob_fxn(x))
    assert np.min(selection_probs) >= 0 and np.max(selection_probs) <= 1, "selection_probs must be in [0,1]"
    assert selection_probs.shape == (n_particles,), "must compute per-particle selection_probs"
    selection_mask = np.random.rand(n_particles) < selection_probs

    def restrained_logpdf_fxn(x_full) -> float:
        log_p_i = particle_selection_log_prob_fxn(x_full)
        return target_logpdf_fxn(x_full) + bernoulli_logpdf(log_p_i, selection_mask)

    def subproblem_logpdf(x_sub) -> float:
        x_full = x.at[selection_mask].set(x_sub)
        return restrained_logpdf_fxn(x_full)

    x_sub = x[selection_mask]
    x_next_sub, aux = mcmc_move(x_sub, subproblem_logpdf)
    x_next = x.at[selection_mask].set(x_next_sub)
    return x_next, aux
