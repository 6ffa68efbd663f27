"""Local resampling: apply an MCMC move to a stochastically selected particle
subset, exactly (ref timemachine/md/local_resampling.py).

Selecting the subset from the current state biases a naive subset move; the
fix is to run the move against the target AUGMENTED with the Bernoulli
log-density of the frozen selection mask, so the extended chain
(x, mask) -> (x', mask) leaves the original target invariant.
"""

import numpy as np
from jax import numpy as jnp


def bernoulli_logpdf(log_p_i, selection_mask):
    """log P(mask | p) from per-particle log-probabilities: sum log p over
    selected particles plus sum log(1-p) over the rest, with log1p/expm1 for
    stability near p -> 1."""
    log_p_i = jnp.asarray(log_p_i)
    log_q_i = jnp.log1p(-jnp.exp(jnp.minimum(log_p_i, -1e-12)))
    return jnp.sum(jnp.where(selection_mask, log_p_i, log_q_i))


def local_resampling_move(x, target_logpdf_fxn, particle_selection_log_prob_fxn, mcmc_move, rng=None):
    """One local-resampling step (ref local_resampling.py:7-38).

    rng: optional np.random.Generator for the mask draw (the reference's
    TODO about global-numpy-rng dependence; defaults to the global stream
    for drop-in compatibility).
    """
    x = jnp.array(x)
    n = len(x)

    log_p = particle_selection_log_prob_fxn(x)
    p_select = np.exp(log_p)
    assert p_select.shape == (n,), "must compute per-particle selection_probs"
    assert 0.0 <= np.min(p_select) and np.max(p_select) <= 1.0, "selection_probs must be in [0,1]"
    draw = rng.random(n) if rng is not None else np.random.rand(n)
    mask = draw < p_select

    def masked_logpdf(x_full) -> float:
        # target plus the (frozen-mask) selection density — the correction
        # that makes the subset move exact
        return target_logpdf_fxn(x_full) + bernoulli_logpdf(particle_selection_log_prob_fxn(x_full), mask)

    def subproblem_logpdf(x_sub) -> float:
        return masked_logpdf(x.at[mask].set(x_sub))

    x_new_sub, aux = mcmc_move(x[mask], subproblem_logpdf)
    return x.at[mask].set(x_new_sub), aux
