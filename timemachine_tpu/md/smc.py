"""Sequential Monte Carlo (SMC) over an alchemical lambda coordinate.

Parity target: reference `timemachine/md/smc.py` — adaptive/fixed next-lambda
selection (:162-279), resamplers (:281-339), (C)ESS (:340-388), the SMC driver
(:40-160) and endstate-sample extraction (:389-413).

TPU notes: the weight bookkeeping is pure array math; `propagate` is expected
to be a batched mover (e.g. one vmapped/jitted NPT segment advancing all
walkers on-device at once — see md/moves.py NPTMove and parallel/ for the
sharded variant). The outer loop is host-side because the number of lambda
windows is data-dependent (adaptive bisection on CESS).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
from jax import numpy as jnp
from jax.scipy.special import logsumexp as jlogsumexp
from numpy.typing import NDArray
from scipy.optimize import root_scalar
from scipy.special import logsumexp

Sample = Any
Samples = list
Lambda = float
Array = NDArray
LogWeights = Array

BatchPropagator = Callable[[Samples, Lambda], Samples]
BatchLogProb = Callable
FindNextLambda = Callable
Resampler = Callable


class SMCMaxIterError(Exception):
    """SMC exceeded the maximum number of iterations."""


def sequential_monte_carlo(
    samples: Samples,
    propagate: BatchPropagator,
    log_prob: BatchLogProb,
    resample: Resampler,
    find_next_lambda: FindNextLambda,
    store_intermediate_traj: bool = True,
    max_num_lambdas: int = 1000,
) -> dict:
    """SMC from lambda=0 to lambda=1 (ref smc.py:40-160).

    Returns a dict with keys traj, log_weights_traj, ancestry_traj,
    incremental_log_weights_traj, lambdas_traj.
    """
    n = len(samples)
    log_weights = np.zeros(n)
    norm_log_weights = log_weights - logsumexp(log_weights)

    sample_traj = [samples]
    ancestry_traj = [np.arange(n)]
    log_weights_traj = [np.array(log_weights)]
    incremental_log_weights_traj: list = []
    lambdas_traj = [0.0]

    lam_initial: Lambda = 0.0
    current_iteration = 0

    for _ in range(max_num_lambdas):
        lam_target, incremental_log_weights = find_next_lambda(
            sample_traj[-1], lam_initial, current_iteration, norm_log_weights
        )
        if lam_target == 1.0:
            break

        indices, log_weights = resample(log_weights + incremental_log_weights)
        norm_log_weights = log_weights - logsumexp(log_weights)
        resampled = [sample_traj[-1][i] for i in indices]

        samples = propagate(resampled, lam_target)

        if store_intermediate_traj:
            sample_traj.append(samples)
        else:
            sample_traj[0] = samples
        ancestry_traj.append(indices)
        log_weights_traj.append(np.array(log_weights))
        incremental_log_weights_traj.append(np.array(incremental_log_weights))
        lambdas_traj.append(lam_target)

        lam_initial = lam_target
        current_iteration += 1
    else:
        raise SMCMaxIterError(f"SMC exceeded maximum number of iterations {max_num_lambdas}.")

    incremental_log_weights_traj.append(incremental_log_weights)
    log_weights_traj.append(np.array(log_weights + incremental_log_weights))
    lambdas_traj.append(lam_target)

    return dict(
        traj=sample_traj,
        log_weights_traj=np.array(log_weights_traj),
        ancestry_traj=np.array(ancestry_traj),
        incremental_log_weights_traj=np.array(incremental_log_weights_traj),
        lambdas_traj=np.array(lambdas_traj),
    )


def fixed_find_next_lambda(samples, current_lambda, current_iteration, norm_log_weights, log_prob, lambdas):
    """Fixed-schedule SMC step (ref smc.py:162-184)."""
    assert lambdas[-1] == 1.0, "final lambda must be 1.0"
    lam_target = lambdas[current_iteration + 1]
    incremental_log_weights = log_prob(samples, lam_target, True) - log_prob(samples, current_lambda, True)
    return lam_target, incremental_log_weights


def adaptive_find_next_lambda(
    samples,
    current_lambda,
    current_iteration,
    norm_log_weights,
    log_prob,
    cess_target: float = 0.2,
    epsilon: float = 1e-2,
    max_iterations: int = 100,
    final_lambda: float = 1.0,
):
    """Choose the next lambda by bisecting on CESS ≈ cess_target
    (Zhou/Johansen/Aston 2016 Alg. 4; ref smc.py:186-279)."""
    n = len(samples)
    assert cess_target > 1, f"cess_target is too small: {cess_target} <= 1"
    assert cess_target < n, f"cess_target is too large: {cess_target} >= {n}"

    cur_log_prob = log_prob(samples, current_lambda, True)
    incremental_holder: list = [None]

    def f_opt(lam: float) -> float:
        incremental_holder[0] = log_prob(samples, lam, False) - cur_log_prob
        cess = conditional_effective_sample_size(norm_log_weights, incremental_holder[0])
        return float(cess) - cess_target

    lam_target: Lambda = final_lambda
    try:
        lam_target = root_scalar(f_opt, bracket=(current_lambda, lam_target), method="bisect", xtol=epsilon).root
    except ValueError:
        lam_target = final_lambda
        incremental_holder[0] = log_prob(samples, final_lambda, False) - cur_log_prob

    assert incremental_holder[0] is not None
    if current_iteration == max_iterations:
        raise SMCMaxIterError(f"SMC exceeded maximum number of iterations {max_iterations}.")
    return lam_target, incremental_holder[0]


def identity_resample(log_weights):
    """(ref smc.py:281-285)"""
    return np.arange(len(log_weights)), log_weights


def multinomial_resample(log_weights):
    """Sample ∝ exp(log_weights) with replacement (ref smc.py:287-298)."""
    normed_weights = np.exp(log_weights - logsumexp(log_weights))
    assert np.isclose(np.sum(normed_weights), 1.0)
    n = len(log_weights)
    indices = np.random.choice(np.arange(n), size=n, p=normed_weights)
    avg_log_weights = logsumexp(log_weights - np.log(n)) * np.ones(n)
    return indices, avg_log_weights


def stratified_resample(log_weights):
    """One particle per cumulative-weight subinterval
    (Douc/Cappé/Moulines 2005; ref smc.py:300-338)."""
    weights = np.exp(log_weights - logsumexp(log_weights))
    assert np.isclose(np.sum(weights), 1.0)
    n = len(log_weights)
    subintervals = (np.random.random(n) + np.arange(n)) / n
    indices = np.zeros(n, dtype=int)
    cumulative_sum = np.cumsum(weights)
    i, j = 0, 0
    while i < n:
        if subintervals[i] < cumulative_sum[j]:
            indices[i] = j
            i += 1
        else:
            j += 1
    avg_log_weights = logsumexp(log_weights - np.log(n)) * np.ones(n)
    return indices, avg_log_weights


def effective_sample_size(log_weights):
    """ESS(w) = 1 / Σ w_i² ∈ [1, N] (ref smc.py:340-351)."""
    norm_weights = jnp.exp(log_weights - jlogsumexp(log_weights))
    return 1 / jnp.sum(norm_weights**2)


def conditional_effective_sample_size(norm_log_weights, incremental_log_weights):
    """CESS (Zhou/Johansen/Aston 2016 eq 3.16; ref smc.py:353-377)."""
    n = len(norm_log_weights)
    summed = norm_log_weights + incremental_log_weights
    num = 2 * jlogsumexp(summed)
    denom = jlogsumexp(summed + incremental_log_weights)
    return n * jnp.exp(num - denom)


def conditional_multinomial_resample(log_weights, thresh: float = 0.5):
    """Resample only when fractional ESS drops below thresh (ref smc.py:379-386)."""
    n = len(log_weights)
    if float(effective_sample_size(log_weights)) / n < thresh:
        return multinomial_resample(log_weights)
    return identity_resample(log_weights)


def refine_samples(samples, log_weights, propagate: BatchPropagator, lam: float):
    """Resample to equal weights, then diversify by propagating
    (ref smc.py:389-401)."""
    resampled_inds, log_weights = multinomial_resample(log_weights)
    assert np.isclose(np.std(log_weights), 0), "Need equally weighted samples"
    return propagate([samples[i] for i in resampled_inds], lam)


def get_endstate_samples_from_smc_result(smc_result: dict, propagate: BatchPropagator, lambdas):
    """Unweighted approximate samples at lambdas[0] and lambdas[-1]
    (ref smc.py:403-413)."""
    initial_samples = refine_samples(smc_result["traj"][0], smc_result["log_weights_traj"][0], propagate, lambdas[0])
    final_samples = refine_samples(smc_result["traj"][-1], smc_result["log_weights_traj"][-1], propagate, lambdas[-1])
    return initial_samples, final_samples
