"""Importance reweighting estimators for differentiable free energies.

Parity target: reference `timemachine/fe/reweighting.py` (one_sided_exp :40-52,
interpret_as_mixture_potential :54-142, endpoint/mixture estimators :144-317).

All functions are pure JAX: the returned estimators differentiate w.r.t.
forcefield parameters through the batched energy functions, which on TPU are
jit+vmap sweeps over stored samples (see fe/energy_decomposition.py).
"""

from __future__ import annotations

from typing import Callable, Collection

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

__all__ = [
    "construct_endpoint_reweighting_estimator",
    "construct_mixture_reweighting_estimator",
    "interpret_as_mixture_potential",
    "one_sided_exp",
]

Samples = Collection
Params = Collection
BatchedReducedPotentialFxn = Callable


def log_mean(log_values):
    """stable log(mean(values)) = logsumexp(log_values) - log(N)."""
    log_values = jnp.asarray(log_values)
    return logsumexp(log_values - jnp.log(len(log_values)))


def estimate_log_z_ratio(log_importance_weights):
    return log_mean(log_importance_weights)


def one_sided_exp(delta_us):
    """EXP / exponential averaging: Δf = −log⟨e^{−Δu}⟩ (Zwanzig)."""
    return -estimate_log_z_ratio(-jnp.asarray(delta_us))


def interpret_as_mixture_potential(u_kn, f_k, N_k):
    """u_mix(x_n) for the N_k-weighted mixture of the K source states
    (Shirts 2017 MBAR-as-mixture; ref reweighting.py:54-142).

    u_kn: (K, N) reduced energies of all pooled samples in all states;
    f_k: (K,) reduced free energies; N_k: per-state sample counts.
    """
    u_kn = jnp.asarray(u_kn)
    f_k = jnp.asarray(f_k)
    N_k = np.asarray(N_k)
    K, N = u_kn.shape
    assert f_k.shape == (K,)
    assert np.sum(N_k) == N
    log_w_k = jnp.log(N_k) - jnp.log(np.sum(N_k))
    # p_k(x) ∝ exp(f_k − u_k(x)); mixture over k weighted by w_k
    return -logsumexp(log_w_k[:, None] + f_k[:, None] - u_kn, axis=0)


def construct_endpoint_reweighting_estimator(
    samples_0: Samples,
    samples_1: Samples,
    batched_u_0_fxn: BatchedReducedPotentialFxn,
    batched_u_1_fxn: BatchedReducedPotentialFxn,
    ref_params: Params,
    ref_delta_f: float,
) -> Callable:
    """Estimator of f(params,1) − f(params,0) from endpoint samples drawn at
    ref_params, via the thermodynamic cycle Δf(params) = Δf(ref) −
    reweight_0(ref→params) + reweight_1(ref→params)
    (ref reweighting.py:144-224). Differentiable w.r.t. params."""
    ref_u_0 = batched_u_0_fxn(samples_0, ref_params)
    ref_u_1 = batched_u_1_fxn(samples_1, ref_params)

    def estimate_delta_f(params):
        df_0 = one_sided_exp(batched_u_0_fxn(samples_0, params) - ref_u_0)
        df_1 = one_sided_exp(batched_u_1_fxn(samples_1, params) - ref_u_1)
        return ref_delta_f - df_0 + df_1

    return estimate_delta_f


def construct_mixture_reweighting_estimator(
    samples_n: Samples,
    u_ref_n,
    batched_u_0_fxn: BatchedReducedPotentialFxn,
    batched_u_1_fxn: BatchedReducedPotentialFxn,
) -> Callable:
    """Estimator of f(params,1) − f(params,0) by reweighting a single
    reference ensemble (e.g. the MBAR mixture) to both endstates
    (pymbar computePerturbedFreeEnergies analog; ref reweighting.py:226-317).
    Differentiable w.r.t. params."""
    u_ref_n = jnp.asarray(u_ref_n)
    assert len(samples_n) == len(u_ref_n)

    def estimate_delta_f(params):
        f_0 = one_sided_exp(batched_u_0_fxn(samples_n, params) - u_ref_n)
        f_1 = one_sided_exp(batched_u_1_fxn(samples_n, params) - u_ref_n)
        return f_1 - f_0

    return estimate_delta_f
