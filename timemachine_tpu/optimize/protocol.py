"""Offline lambda-protocol optimization by sample reweighting.

Parity target: reference `timemachine/optimize/protocol.py` — thermodynamic
distances between lambda windows (work stddev :153-225, pair overlap
:227-354) estimated by reweighting already-collected samples with linearly
interpolated energies, then a greedy left-to-right placement
(`greedily_optimize_protocol` :356-393).

Everything here is deterministic post-processing of (lambdas, u_kn, f_k,
N_k): no new simulation and no new potential evaluations. The reweighting
math is jitted JAX; the outer greedy/bisection loop is host-side scalar
control flow (it must be — the protocol length is data-dependent).
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp
from scipy.optimize import bisect

from timemachine_tpu.fe.reweighting import interpret_as_mixture_potential

Float = float
DistanceFxn = Callable[[Float, Float], Float]
WorkStddevEstimator = DistanceFxn


def log_weights_from_mixture(u_kn, f_k, N_k):
    """Log unnormalized mixture density of the pooled samples
    (ref protocol.py:113-133): log Σ_k N_k exp(f_k − u_k(x_n))."""
    u_kn = jnp.asarray(u_kn)
    f_k = jnp.asarray(f_k)
    N_k = np.asarray(N_k, dtype=np.float64)
    return logsumexp(f_k[:, None] - u_kn, b=N_k[:, None], axis=0)


def linear_u_kn_interpolant(lambdas, u_kn) -> Callable:
    """vec_u(lam)[n] ≈ u(x_n, lam) by per-sample linear interpolation over
    the source lambdas (ref protocol.py:135-151)."""
    lambdas = jnp.asarray(lambdas)
    u_kn = jnp.asarray(u_kn)

    @jax.jit
    def vec_u_interp(lam):
        def u_one(u_n):
            return jnp.nan_to_num(jnp.interp(lam, lambdas, u_n), nan=+jnp.inf, posinf=+jnp.inf)

        return jax.vmap(u_one, in_axes=1)(u_kn)

    return vec_u_interp


def reweighted_stddev(f_n, target_logpdf_n, source_logpdf_n):
    """stddev(f) under p_target estimated from samples of p_source
    (ref protocol.py:171-204)."""
    log_weights_n = jnp.asarray(target_logpdf_n) - jnp.asarray(source_logpdf_n)
    weights = jnp.exp(log_weights_n - logsumexp(log_weights_n)).flatten()
    f_n = jnp.asarray(f_n)
    f_mean = jnp.sum(weights * f_n)
    weighted_sq = weights * (f_n - f_mean) ** 2
    return jnp.sqrt(jnp.sum(jnp.nan_to_num(weighted_sq, nan=0.0)))  # 0·inf → 0


def construct_work_stddev_estimator(reference_log_weights_n, vec_u: Callable) -> WorkStddevEstimator:
    """(ref protocol.py:153-169)"""

    def work_stddev_estimator(prev_lam: Float, next_lam: Float) -> Float:
        target_logpdf_n = -vec_u(prev_lam)
        delta_us = vec_u(next_lam) - vec_u(prev_lam)
        return reweighted_stddev(delta_us, target_logpdf_n, reference_log_weights_n)

    return work_stddev_estimator


def construct_max_work_stddev_distance(work_stddev_estimator) -> DistanceFxn:
    """d(a, b) = max(stddev(a→b), stddev(b→a)), +inf beyond max_step
    (ref protocol.py:206-225)."""

    def max_work_stddev_distance(prev_lam, next_lam, max_step=0.25):
        if next_lam - prev_lam > max_step:
            return +jnp.inf
        fwd = work_stddev_estimator(prev_lam, next_lam)
        rev = work_stddev_estimator(next_lam, prev_lam)
        return max(fwd, rev)

    return max_work_stddev_distance


def rebalance_initial_protocol_by_work_stddev(
    lambdas_k,
    f_k,
    u_kn,
    N_k,
    work_stddev_threshold: Float = 1.0,
):
    """New protocol with work_stddev(i→i±1) ≤ threshold for all i
    (ref protocol.py:69-111)."""
    reference_log_weights_n = log_weights_from_mixture(u_kn, f_k, N_k)
    vec_u_interp = linear_u_kn_interpolant(lambdas_k, u_kn)
    work_stddev_estimator = construct_work_stddev_estimator(reference_log_weights_n, vec_u_interp)
    distance_fxn = construct_max_work_stddev_distance(work_stddev_estimator)
    return greedily_optimize_protocol(distance_fxn, target_distance=work_stddev_threshold)


def reweighted_pair_overlap(u_n_A, u_n_B, u_n_ref):
    """overlap(A, B) estimated by reweighting ref samples to A and B
    (ref protocol.py:227-263; pymbar overlap sec. 3.4 of
    doi:10.1021/ct501101f)."""
    log_q_A = -jnp.asarray(u_n_A)
    log_q_B = -jnp.asarray(u_n_B)
    log_q_ref = -jnp.asarray(u_n_ref)
    log_N = jnp.log(len(log_q_ref))

    log_p_ref_n = log_q_ref - logsumexp(log_q_ref - log_N)
    log_p_A = log_q_A - logsumexp(log_q_A - log_p_ref_n - log_N)
    log_p_B = log_q_B - logsumexp(log_q_B - log_p_ref_n - log_N)

    log_prod_AB_n = log_p_A + log_p_B
    log_p_mix_n = logsumexp(jnp.array([log_p_A, log_p_B]), axis=0) - jnp.log(2)

    log_denom = log_p_mix_n + log_p_ref_n
    mask = log_denom > -jnp.inf
    log_f_n = jnp.where(mask, log_prod_AB_n - log_denom, 0.0)
    log_mean_f = logsumexp(log_f_n - jnp.log(jnp.sum(mask)))
    return jnp.exp(log_mean_f)


def make_one_minus_similarity_fxn(sim_fxn):
    def one_minus_f(a, b):
        return 1 - sim_fxn(a, b)

    return one_minus_f


def make_overlap_fxn(u_lam, src_u_n):
    """(lam_a, lam_b) → clamped overlap estimate (ref protocol.py:272-294)."""

    def overlap_fxn(lam_a, lam_b):
        return jnp.clip(reweighted_pair_overlap(u_lam(lam_a), u_lam(lam_b), src_u_n), 0.0, 1.0)

    return overlap_fxn


def make_fast_approx_overlap_fxn(lambdas, u_kn, f_k, N_k):
    """(ref protocol.py:296-322)"""
    linear_u_lam = linear_u_kn_interpolant(lambdas, np.nan_to_num(u_kn, nan=np.inf))
    mixture_u_n = interpret_as_mixture_potential(u_kn, f_k, N_k)
    return make_overlap_fxn(linear_u_lam, mixture_u_n)


def make_overlap_distance_fxn(u_lam, src_u_n):
    return make_one_minus_similarity_fxn(make_overlap_fxn(u_lam, src_u_n))


def make_fast_approx_overlap_distance_fxn(lambdas, u_kn, f_k, N_k):
    """d(a,b) = 1 − overlap(a,b) via reweighting + interpolated energies
    (ref protocol.py:344-354)."""
    return make_one_minus_similarity_fxn(make_fast_approx_overlap_fxn(lambdas, u_kn, f_k, N_k))


def greedily_optimize_protocol(
    distance_fxn: DistanceFxn,
    target_distance=0.5,
    max_iterations=1000,
    bisection_xtol=1e-4,
    protocol_interval: tuple[float, float] = (0.0, 1.0),
):
    """Left-to-right greedy placement: next lambda at a fixed thermodynamic
    distance from the previous one (ref protocol.py:356-393)."""
    start_lamb, end_lamb = protocol_interval
    protocol = [start_lamb]

    for t in range(max_iterations):
        prev_lam = protocol[-1]
        if distance_fxn(prev_lam, end_lamb) < target_distance:
            break
        next_lam = bisect(
            f=lambda trial_lam: float(distance_fxn(prev_lam, trial_lam)) - target_distance,
            a=prev_lam,
            b=end_lamb,
            xtol=bisection_xtol,
        )
        protocol.append(next_lam)
        if t == max_iterations - 1:
            warnings.warn("Exceeded max_iterations!")

    if protocol[-1] != end_lamb:
        protocol.append(end_lamb)

    return jnp.array(protocol)
