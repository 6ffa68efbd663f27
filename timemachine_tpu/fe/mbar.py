"""Native MBAR (multistate Bennett acceptance ratio) solver in JAX.

Replaces the reference's pymbar dependency. Implements the standard
self-consistent / Newton solve of the MBAR equations and the asymptotic
covariance estimator (Shirts & Chodera, J. Chem. Phys. 129, 124105 (2008)).

Being pure JAX, free energies here are differentiable end-to-end — the
estimator itself can sit inside a forcefield-training loss (the reference
needs custom reweighting machinery for this; here it comes free).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

DEFAULT_RELATIVE_TOLERANCE = 1e-6
DEFAULT_MAXIMUM_ITERATIONS = 1_000


def self_consistent_update(f_k, u_kn, log_n_k):
    """One MBAR fixed-point update: f_k <- -log sum_n exp(-u_kn - log_denom_n).

    A sample with u = +inf in EVERY state (overflow-poisoned frame,
    fe/energy_decomposition NaN→+inf semantics) has log_denom = -inf; the
    naive -u - log_denom would be (-inf) + inf = NaN. Such samples contribute
    zero measure, so their term is forced to -inf (exp → 0)."""
    log_denom_n = logsumexp(f_k[:, None] + log_n_k[:, None] - u_kn, axis=0)
    terms = -u_kn - log_denom_n[None, :]
    terms = jnp.where(jnp.isneginf(log_denom_n)[None, :], -jnp.inf, terms)
    return -logsumexp(terms, axis=1)


from functools import lru_cache, partial


@partial(jax.jit, static_argnames=("maximum_iterations",))
def _fixed_point_solve_jit(u_kn, n_k, f_k0, relative_tolerance, maximum_iterations):
    """Jitted fixed-point iteration. Tolerances/iterations enter as traced/
    static args so repeated calls (e.g. 100x bootstrap) reuse ONE compiled
    program — fresh per-call while_loop closures were compiling each time and
    exhausting the process mmap budget over long campaigns."""
    u_kn = jnp.asarray(u_kn)
    log_n_k = jnp.log(jnp.asarray(n_k, dtype=u_kn.dtype))

    def cond(carry):
        f_k, f_prev, it = carry
        delta = jnp.max(jnp.abs(f_k - f_prev))
        scale = jnp.maximum(jnp.max(jnp.abs(f_k)), 1.0)
        return (it < maximum_iterations) & (delta > relative_tolerance * scale)

    def body(carry):
        f_k, _, it = carry
        f_new = self_consistent_update(f_k, u_kn, log_n_k)
        f_new = f_new - f_new[0]
        return f_new, f_k, it + 1

    f_k, _, n_iter = jax.lax.while_loop(cond, body, (f_k0, f_k0 + 1.0, jnp.asarray(0)))
    return f_k, n_iter


def _solve_mbar_fixed_point(u_kn, n_k, initial_f_k, relative_tolerance, maximum_iterations):
    u_kn = jnp.asarray(u_kn)
    k_states = u_kn.shape[0]
    f_k0 = jnp.zeros(k_states, dtype=u_kn.dtype) if initial_f_k is None else jnp.asarray(initial_f_k, dtype=u_kn.dtype)
    return _fixed_point_solve_jit(u_kn, jnp.asarray(n_k), f_k0, relative_tolerance, maximum_iterations)


@jax.custom_vjp
def _solve_mbar_diff(u_kn, n_k):
    f_k, _ = _solve_mbar_fixed_point(u_kn, n_k, None, DEFAULT_RELATIVE_TOLERANCE, DEFAULT_MAXIMUM_ITERATIONS)
    return f_k


def _solve_mbar_diff_fwd(u_kn, n_k):
    f_k = _solve_mbar_diff(u_kn, n_k)
    return f_k, (f_k, u_kn, n_k)


def _solve_mbar_diff_bwd(res, g):
    """Implicit differentiation through the MBAR fixed point f = scu(f; u).

    (I - J) df = B du with J = dscu/df singular along the ones direction
    (shift equivariance); the min-norm pinv solve plus the f_0 = 0 gauge
    projection gives df*/du = P (I - J)^+ B, so the VJP is
    B^T (I - J)^{+T} P^T g.
    """
    f_k, u_kn, n_k = res
    log_n_k = jnp.log(jnp.asarray(n_k, dtype=u_kn.dtype))

    scu_f = lambda f: self_consistent_update(f, u_kn, log_n_k)
    jac = jax.jacfwd(scu_f)(f_k)  # (K, K)
    a = jnp.eye(len(f_k), dtype=u_kn.dtype) - jac

    # gauge projection: f* = f_raw - f_raw[0] * ones
    w = g - jnp.zeros_like(g).at[0].set(jnp.sum(g))
    v = jnp.linalg.pinv(a.T, rcond=1e-10) @ w

    _, vjp_u = jax.vjp(lambda u: self_consistent_update(f_k, u, log_n_k), u_kn)
    (grad_u,) = vjp_u(v)
    return grad_u, jnp.zeros_like(jnp.asarray(n_k, dtype=u_kn.dtype))


_solve_mbar_diff.defvjp(_solve_mbar_diff_fwd, _solve_mbar_diff_bwd)


def solve_mbar(
    u_kn,
    n_k,
    initial_f_k: Optional[np.ndarray] = None,
    relative_tolerance: float = DEFAULT_RELATIVE_TOLERANCE,
    maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS,
):
    """Solve for dimensionless free energies f_k (f_0 = 0) by self-consistent
    iteration. u_kn: (K, N_total) reduced energies of every sample evaluated
    in every state; n_k: samples drawn from each state.

    Differentiable w.r.t. u_kn via implicit differentiation (custom VJP) when
    called with default tolerance settings inside a grad trace.
    """
    if initial_f_k is None and relative_tolerance == DEFAULT_RELATIVE_TOLERANCE and maximum_iterations == DEFAULT_MAXIMUM_ITERATIONS:
        f_k = _solve_mbar_diff(jnp.asarray(u_kn), jnp.asarray(n_k, dtype=jnp.asarray(u_kn).dtype))
        return f_k, jnp.asarray(-1)
    return _solve_mbar_fixed_point(u_kn, n_k, initial_f_k, relative_tolerance, maximum_iterations)


def kln_to_kn(u_kln, N_k=None):
    """Flatten a (K, K, N_max) u_kln (frames of k evaluated in state l) into
    the (K, N_tot) u_kn layout MBAR consumes, dropping padding beyond N_k[k]
    (ref fe/bar.py kln_to_kn / pymbar.utils.kln_to_kn conventions)."""
    u_kln = np.asarray(u_kln)
    K = u_kln.shape[0]
    if N_k is None:
        N_k = np.full(K, u_kln.shape[2], dtype=int)
    N_k = np.asarray(N_k, dtype=int)
    cols = []
    for k in range(K):
        cols.append(u_kln[k, :, : N_k[k]])  # (K, N_k[k]): frames of k in every state l
    return np.concatenate(cols, axis=1)


def mbar_weights(f_k, u_kn, n_k):
    """W[n, k] = exp(f_k - u_kn) / sum_l n_l exp(f_l - u_ln); columns sum to 1.

    A sample with u = +inf in EVERY state (an overflow-poisoned frame, see
    fe/energy_decomposition NaN→+inf semantics) has log-denominator -inf;
    the naive ratio would be (-inf) - (-inf) = NaN and poison downstream
    covariance SVDs. Such samples carry zero weight by definition."""
    log_n_k = jnp.log(jnp.asarray(n_k, dtype=u_kn.dtype))
    log_denom_n = logsumexp(f_k[:, None] + log_n_k[:, None] - u_kn, axis=0)
    log_w = f_k[:, None] - u_kn - log_denom_n[None, :]
    log_w = jnp.where(jnp.isneginf(log_denom_n)[None, :], -jnp.inf, log_w)
    return jnp.exp(log_w).T  # (N, K)


def asymptotic_covariance(w, n_k):
    """Theta = V S (I - S V^T diag(N) V S)^+ S V^T (Shirts & Chodera, App. D)."""
    w = np.asarray(w)
    u_, s_, vt_ = np.linalg.svd(w, full_matrices=False)
    v = vt_.T
    s = np.diag(s_)
    inner = np.eye(len(s_)) - s @ vt_ @ np.diag(np.asarray(n_k, dtype=np.float64)) @ v @ s
    theta = v @ s @ np.linalg.pinv(inner, rcond=1e-10) @ s @ vt_
    return theta


class MBAR:
    """Minimal pymbar-compatible surface (MBAR(u_kn, N_k),
    compute_free_energy_differences, compute_overlap)."""

    def __init__(
        self,
        u_kn,
        n_k,
        initial_f_k=None,
        maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS,
        relative_tolerance: float = DEFAULT_RELATIVE_TOLERANCE,
        solver_protocol: str = "robust",
    ):
        del solver_protocol
        self.u_kn = np.asarray(u_kn, dtype=np.float64)
        self.n_k = np.asarray(n_k, dtype=np.float64)
        f_k, n_iter = solve_mbar(
            self.u_kn,
            self.n_k,
            initial_f_k=initial_f_k,
            relative_tolerance=relative_tolerance,
            maximum_iterations=maximum_iterations,
        )
        self.f_k = np.asarray(f_k)
        self.n_iterations = int(n_iter)

    @property
    def weights(self):
        return np.asarray(mbar_weights(jnp.asarray(self.f_k), jnp.asarray(self.u_kn), self.n_k))

    def compute_free_energy_differences(self, compute_uncertainty: bool = True):
        k = len(self.f_k)
        delta_f = self.f_k[None, :] - self.f_k[:, None]
        result = {"Delta_f": delta_f}
        if compute_uncertainty:
            theta = asymptotic_covariance(self.weights, self.n_k)
            d2 = theta.diagonal()[None, :] + theta.diagonal()[:, None] - 2 * theta
            d2 = np.where(d2 > 0, d2, 0.0)
            result["dDelta_f"] = np.sqrt(d2)
        return result

    def compute_overlap(self):
        w = self.weights
        overlap = np.asarray(self.n_k)[:, None] * (w.T @ w)
        return {"matrix": overlap}


def exp_estimator(w):
    """Exponential averaging (Zwanzig): dF = -log <exp(-w)>."""
    w = jnp.asarray(w)
    return -(logsumexp(-w) - jnp.log(jnp.float64(w.size)))
