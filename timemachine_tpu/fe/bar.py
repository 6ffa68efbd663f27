"""BAR estimation with bootstrapped pessimistic uncertainty.

Parity target: reference timemachine/fe/bar.py, with the pymbar dependency
replaced by the native JAX MBAR solver (fe/mbar.py). Overflowed energies
(NaN) are treated as u = +inf by callers, matching the reference's
fixed-point-overflow semantics (free_energy.py:843-855)."""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp
from scipy.stats import normaltest

from timemachine_tpu.fe.mbar import (
    DEFAULT_MAXIMUM_ITERATIONS,
    DEFAULT_RELATIVE_TOLERANCE,
    MBAR,
)

DG_KEY = "Delta_f"
DG_ERR_KEY = "dDelta_f"

logger = logging.getLogger(__name__)


def EXP(w_raw):
    """Exponential averaging over forward works (ref bar.py:19-41)."""
    w = jnp.array([ww for ww in w_raw if ww is not None])
    t = jnp.float64(jnp.size(w))
    return -(logsumexp(-w) - jnp.log(t))


def BARzero(w, deltaF):
    """Zeroed at the BAR solution; used for implicit dG/dw (ref bar.py:44-80)."""
    w_f, w_r = w[0], w[1]
    t_f, t_r = len(w_f), len(w_r)
    m = jnp.log(t_f / t_r)

    exp_arg_f = m + w_f - deltaF
    max_arg_f = jnp.where(exp_arg_f < 0, 0.0, exp_arg_f)
    log_f_f = -max_arg_f - jnp.log(jnp.exp(-max_arg_f) + jnp.exp(exp_arg_f - max_arg_f))
    log_numer = logsumexp(log_f_f)

    exp_arg_r = -(m - w_r - deltaF)
    max_arg_r = jnp.where(exp_arg_r < 0, 0.0, exp_arg_r)
    log_f_r = -max_arg_r - jnp.log(jnp.exp(-max_arg_r) + jnp.exp(exp_arg_r - max_arg_r))
    log_denom = logsumexp(log_f_r)
    return log_numer - log_denom


def bar(w_F, w_R, compute_uncertainty: bool = True):
    """BAR from forward/reverse works via the 2-state MBAR solve
    (ref bar.py:262-285)."""
    n = len(w_F)
    assert len(w_R) == n, "bar() requires equal forward/reverse sample counts"
    # synthetic 2-state u_kln: u_kk = 0, so u_kl - u_kk gives back the works
    u_kln = np.zeros((2, 2, n))
    u_kln[0, 1, :] = w_F
    u_kln[1, 0, :] = w_R
    if compute_uncertainty:
        return df_and_err_from_u_kln(u_kln)
    return df_from_u_kln(u_kln), None


def dG_dw(w):
    """d(BAR dG)/d(works), via implicit differentiation of BARzero
    (ref bar.py:83-102)."""
    dG, _ = bar(np.asarray(w[0]), np.asarray(w[1]), compute_uncertainty=False)
    dBAR_dw = jax.grad(BARzero, argnums=(0,))
    dBAR_dA = jax.grad(BARzero, argnums=(1,))
    return -dBAR_dw(w, dG)[0] / dBAR_dA(w, dG)[0]


def ukln_to_ukn(u_kln):
    """(2,2,N) -> ((2, 2N), N_k) (ref bar.py:105-123)."""
    u_kln = np.asarray(u_kln)
    k, l, n = u_kln.shape
    assert k == l == 2
    # u_kln[k, l, n]: sample n drawn from state k, evaluated in state l.
    # u_kn columns: state-0 samples first, then state-1 samples.
    u_kn = np.hstack([u_kln[0], u_kln[1]])
    n_k = n * np.ones(l)
    return u_kn, n_k


def df_and_err_from_u_kln(u_kln, maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS):
    """(ref bar.py:131-149)"""
    u_kn, n_k = ukln_to_ukn(u_kln)
    mbar = MBAR(u_kn, n_k, maximum_iterations=maximum_iterations, relative_tolerance=DEFAULT_RELATIVE_TOLERANCE)
    results = mbar.compute_free_energy_differences()
    return results[DG_KEY][0, 1], results[DG_ERR_KEY][0, 1]


def df_from_u_kln(u_kln, initial_f_k=None, maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS):
    """(ref bar.py:152-166)"""
    u_kn, n_k = ukln_to_ukn(u_kln)
    mbar = MBAR(
        u_kn, n_k, initial_f_k=initial_f_k, maximum_iterations=maximum_iterations,
        relative_tolerance=DEFAULT_RELATIVE_TOLERANCE,
    )
    return mbar.compute_free_energy_differences(compute_uncertainty=False)[DG_KEY][0, 1]


def bootstrap_bar(u_kln, n_bootstrap: int = 100, maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS):
    """Resample frames with replacement and re-estimate (ref bar.py:169-218)."""
    full_bar_result, full_bar_err = df_and_err_from_u_kln(u_kln, maximum_iterations=maximum_iterations)
    _, _, n = u_kln.shape
    rng = np.random.default_rng(2022)
    bootstrap_samples = []
    for _ in range(n_bootstrap):
        u_kln_sample = rng.choice(u_kln, size=(n,), replace=True, axis=2)
        bootstrap_samples.append(
            df_from_u_kln(
                u_kln_sample, initial_f_k=np.array([0.0, full_bar_result]), maximum_iterations=maximum_iterations
            )
        )
    return full_bar_result, full_bar_err, np.array(bootstrap_samples)


def bar_with_pessimistic_uncertainty(u_kln, n_bootstrap=100, maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS):
    """dF and max(mbar uncertainty, bootstrap stddev) (ref bar.py:221-259)."""
    df, ddf, bootstrap_dfs = bootstrap_bar(u_kln, n_bootstrap=n_bootstrap, maximum_iterations=maximum_iterations)
    if len(bootstrap_dfs) >= 8:
        result = normaltest(bootstrap_dfs)
        if result.pvalue < 1e-3:
            logger.warning(f"bootstrapped errors non-normal: {result}")
    if not np.isfinite(ddf):
        logger.warning(f"BAR error estimate is not finite, setting to zero: {ddf}")
        ddf = 0.0
    ddf = np.maximum(ddf, np.std(bootstrap_dfs))
    return df, ddf


def works_from_ukln(u_kln):
    """(ref bar.py:288-294)"""
    k, l, _ = u_kln.shape
    assert k == l == 2
    w_fwd = u_kln[0, 1, :] - u_kln[0, 0, :]
    w_rev = u_kln[1, 0, :] - u_kln[1, 1, :]
    return w_fwd, w_rev


def df_from_ukln_by_lambda(ukln_by_lambda):
    """(ref bar.py:297-319)"""
    win_dfs, win_errs = [], []
    for lambda_idx in range(ukln_by_lambda.shape[0]):
        df, df_err = df_and_err_from_u_kln(ukln_by_lambda[lambda_idx])
        win_dfs.append(df)
        win_errs.append(df_err)
    return np.sum(win_dfs), np.linalg.norm(win_errs)


def pair_overlap_from_ukln(
    u_kln, maximum_iterations=DEFAULT_MAXIMUM_ITERATIONS, relative_tolerance=DEFAULT_RELATIVE_TOLERANCE
) -> float:
    """Normalized off-diagonal MBAR overlap in [0, 1] (ref bar.py:322-353)."""
    u_kn, n_k = ukln_to_ukn(u_kln)
    mbar = MBAR(u_kn, n_k, maximum_iterations=maximum_iterations, relative_tolerance=relative_tolerance)
    overlap = 2 * mbar.compute_overlap()["matrix"][0, 1]
    return float(np.clip(overlap, 0.0, 1.0))


def compute_fwd_and_reverse_df_over_time(ukln_by_lambda, frames_per_step: int = 100):
    """Convergence diagnostics: dF over growing sample prefixes, forward and
    time-reversed (ref bar.py:356-401)."""
    assert len(ukln_by_lambda.shape) == 4
    assert ukln_by_lambda.shape[1] == 2
    total_frames = ukln_by_lambda.shape[-1]
    assert total_frames >= frames_per_step, "fewer samples than frames_per_step"

    reversed_ukln = np.flip(ukln_by_lambda, 3)
    fwd, rev = [], []
    for num_frames in range(frames_per_step, total_frames + 1, frames_per_step):
        fwd.append(df_from_ukln_by_lambda(ukln_by_lambda[..., :num_frames]))
        rev.append(df_from_ukln_by_lambda(reversed_ukln[..., :num_frames]))
    fwd_arr = np.array(fwd)
    rev_arr = np.array(rev)
    return fwd_arr[:, 0], fwd_arr[:, 1], rev_arr[:, 0], rev_arr[:, 1]
