"""BAR free-energy estimation with bootstrapped pessimistic uncertainty.

Capability target: reference timemachine/fe/bar.py. pymbar is replaced by
the native implicit-diff MBAR solver (fe/mbar.py); callers map overflowed
(NaN) energies to u = +inf, reproducing the reference's fixed-point-overflow
semantics (free_energy.py:843-855).

The BAR self-consistency function is written with `log_sigmoid` — the Fermi
functions in both directions are log σ(±(M + w − ΔF)) — rather than the
reference's hand-rolled max/exp stabilization.
"""

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
    """Unidirectional exponential averaging (Zwanzig) of forward works."""
    w = jnp.array([ww for ww in w_raw if ww is not None])
    return jnp.log(jnp.size(w)) - logsumexp(-w)


def BARzero(w, deltaF):
    """Self-consistency residual of BAR: zero at deltaF = dG. Differentiable
    in both (w, deltaF), which is what dG_dw's implicit gradient needs."""
    w_f, w_r = w[0], w[1]
    bias = jnp.log(len(w_f) / len(w_r))
    log_fermi_fwd = jax.nn.log_sigmoid(-(bias + w_f - deltaF))
    log_fermi_rev = jax.nn.log_sigmoid(bias - w_r - deltaF)
    return logsumexp(log_fermi_fwd) - logsumexp(log_fermi_rev)


def dG_dw(w):
    """Gradient of the BAR estimate w.r.t. the work values, by implicit
    differentiation of BARzero at its root."""
    dG, _ = bar(np.asarray(w[0]), np.asarray(w[1]), compute_uncertainty=False)
    residual_w = jax.grad(BARzero, argnums=0)(w, dG)
    residual_dF = jax.grad(BARzero, argnums=1)(w, dG)
    return -residual_w / residual_dF


# -- u_kln plumbing -----------------------------------------------------------


def ukln_to_ukn(u_kln):
    """(2, 2, N) pair matrix -> ((2, 2N) u_kn, N_k) in MBAR column order
    (state-0 samples then state-1 samples)."""
    u_kln = np.asarray(u_kln)
    assert u_kln.shape[:2] == (2, 2)
    return np.hstack([u_kln[0], u_kln[1]]), np.full(2, u_kln.shape[2])


def _pair_mbar(u_kln, initial_f_k=None, maximum_iterations=DEFAULT_MAXIMUM_ITERATIONS):
    u_kn, n_k = ukln_to_ukn(u_kln)
    return MBAR(
        u_kn,
        n_k,
        initial_f_k=initial_f_k,
        maximum_iterations=maximum_iterations,
        relative_tolerance=DEFAULT_RELATIVE_TOLERANCE,
    )


def df_and_err_from_u_kln(u_kln, maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS):
    results = _pair_mbar(u_kln, maximum_iterations=maximum_iterations).compute_free_energy_differences()
    return results[DG_KEY][0, 1], results[DG_ERR_KEY][0, 1]


def df_from_u_kln(u_kln, initial_f_k=None, maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS):
    mbar = _pair_mbar(u_kln, initial_f_k=initial_f_k, maximum_iterations=maximum_iterations)
    return mbar.compute_free_energy_differences(compute_uncertainty=False)[DG_KEY][0, 1]


def bar(w_F, w_R, compute_uncertainty: bool = True):
    """BAR from forward/reverse work arrays, as a synthetic 2-state MBAR
    problem (u_kk ≡ 0, off-diagonals carry the works)."""
    n = len(w_F)
    assert len(w_R) == n, "bar() requires equal forward/reverse sample counts"
    u_kln = np.zeros((2, 2, n))
    u_kln[0, 1] = w_F
    u_kln[1, 0] = w_R
    if compute_uncertainty:
        return df_and_err_from_u_kln(u_kln)
    return df_from_u_kln(u_kln), None


def works_from_ukln(u_kln):
    """Forward/reverse works from a (2, 2, N) pair matrix."""
    assert np.asarray(u_kln).shape[:2] == (2, 2)
    return u_kln[0, 1] - u_kln[0, 0], u_kln[1, 0] - u_kln[1, 1]


# -- uncertainty --------------------------------------------------------------


def bootstrap_bar(u_kln, n_bootstrap: int = 100, maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS):
    """Frame-resampled BAR replicates, each warm-started from the full-data
    solution so the bootstrap costs a few iterations per replicate."""
    df_full, ddf_full = df_and_err_from_u_kln(u_kln, maximum_iterations=maximum_iterations)
    n = u_kln.shape[2]
    rng = np.random.default_rng(2022)
    warm_start = np.array([0.0, df_full])
    replicates = np.array(
        [
            df_from_u_kln(
                u_kln[:, :, rng.integers(0, n, size=n)],
                initial_f_k=warm_start,
                maximum_iterations=maximum_iterations,
            )
            for _ in range(n_bootstrap)
        ]
    )
    return df_full, ddf_full, replicates


def bar_with_pessimistic_uncertainty(
    u_kln, n_bootstrap=100, maximum_iterations: int = DEFAULT_MAXIMUM_ITERATIONS
):
    """dF with error = max(MBAR analytic uncertainty, bootstrap stddev)."""
    df, ddf, replicates = bootstrap_bar(u_kln, n_bootstrap=n_bootstrap, maximum_iterations=maximum_iterations)
    if len(replicates) >= 8:
        test = normaltest(replicates)
        if test.pvalue < 1e-3:
            logger.warning(f"bootstrapped errors non-normal: {test}")
    if not np.isfinite(ddf):
        logger.warning(f"BAR error estimate is not finite, setting to zero: {ddf}")
        ddf = 0.0
    return df, np.maximum(ddf, replicates.std())


def pair_overlap_from_ukln(
    u_kln, maximum_iterations=DEFAULT_MAXIMUM_ITERATIONS, relative_tolerance=DEFAULT_RELATIVE_TOLERANCE
) -> float:
    """Normalized off-diagonal MBAR overlap in [0, 1]."""
    u_kn, n_k = ukln_to_ukn(u_kln)
    mbar = MBAR(u_kn, n_k, maximum_iterations=maximum_iterations, relative_tolerance=relative_tolerance)
    return float(np.clip(2 * mbar.compute_overlap()["matrix"][0, 1], 0.0, 1.0))


# -- multi-window convergence diagnostics -------------------------------------


def df_from_ukln_by_lambda(ukln_by_lambda):
    """Total dF over a ladder of window pair matrices; errors in quadrature."""
    per_window = np.array([df_and_err_from_u_kln(pair) for pair in ukln_by_lambda])
    return per_window[:, 0].sum(), np.linalg.norm(per_window[:, 1])


def compute_fwd_and_reverse_df_over_time(ukln_by_lambda, frames_per_step: int = 100):
    """dF re-estimated over growing frame prefixes, scanning the trajectory
    forward and time-reversed — flat, agreeing curves indicate convergence."""
    assert ukln_by_lambda.ndim == 4 and ukln_by_lambda.shape[1] == 2
    total_frames = ukln_by_lambda.shape[-1]
    assert total_frames >= frames_per_step, "fewer samples than frames_per_step"

    def prefix_curve(u):
        pairs = [
            df_from_ukln_by_lambda(u[..., :n]) for n in range(frames_per_step, total_frames + 1, frames_per_step)
        ]
        arr = np.array(pairs)
        return arr[:, 0], arr[:, 1]

    fwd_df, fwd_err = prefix_curve(ukln_by_lambda)
    rev_df, rev_err = prefix_curve(np.flip(ukln_by_lambda, 3))
    return fwd_df, fwd_err, rev_df, rev_err
