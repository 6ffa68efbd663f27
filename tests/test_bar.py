"""Native BAR/MBAR estimator tests against the analytic 1-D Gaussian
testsystem (the reference validates pymbar-based estimators the same way,
tests/test_smc.py / test_reweighting.py style)."""

import numpy as np
import pytest

from timemachine_tpu.fe.bar import (
    EXP,
    bar,
    bar_with_pessimistic_uncertainty,
    bootstrap_bar,
    compute_fwd_and_reverse_df_over_time,
    df_and_err_from_u_kln,
    df_from_ukln_by_lambda,
    pair_overlap_from_ukln,
    works_from_ukln,
)
from timemachine_tpu.fe.mbar import MBAR, solve_mbar
from timemachine_tpu.testsystems.gaussian1d import make_gaussian_testsystem, make_gaussian_ukln


def test_mbar_solver_analytic():
    """MBAR free energies match log-σ ratios for Gaussians."""
    u_fn, sample_fn, exact = make_gaussian_testsystem()
    lambdas = np.linspace(0, 1, 4)
    n = 4000
    samples = [sample_fn(l, n, seed=i) for i, l in enumerate(lambdas)]
    x_all = np.concatenate(samples)
    u_kn = np.stack([u_fn(x_all, l) for l in lambdas])
    n_k = np.full(len(lambdas), n)
    mbar = MBAR(u_kn, n_k)
    for i, l in enumerate(lambdas):
        np.testing.assert_allclose(mbar.f_k[i] - mbar.f_k[0], -exact(l, 0.0), atol=0.05)
    # uncertainties sane
    res = mbar.compute_free_energy_differences()
    assert np.all(res["dDelta_f"][0, 1:] > 0)
    assert np.all(res["dDelta_f"][0, 1:] < 0.2)


def test_bar_pair_analytic():
    ukln_by_lambda, exact = make_gaussian_ukln(np.linspace(0, 1, 3), n_samples=4000)
    for u_kln, ex in zip(ukln_by_lambda, exact):
        df, ddf = df_and_err_from_u_kln(u_kln)
        assert abs(df - ex) < 4 * max(ddf, 0.01), f"df={df} exact={ex} ddf={ddf}"


def test_df_from_ukln_by_lambda_total():
    lambdas = np.linspace(0, 1, 5)
    ukln_by_lambda, exact = make_gaussian_ukln(lambdas, n_samples=4000)
    df, err = df_from_ukln_by_lambda(ukln_by_lambda)
    np.testing.assert_allclose(df, exact.sum(), atol=5 * max(err, 0.02))
    assert err > 0


def test_exp_estimator():
    u_fn, sample_fn, exact = make_gaussian_testsystem(sigma1=1.2)
    x0 = sample_fn(0.0, 50000, seed=1)
    w_f = u_fn(x0, 1.0) - u_fn(x0, 0.0)
    df = float(EXP(w_f))
    np.testing.assert_allclose(df, exact(0.0, 1.0), atol=0.05)


def test_bar_from_works():
    u_fn, sample_fn, exact = make_gaussian_testsystem()
    n = 4000
    x0 = sample_fn(0.0, n, seed=3)
    x1 = sample_fn(1.0, n, seed=4)
    w_f = u_fn(x0, 1.0) - u_fn(x0, 0.0)
    w_r = u_fn(x1, 0.0) - u_fn(x1, 1.0)
    df, ddf = bar(w_f, w_r)
    assert abs(df - exact(0.0, 1.0)) < 5 * ddf


def test_works_from_ukln_roundtrip(rng):
    u_kln = rng.normal(size=(2, 2, 50))
    w_f, w_r = works_from_ukln(u_kln)
    np.testing.assert_allclose(w_f, u_kln[0, 1] - u_kln[0, 0])
    np.testing.assert_allclose(w_r, u_kln[1, 0] - u_kln[1, 1])


def test_bootstrap_and_pessimistic_uncertainty():
    ukln_by_lambda, exact = make_gaussian_ukln(np.array([0.0, 1.0]), n_samples=500)
    df, ddf = bar_with_pessimistic_uncertainty(ukln_by_lambda[0], n_bootstrap=20)
    assert ddf > 0
    assert abs(df - exact[0]) < 6 * ddf
    full, err, samples = bootstrap_bar(ukln_by_lambda[0], n_bootstrap=20)
    assert len(samples) == 20
    assert np.std(samples) < 0.5


def test_pair_overlap():
    # identical states -> overlap ~ 1
    ukln_same, _ = make_gaussian_ukln(np.array([0.5, 0.5]), n_samples=2000)
    assert pair_overlap_from_ukln(ukln_same[0]) > 0.95
    # far-apart states -> overlap ~ 0
    u_fn, sample_fn, _ = make_gaussian_testsystem(mu1=30.0, sigma1=1.0)
    x0 = sample_fn(0.0, 500, seed=0)
    x1 = sample_fn(1.0, 500, seed=1)
    u_kln = np.array([[u_fn(x0, 0.0), u_fn(x0, 1.0)], [u_fn(x1, 0.0), u_fn(x1, 1.0)]])
    assert pair_overlap_from_ukln(u_kln) < 0.05


def test_fwd_reverse_convergence():
    ukln_by_lambda, exact = make_gaussian_ukln(np.linspace(0, 1, 3), n_samples=400)
    fwd, fwd_err, rev, rev_err = compute_fwd_and_reverse_df_over_time(ukln_by_lambda, frames_per_step=100)
    assert len(fwd) == 4
    np.testing.assert_allclose(fwd[-1], rev[-1], atol=1e-8)  # full-data estimates identical
    assert abs(fwd[-1] - exact.sum()) < 0.3


def test_mbar_differentiable():
    """The native MBAR solve is differentiable w.r.t. energies (forcefield
    training contract)."""
    import jax
    import jax.numpy as jnp

    u_fn, sample_fn, exact = make_gaussian_testsystem()
    n = 500
    x0 = sample_fn(0.0, n, seed=7)
    x1 = sample_fn(1.0, n, seed=8)
    x_all = np.concatenate([x0, x1])

    def df_of_shift(shift):
        u_kn = jnp.stack([u_fn(x_all, 0.0), u_fn(x_all, 1.0) + shift])
        f_k, _ = solve_mbar(u_kn, np.array([n, n]))
        return f_k[1]

    # dF/d(constant energy shift) == 1 exactly
    g = jax.grad(df_of_shift)(0.0)
    np.testing.assert_allclose(float(g), 1.0, rtol=1e-4)


def test_mbar_poisoned_samples_zero_measure():
    """Overflow-poisoned samples (u = +inf in EVERY state, the
    fe/energy_decomposition NaN→+inf semantics) must carry exactly zero
    weight and not corrupt f_k, weights, or the covariance SVD (the r5
    end-to-end overflow test exposed inf-inf=NaN here; fe/mbar.py drops
    zero-measure samples explicitly)."""
    from timemachine_tpu.fe.mbar import mbar_weights

    u_fn, sample_fn, exact = make_gaussian_testsystem()
    lambdas = np.linspace(0, 1, 3)
    n = 2000
    samples = [sample_fn(l, n, seed=10 + i) for i, l in enumerate(lambdas)]
    x_all = np.concatenate(samples)
    u_kn = np.stack([u_fn(x_all, l) for l in lambdas])
    n_k = np.full(len(lambdas), n)

    # clean solution
    f_clean, _ = solve_mbar(u_kn, n_k)

    # poison 7 scattered samples in every state (a corrupt frame is corrupt
    # under every evaluation fn)
    u_poisoned = u_kn.copy()
    bad = [3, 100, 999, 2000, 2500, 4500, 5999]
    u_poisoned[:, bad] = np.inf
    f_poisoned, _ = solve_mbar(u_poisoned, n_k)
    assert np.all(np.isfinite(np.asarray(f_poisoned)))
    # 7 of 6000 samples: estimate barely moves
    np.testing.assert_allclose(np.asarray(f_poisoned), np.asarray(f_clean), atol=0.02)

    w = np.asarray(mbar_weights(np.asarray(f_poisoned), u_poisoned, n_k))
    assert np.all(np.isfinite(w))
    assert np.all(w[bad] == 0.0)  # zero measure, exactly
    # columns sum to 1 up to the dropped measure (n_k still counts the
    # poisoned draws, so the normalization shifts by ~n_bad/N)
    np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=2 * len(bad) / u_kn.shape[1])

    # partially-poisoned samples (inf in SOME states) remain standard MBAR
    u_partial = u_kn.copy()
    u_partial[0, [5, 6]] = np.inf
    f_partial, _ = solve_mbar(u_partial, n_k)
    assert np.all(np.isfinite(np.asarray(f_partial)))
    mbar = MBAR(u_partial, n_k)
    res = mbar.compute_free_energy_differences()
    assert np.all(np.isfinite(res["Delta_f"])) and np.all(np.isfinite(res["dDelta_f"]))
