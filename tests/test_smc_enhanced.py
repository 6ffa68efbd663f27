"""SMC, enhanced sampling, reweighting, protocol optimization, RMSD align.

Parity targets: reference tests/test_smc.py, tests/test_enhanced.py (scaled
down), tests/test_reweighting.py, tests/test_optimize_protocol.py.
"""

import functools

import numpy as np
import pytest
from scipy.special import logsumexp

from timemachine_tpu.md import smc

# -- smc ----------------------------------------------------------------------


def _gaussian_smc_setup(n_walkers=100, seed=0):
    """lambda interpolates stddev 1 -> 0.5; log_Z ratio known analytically."""
    rng = np.random.default_rng(seed)

    def u(x, lam):
        # u(x, lam) = x^2 / (2 sigma(lam)^2), sigma interpolates 1 -> 0.5
        sigma = 1.0 - 0.5 * lam
        return 0.5 * np.square(x).sum() / sigma**2

    def propagate(xs, lam):
        # exact resampling-free Gaussian MCMC: independent draws, always accepted
        sigma = 1.0 - 0.5 * lam
        return [sigma * rng.normal(size=np.shape(x)) for x in xs]

    def log_prob(xs, lam, first=True):
        return np.array([-u(x, lam) for x in xs])

    samples = [rng.normal(size=(1,)) for _ in range(n_walkers)]
    return samples, propagate, log_prob


def test_smc_fixed_schedule_free_energy():
    samples, propagate, log_prob = _gaussian_smc_setup()
    lambdas = np.linspace(0, 1, 11)
    find_next = functools.partial(smc.fixed_find_next_lambda, log_prob=log_prob, lambdas=lambdas)
    res = smc.sequential_monte_carlo(samples, propagate, log_prob, smc.conditional_multinomial_resample, find_next)
    # dF = -log(Z_1/Z_0) = -log(sigma_1/sigma_0) = -log(0.5) per dof
    final_log_weights = res["log_weights_traj"][-1]
    df_est = -(logsumexp(final_log_weights) - np.log(len(final_log_weights)))
    df_exact = -np.log(0.5)
    assert df_est == pytest.approx(df_exact, abs=0.15)
    assert res["lambdas_traj"][0] == 0.0 and res["lambdas_traj"][-1] == 1.0


def test_smc_adaptive_schedule():
    samples, propagate, log_prob = _gaussian_smc_setup(seed=3)
    find_next = functools.partial(smc.adaptive_find_next_lambda, log_prob=log_prob, cess_target=50.0)
    res = smc.sequential_monte_carlo(samples, propagate, log_prob, smc.multinomial_resample, find_next)
    lambdas = res["lambdas_traj"]
    assert lambdas[0] == 0.0 and lambdas[-1] == 1.0
    assert np.all(np.diff(lambdas) > 0)
    final_log_weights = res["log_weights_traj"][-1]
    df_est = -(logsumexp(final_log_weights) - np.log(len(final_log_weights)))
    assert df_est == pytest.approx(-np.log(0.5), abs=0.2)


def test_resamplers_preserve_weight_mass():
    rng = np.random.default_rng(1)
    log_weights = rng.normal(size=64)
    for resample in [smc.identity_resample, smc.multinomial_resample, smc.stratified_resample]:
        idxs, new_log_weights = resample(log_weights)
        assert len(idxs) == 64
        # total weight (log-mean) preserved
        assert logsumexp(new_log_weights) == pytest.approx(logsumexp(log_weights), abs=1e-8)


def test_effective_sample_size_bounds():
    n = 50
    uniform = np.zeros(n)
    assert float(smc.effective_sample_size(uniform)) == pytest.approx(n)
    degenerate = np.full(n, -np.inf)
    degenerate[0] = 0.0
    assert float(smc.effective_sample_size(degenerate)) == pytest.approx(1.0)


def test_conditional_resample_threshold():
    n = 40
    uniform = np.zeros(n)
    idxs, _ = smc.conditional_multinomial_resample(uniform, thresh=0.5)
    np.testing.assert_array_equal(idxs, np.arange(n))  # high ESS: identity


# -- rmsd alignment -----------------------------------------------------------


def test_align_x2_unto_x1_exact_recovery():
    from timemachine_tpu.ops.rmsd import align_x2_unto_x1

    rng = np.random.default_rng(4)
    x1 = rng.normal(size=(17, 3))
    theta = 1.1
    R = np.array([[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    x2 = x1 @ R.T + np.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(np.asarray(align_x2_unto_x1(x1, x2)), x1, atol=1e-10)


def test_rmsd_restraint_zero_when_aligned():
    from timemachine_tpu.ops.rmsd import rmsd_restraint

    rng = np.random.default_rng(5)
    x = rng.normal(size=(8, 3))
    conf = np.concatenate([x, x + 5.0])  # identical shape, offset: zero rotation
    u = float(rmsd_restraint(conf, None, None, np.arange(8), np.arange(8, 16), k=10.0))
    assert u == pytest.approx(0.0, abs=1e-8)


# -- reweighting --------------------------------------------------------------


def test_one_sided_exp_gaussian():
    from timemachine_tpu.fe.reweighting import one_sided_exp

    # w ~ N(mu, s^2) => -log<e^-w> = mu - s^2/2
    rng = np.random.default_rng(6)
    mu, s = 2.0, 0.5
    w = rng.normal(mu, s, size=200_000)
    assert float(one_sided_exp(w)) == pytest.approx(mu - s**2 / 2, abs=0.02)


def test_interpret_as_mixture_potential_single_state():
    from timemachine_tpu.fe.reweighting import interpret_as_mixture_potential

    rng = np.random.default_rng(7)
    u_kn = rng.normal(size=(1, 100))
    mix = np.asarray(interpret_as_mixture_potential(u_kn, np.zeros(1), np.array([100])))
    np.testing.assert_allclose(mix, u_kn[0], atol=1e-10)


def test_mixture_reweighting_estimator_consistency():
    """With ref == mixture of the two endstates and exact f_k, estimator
    recovers the analytic Gaussian df."""
    from timemachine_tpu.fe.reweighting import (
        construct_mixture_reweighting_estimator,
        interpret_as_mixture_potential,
    )

    rng = np.random.default_rng(8)
    s0, s1 = 1.0, 0.6
    n = 50_000
    xs = np.concatenate([rng.normal(0, s0, n), rng.normal(0, s1, n)])

    def u0(x, params):
        return 0.5 * x**2 / params[0] ** 2

    def u1(x, params):
        return 0.5 * x**2 / params[1] ** 2

    f0 = np.log(s0)  # -log Z up to shared constant (Z = sqrt(2 pi) s)
    f1 = np.log(s1)
    u_kn = np.stack([u0(xs, (s0, s1)), u1(xs, (s0, s1))])
    u_ref_n = interpret_as_mixture_potential(u_kn, -np.array([f0, f1]), np.array([n, n]))

    est = construct_mixture_reweighting_estimator(xs, u_ref_n, lambda x, p: u0(np.asarray(x), p), lambda x, p: u1(np.asarray(x), p))
    df = float(est((s0, s1)))
    df_exact = np.log(s0 / s1)
    assert df == pytest.approx(df_exact, abs=0.02)


# -- protocol optimization ----------------------------------------------------


def test_greedy_protocol_gaussian_ladder():
    """Protocol built from reweighted overlap distances on a Gaussian ladder
    is monotone, spans [0, 1], and respects the target distance."""
    from timemachine_tpu.fe.mbar import solve_mbar
    from timemachine_tpu.optimize.protocol import (
        greedily_optimize_protocol,
        make_fast_approx_overlap_distance_fxn,
    )

    rng = np.random.default_rng(9)
    lambdas = np.linspace(0, 1, 8)
    sigmas = 1.0 - 0.7 * lambdas
    n_per = 400
    xs = np.concatenate([rng.normal(0, s, n_per) for s in sigmas])
    u_kn = np.stack([0.5 * xs**2 / s**2 for s in sigmas])
    N_k = np.full(len(lambdas), n_per)
    f_k, _ = solve_mbar(u_kn, N_k)
    dist = make_fast_approx_overlap_distance_fxn(lambdas, u_kn, np.asarray(f_k), N_k)

    protocol = np.asarray(greedily_optimize_protocol(dist, target_distance=0.4))
    assert protocol[0] == 0.0 and protocol[-1] == 1.0
    assert np.all(np.diff(protocol) > 0)
    for a, b in zip(protocol[:-2], protocol[1:-1]):
        assert float(dist(a, b)) <= 0.45  # placed at ~target distance


# -- enhanced sampling --------------------------------------------------------


@pytest.fixture(scope="module")
def small_mol():
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.chem.embed import embed_mol

    mol = mol_from_smiles("CCCCO")
    embed_mol(mol, seed=3)
    return mol


def test_vacuum_state_energies(small_mol):
    import warnings

    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.md.enhanced import VacuumState
    from timemachine_tpu.fe.utils import get_romol_conf

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        state = VacuumState(small_mol, Forcefield.load_default())
    x0 = get_romol_conf(small_mol)
    u_easy, u_full, u_decharged = float(state.U_easy(x0)), float(state.U_full(x0)), float(state.U_decharged(x0))
    assert np.isfinite([u_easy, u_full, u_decharged]).all()
    # U_easy drops terms, so it differs from U_full
    assert u_easy != u_full


def test_generate_log_weighted_samples(small_mol):
    import warnings

    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.md import enhanced

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        state = enhanced.VacuumState(small_mol, Forcefield.load_default())
    xvs, log_weights = enhanced.generate_log_weighted_samples(
        small_mol, 300.0, state.U_easy, state.U_full, seed=5, steps_per_batch=25, num_batches=48,
        num_workers=4, burn_in_batches=10,
    )
    assert xvs.shape == (48, 2, small_mol.num_atoms, 3)
    assert np.isfinite(log_weights).all()
    ess = float(smc.effective_sample_size(log_weights))
    assert 1.0 <= ess <= 48.0

    resampled = enhanced.sample_from_log_weights(list(xvs), log_weights, size=16)
    assert len(resampled) == 16


def test_identify_rotatable_bonds():
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.md.enhanced import identify_rotatable_bonds

    mol = mol_from_smiles("CCc1ccccc1OC(=O)C")
    bonds = identify_rotatable_bonds(mol)
    assert len(bonds) >= 2
    for i, j in bonds:
        assert i < j


def test_align_and_replace(small_mol):
    from timemachine_tpu.md.enhanced import align_and_replace
    from timemachine_tpu.fe.utils import get_romol_conf

    rng = np.random.default_rng(11)
    n_lig = small_mol.num_atoms
    x_solvent = rng.normal(size=(n_lig + 30, 3))
    x_vacuum = get_romol_conf(small_mol)
    replaced = np.asarray(align_and_replace(x_vacuum, x_solvent))
    # solvent part untouched
    np.testing.assert_array_equal(replaced[:30], x_solvent[:30])
    # ligand part is a rigid transform of x_vacuum: same internal distances
    d_new = np.linalg.norm(replaced[30:][:, None] - replaced[30:][None, :], axis=-1)
    d_old = np.linalg.norm(x_vacuum[:, None] - x_vacuum[None, :], axis=-1)
    np.testing.assert_allclose(d_new, d_old, atol=1e-6)
