"""Nonbonded consistency vs the reference's pure-JAX oracle, across the
dense / pairlist / precomputed / interaction-group forms (mirrors
tests/nonbonded/* in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.constants import DEFAULT_NB_BETA, DEFAULT_NB_CUTOFF
from timemachine_tpu.ops import nonbonded as nb
from timemachine_tpu.ops.pbc import all_pairs_idxs

from .reference_loader import load_reference_module

ref_nb = load_reference_module("timemachine.potentials.nonbonded")

BETA = DEFAULT_NB_BETA
CUTOFF = DEFAULT_NB_CUTOFF


def random_system(rng, n, box_width=4.0):
    conf = rng.uniform(0, box_width, (n, 3))
    params = np.column_stack(
        [
            rng.normal(0, 1.0, n),  # q (pre-scaled)
            rng.uniform(0.05, 0.2, n),  # sig/2
            rng.uniform(0.1, 0.4, n),  # sqrt(eps)
            rng.uniform(0, 0.3, n),  # w
        ]
    )
    box = np.eye(3) * box_width
    return jnp.asarray(conf), jnp.asarray(params), jnp.asarray(box)


def random_exclusions(rng, n, n_excl):
    pairs = set()
    while len(pairs) < n_excl:
        i, j = rng.integers(0, n, 2)
        if i != j:
            pairs.add((min(i, j), max(i, j)))
    idxs = np.array(sorted(pairs), dtype=np.int32)
    scales = rng.uniform(0, 1, (len(idxs), 2))
    return idxs, scales


def test_all_pairs_dense_no_exclusions(rng):
    conf, params, box = random_system(rng, 24)
    n = conf.shape[0]
    ones = np.ones((n, n))

    def mine(c, p):
        return nb.nonbonded_all_pairs_dense(c, p, box, ones, ones, BETA, CUTOFF)

    def ref(c, p):
        return ref_nb.nonbonded(c, p, box, np.zeros((0, 2), dtype=np.int32), np.zeros((0, 2)), BETA, CUTOFF, runtime_validate=False)

    np.testing.assert_allclose(float(mine(conf, params)), float(ref(conf, params)), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jax.grad(mine)(conf, params)), np.asarray(jax.grad(ref)(conf, params)), rtol=1e-8, atol=1e-10
    )
    # du/dp (the forcefield-training derivative)
    np.testing.assert_allclose(
        np.asarray(jax.grad(mine, argnums=1)(conf, params)),
        np.asarray(jax.grad(ref, argnums=1)(conf, params)),
        rtol=1e-8,
        atol=1e-10,
    )


def test_all_pairs_dense_with_exclusions(rng):
    conf, params, box = random_system(rng, 20)
    n = conf.shape[0]
    excl_idxs, scales = random_exclusions(rng, n, 12)
    q_mask, lj_mask = nb.exclusions_to_rescale_masks(excl_idxs, scales, n)

    def mine(c, p):
        return nb.nonbonded_all_pairs_dense(c, p, box, jnp.asarray(q_mask), jnp.asarray(lj_mask), BETA, CUTOFF)

    def ref(c, p):
        return ref_nb.nonbonded(c, p, box, excl_idxs, scales, BETA, CUTOFF, runtime_validate=False)

    np.testing.assert_allclose(float(mine(conf, params)), float(ref(conf, params)), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jax.grad(mine)(conf, params)), np.asarray(jax.grad(ref)(conf, params)), rtol=1e-8, atol=1e-10
    )


def test_all_pairs_atom_subset(rng):
    """atom_mask deactivation == reference's atom_idxs filtering."""
    conf, params, box = random_system(rng, 18)
    n = conf.shape[0]
    atom_idxs = np.sort(np.asarray(rng.choice(n, size=10, replace=False), dtype=np.int32))
    mask = np.zeros(n)
    mask[atom_idxs] = 1.0
    ones = np.ones((n, n))

    mine = nb.nonbonded_all_pairs_dense(conf, params, box, ones, ones, BETA, CUTOFF, atom_mask=jnp.asarray(mask))
    ref = ref_nb.nonbonded(
        conf, params, box, np.zeros((0, 2), dtype=np.int32), np.zeros((0, 2)), BETA, CUTOFF,
        runtime_validate=False, atom_idxs=atom_idxs,
    )
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-10)


def test_nonbonded_block(rng):
    conf, params, box = random_system(rng, 30)
    xi, xj = conf[:10], conf[10:]
    pi, pj = params[:10], params[10:]
    mine = nb.nonbonded_block(xi, xj, box, pi, pj, BETA, CUTOFF)
    ref = ref_nb.nonbonded_block(xi, xj, box, pi, pj, BETA, CUTOFF)
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-10)
    mine_u = nb.nonbonded_block_unsummed(xi, xj, box, pi, pj, BETA, CUTOFF)
    ref_u = ref_nb.nonbonded_block_unsummed(xi, xj, box, pi, pj, BETA, CUTOFF)
    np.testing.assert_allclose(np.asarray(mine_u), np.asarray(ref_u), rtol=1e-10)


def test_on_specific_pairs(rng):
    conf, params, box = random_system(rng, 16)
    pairs = all_pairs_idxs(16)
    rescale = rng.uniform(0, 1, (len(pairs), 2))
    v_mine, e_mine = nb.nonbonded_on_specific_pairs(conf, params, box, jnp.asarray(pairs), BETA, CUTOFF, jnp.asarray(rescale))
    v_ref, e_ref = ref_nb.nonbonded_on_specific_pairs(conf, params, box, pairs, BETA, CUTOFF, rescale)
    np.testing.assert_allclose(np.asarray(v_mine), np.asarray(v_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(e_mine), np.asarray(e_ref), rtol=1e-10)


def test_on_specific_pairs_padding(rng):
    """-1 rows contribute nothing (static-shape convention)."""
    conf, params, box = random_system(rng, 8)
    pairs = all_pairs_idxs(8)
    v0, e0 = nb.nonbonded_on_specific_pairs(conf, params, box, jnp.asarray(pairs), BETA, CUTOFF)
    padded = np.vstack([pairs, [[-1, -1]] * 5]).astype(np.int32)
    v1, e1 = nb.nonbonded_on_specific_pairs(conf, params, box, jnp.asarray(padded), BETA, CUTOFF)
    np.testing.assert_allclose(float(jnp.sum(v0)), float(jnp.sum(v1)), rtol=1e-12)
    np.testing.assert_allclose(float(jnp.sum(e0)), float(jnp.sum(e1)), rtol=1e-12)


def test_on_precomputed_pairs(rng):
    conf, _, box = random_system(rng, 14)
    pairs = all_pairs_idxs(14)
    p = len(pairs)
    params = np.column_stack(
        [rng.normal(0, 1, p), rng.uniform(0.1, 0.4, p), rng.uniform(0.01, 0.2, p), rng.uniform(0, 0.2, p)]
    )
    v_mine, e_mine = nb.nonbonded_on_precomputed_pairs(conf, jnp.asarray(params), box, jnp.asarray(pairs), BETA, CUTOFF)
    v_ref, e_ref = ref_nb.nonbonded_on_precomputed_pairs(conf, params, box, pairs, BETA, CUTOFF)
    np.testing.assert_allclose(np.asarray(v_mine), np.asarray(v_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(e_mine), np.asarray(e_ref), rtol=1e-10)


def test_interaction_groups(rng):
    conf, params, box = random_system(rng, 20)
    a = np.arange(6, dtype=np.int32)
    b = np.arange(6, 20, dtype=np.int32)
    v_mine, e_mine = nb.nonbonded_interaction_groups(conf, params, box, a, b, BETA, CUTOFF)
    v_ref, e_ref = ref_nb.nonbonded_interaction_groups(conf, params, box, a, b, BETA, CUTOFF)
    np.testing.assert_allclose(float(jnp.sum(v_mine)), float(jnp.sum(v_ref)), rtol=1e-10)
    np.testing.assert_allclose(float(jnp.sum(e_mine)), float(jnp.sum(e_ref)), rtol=1e-10)


def test_coulomb_prefactors(rng):
    conf, params, box = random_system(rng, 25)
    x_lig, x_env = conf[:5], conf[5:]
    q_env = params[5:, 0]
    mine = nb.coulomb_prefactors_on_snapshot(x_lig, x_env, q_env, box, BETA, CUTOFF)
    ref = ref_nb.coulomb_prefactors_on_snapshot(x_lig, x_env, q_env, box, BETA, CUTOFF)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), rtol=1e-10)
    e_mine = nb.coulomb_interaction_group_energy(params[:5, 0], mine)
    e_ref = ref_nb.coulomb_interaction_group_energy(params[:5, 0], ref)
    np.testing.assert_allclose(float(e_mine), float(e_ref), rtol=1e-10)


def test_lj_prefactors(rng):
    conf, params, box = random_system(rng, 25)
    x_lig, x_env = conf[:5], conf[5:]
    sig_env, eps_env = params[5:, 1], params[5:, 2]
    mine = nb.lj_prefactors_on_snapshot(x_lig, x_env, sig_env, eps_env, box, CUTOFF)
    ref = ref_nb.lj_prefactors_on_snapshot(x_lig, x_env, sig_env, eps_env, box, CUTOFF)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), rtol=1e-8)
    e_mine = nb.lj_interaction_group_energy(params[:5, 1], params[:5, 2], mine)
    e_ref = ref_nb.lj_interaction_group_energy(params[:5, 1], params[:5, 2], ref)
    np.testing.assert_allclose(float(e_mine), float(e_ref), rtol=1e-8)
    # prefactor energies match direct evaluation
    direct_v, _ = nb.nonbonded_interaction_groups(conf, params.at[:, 3].set(0.0).at[:, 0].set(0.0), box, np.arange(5), np.arange(5, 25), BETA, CUTOFF)
    np.testing.assert_allclose(float(e_mine), float(jnp.sum(direct_v)), rtol=1e-6)


def test_switch_fn_properties():
    """{f, f', f''} -> 0 at cutoff, f ~ 1 at short range."""
    f = nb.switch_fn
    df = jax.grad(f)
    d2f = jax.grad(df)
    c = nb.SWITCH_CUTOFF
    assert abs(float(f(c - 1e-7))) < 1e-12
    assert abs(float(df(c - 1e-7))) < 1e-4
    assert abs(float(d2f(c - 1e-7))) < 1e-2
    assert float(f(0.1)) > 0.999999
    assert float(f(1.5)) == 0.0


def test_water_exclusion_fast_path_matches_generic():
    """Strided water exclusion energy (ops/nonbonded.py
    water_exclusion_energy) must match nonbonded_on_specific_pairs exactly
    (x64), including gradients and the Chebyshev-ES variant."""
    import jax

    from timemachine_tpu.ops.pallas.rowscan_kernel import es_energy_force_series

    rng = np.random.default_rng(0)
    n_wat, n = 40, 3 * 40 + 5
    conf = jnp.asarray(rng.uniform(0, 3.0, (n, 3)))
    box = jnp.asarray(np.eye(3) * 3.0)
    params = jnp.asarray(
        np.column_stack(
            [rng.uniform(-1, 1, n) * 11.7, rng.uniform(0.05, 0.17, n), rng.uniform(0, 0.8, n), np.zeros(n)]
        )
    )
    exc = []
    for w in range(n_wat):
        exc += [[3 * w, 3 * w + 1], [3 * w, 3 * w + 2], [3 * w + 1, 3 * w + 2]]
    exc += [[3 * n_wat, 3 * n_wat + 2]]  # generic tail breaks the pattern
    exc = np.array(exc, np.int32)
    scales = np.ones((len(exc), 2))
    scales[-1] = [0.5, 0.4]

    assert nb.leading_water_exclusions(exc, scales) == n_wat

    for h in (None, es_energy_force_series(2.0, 1.2)[0]):
        vdW, es = nb.nonbonded_on_specific_pairs(
            conf, params, box, jnp.asarray(exc[: 3 * n_wat]), 2.0, cutoff=1.2,
            rescale_mask=jnp.asarray(scales[: 3 * n_wat]), es_poly_coeffs=h,
        )
        u_ref = float(jnp.sum(vdW) + jnp.sum(es))
        u_fast = float(nb.water_exclusion_energy(conf, params, box, n_wat, 2.0, 1.2, es_poly_coeffs=h))
        assert u_fast == pytest.approx(u_ref, rel=1e-12)
        g_fast = jax.grad(
            lambda c: nb.water_exclusion_energy(c, params, box, n_wat, 2.0, 1.2, es_poly_coeffs=h)
        )(conf)
        g_ref = jax.grad(
            lambda c: jnp.sum(
                jnp.stack(
                    nb.nonbonded_on_specific_pairs(
                        c, params, box, jnp.asarray(exc[: 3 * n_wat]), 2.0, cutoff=1.2,
                        rescale_mask=jnp.asarray(scales[: 3 * n_wat]), es_poly_coeffs=h,
                    )
                )
            )
        )(conf)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-10)


def test_exclusion_energy_force_analytic_matches_autodiff():
    """Nonbonded._exclusion_energy_force (water strided block + closed-form
    generic tail, used by the Pallas MD provider) must match
    value_and_grad(_exclusion_energy) exactly."""
    import jax

    from timemachine_tpu import potentials

    rng = np.random.default_rng(9)
    nw = 8
    n = 3 * nw + 10
    # strided waters then a 10-atom "solute" with chained exclusions
    conf = jnp.asarray(rng.uniform(0, 2.5, (n, 3)))
    box = jnp.eye(3) * 2.5
    params = np.column_stack(
        [rng.normal(0, 8, n), rng.uniform(0.05, 0.2, n), rng.uniform(0.1, 0.9, n), np.zeros(n)]
    )
    excl, scales = [], []
    for w in range(nw):
        o, h1, h2 = 3 * w, 3 * w + 1, 3 * w + 2
        excl += [[o, h1], [o, h2], [h1, h2]]
        scales += [[1.0, 1.0]] * 3
    for i in range(3 * nw, n - 1):
        excl.append([i, i + 1])
        scales.append([1.0, 1.0] if i % 2 else [0.5, 0.5])
    nb = potentials.Nonbonded(
        n, np.array(excl, np.int32), np.array(scales, np.float64), 2.0, 1.2
    )
    # engage the polynomial-ES analytic tail without compiling a TPU kernel
    nb.impl = "pallas"
    coeffs = np.polynomial.chebyshev.chebfit(
        np.linspace(-1, 1, 400), np.exp(-2.0 * np.linspace(0, 1.2, 400)), 14
    )
    nb._all_pairs.es_h_coeffs = lambda: coeffs

    p = jnp.asarray(params)
    u_ref, g_ref = jax.value_and_grad(nb._exclusion_energy)(conf, p, box)
    u, g = nb._exclusion_energy_force(conf, p, box)
    np.testing.assert_allclose(float(u), float(u_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-9, atol=1e-8)
