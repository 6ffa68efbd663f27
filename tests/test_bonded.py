"""Bonded + chiral term consistency vs the reference's pure-JAX oracle.

Mirrors the reference test strategy (tests/test_bonded.py,
test_chiral_restraints.py): random geometries, energies AND gradients agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops import bonded, chiral

from .reference_loader import load_reference_module

ref_bonded = load_reference_module("timemachine.potentials.bonded")
ref_chiral = load_reference_module("timemachine.potentials.chiral_restraints")


def random_conf(rng, n):
    return rng.uniform(0, 2.0, (n, 3))


def check_match(u_mine, u_ref, conf, *args, rtol=1e-10):
    mine = float(u_mine(conf, *args))
    ref = float(u_ref(conf, *args))
    np.testing.assert_allclose(mine, ref, rtol=rtol)
    g_mine = jax.grad(u_mine)(conf, *args)
    g_ref = jax.grad(u_ref)(conf, *args)
    np.testing.assert_allclose(np.asarray(g_mine), np.asarray(g_ref), rtol=1e-8, atol=1e-10)


def test_harmonic_bond(rng):
    n = 20
    conf = jnp.asarray(random_conf(rng, n))
    idxs = np.array([[i, (i + 1) % n] for i in range(n)], dtype=np.int32)
    params = jnp.asarray(rng.uniform(1, 100, (n, 2)))
    check_match(
        lambda c, p: bonded.harmonic_bond(c, p, None, idxs),
        lambda c, p: ref_bonded.harmonic_bond(c, p, None, idxs),
        conf,
        params,
    )


def test_harmonic_bond_zero_r0(rng):
    conf = jnp.asarray(random_conf(rng, 4))
    idxs = np.array([[0, 1], [2, 3]], dtype=np.int32)
    params = jnp.array([[10.0, 0.0], [5.0, 0.1]])
    check_match(
        lambda c, p: bonded.harmonic_bond(c, p, None, idxs),
        lambda c, p: ref_bonded.harmonic_bond(c, p, None, idxs),
        conf,
        params,
    )


def test_harmonic_bond_padding(rng):
    """-1 padded rows are inert (TPU static-shape convention; no ref analog)."""
    conf = jnp.asarray(random_conf(rng, 6))
    idxs = np.array([[0, 1], [2, 3]], dtype=np.int32)
    params = jnp.asarray(rng.uniform(1, 100, (2, 2)))
    base = bonded.harmonic_bond(conf, params, None, idxs)
    padded_idxs = np.vstack([idxs, [[-1, -1], [-1, -1]]]).astype(np.int32)
    padded_params = jnp.vstack([params, jnp.ones((2, 2)) * 1e6])
    padded = bonded.harmonic_bond(conf, padded_params, None, padded_idxs)
    np.testing.assert_allclose(float(base), float(padded), rtol=1e-12)


def test_harmonic_angle(rng):
    n = 12
    conf = jnp.asarray(random_conf(rng, n))
    idxs = np.array([[i, (i + 1) % n, (i + 2) % n] for i in range(n)], dtype=np.int32)
    params = jnp.asarray(np.column_stack([rng.uniform(10, 100, n), rng.uniform(0.5, 3.0, n), np.zeros(n)]))
    check_match(
        lambda c, p: bonded.harmonic_angle(c, p, None, idxs),
        lambda c, p: ref_bonded.harmonic_angle(c, p, None, idxs),
        conf,
        params,
    )


def test_harmonic_angle_eps_stabilized(rng):
    conf = jnp.asarray(random_conf(rng, 3))
    idxs = np.array([[0, 1, 2]], dtype=np.int32)
    params = jnp.array([[50.0, 1.9, 1e-3]])
    check_match(
        lambda c, p: bonded.harmonic_angle(c, p, None, idxs),
        lambda c, p: ref_bonded.harmonic_angle(c, p, None, idxs),
        conf,
        params,
    )


def test_periodic_torsion(rng):
    n = 16
    conf = jnp.asarray(random_conf(rng, n))
    idxs = np.array([[i, (i + 1) % n, (i + 2) % n, (i + 3) % n] for i in range(n)], dtype=np.int32)
    params = jnp.asarray(
        np.column_stack([rng.uniform(1, 20, n), rng.uniform(-np.pi, np.pi, n), rng.integers(1, 6, n).astype(float)])
    )
    check_match(
        lambda c, p: bonded.periodic_torsion(c, p, None, idxs),
        lambda c, p: ref_bonded.periodic_torsion(c, p, None, idxs),
        conf,
        params,
    )


def test_flat_bottom_bond(rng):
    n = 10
    conf = jnp.asarray(random_conf(rng, n))
    box = jnp.eye(3) * 3.0
    idxs = np.array([[i, (i + 3) % n] for i in range(n)], dtype=np.int32)
    params = jnp.asarray(np.column_stack([rng.uniform(100, 1000, n), rng.uniform(0.1, 0.3, n), rng.uniform(0.4, 0.6, n)]))
    check_match(
        lambda c, p: bonded.flat_bottom_bond(c, p, box, idxs),
        lambda c, p: ref_bonded.flat_bottom_bond(c, p, box, idxs),
        conf,
        params,
    )


def test_log_flat_bottom_bond(rng):
    n = 6
    conf = jnp.asarray(random_conf(rng, n))
    box = jnp.eye(3) * 3.0
    idxs = np.array([[i, (i + 2) % n] for i in range(n)], dtype=np.int32)
    # keep r outside the flat bottom so 1 - exp(-beta*U) > 0
    params = jnp.asarray(np.column_stack([rng.uniform(100, 1000, n), np.full(n, 1e-4), np.full(n, 2e-4)]))
    beta = 1.0 / 2.494
    check_match(
        lambda c, p: bonded.log_flat_bottom_bond(c, p, box, idxs, beta),
        lambda c, p: ref_bonded.log_flat_bottom_bond(c, p, box, idxs, beta),
        conf,
        params,
    )


def test_centroid_restraint(rng):
    conf = jnp.asarray(random_conf(rng, 10))
    ga = np.arange(4, dtype=np.int32)
    gb = np.arange(4, 10, dtype=np.int32)
    check_match(
        lambda c, p: bonded.centroid_restraint(c, p, None, ga, gb, 25.0, 0.4),
        lambda c, p: ref_bonded.centroid_restraint(c, p, None, ga, gb, 25.0, 0.4),
        conf,
        jnp.zeros(1),
    )
    check_match(
        lambda c, p: bonded.centroid_restraint(c, p, None, ga, gb, 25.0, 0.0),
        lambda c, p: ref_bonded.centroid_restraint(c, p, None, ga, gb, 25.0, 0.0),
        conf,
        jnp.zeros(1),
    )


def test_chiral_atom_restraint(rng):
    n = 8
    conf = jnp.asarray(random_conf(rng, n))
    idxs = np.array([[0, 1, 2, 3], [4, 5, 6, 7], [1, 0, 3, 2]], dtype=np.int32)
    params = jnp.asarray(rng.uniform(100, 1000, 3))
    check_match(
        lambda c, p: chiral.chiral_atom_restraint(c, p, None, idxs),
        lambda c, p: ref_chiral.chiral_atom_restraint(c, p, None, idxs),
        conf,
        params,
    )


def test_chiral_bond_restraint(rng):
    n = 8
    conf = jnp.asarray(random_conf(rng, n))
    idxs = np.array([[0, 1, 2, 3], [4, 5, 6, 7]], dtype=np.int32)
    signs = np.array([1, -1], dtype=np.int32)
    params = jnp.asarray(rng.uniform(100, 1000, 2))
    check_match(
        lambda c, p: chiral.chiral_bond_restraint(c, p, None, idxs, signs),
        lambda c, p: ref_chiral.chiral_bond_restraint(c, p, None, idxs, signs),
        conf,
        params,
    )


def test_empty_terms():
    conf = jnp.zeros((4, 3))
    assert float(bonded.harmonic_bond(conf, jnp.zeros((0, 2)), None, np.zeros((0, 2), dtype=np.int32))) == 0.0
    assert float(bonded.periodic_torsion(conf, jnp.zeros((0, 3)), None, np.zeros((0, 4), dtype=np.int32))) == 0.0
    assert float(chiral.chiral_atom_restraint(conf, jnp.zeros(0), None, np.zeros((0, 4), dtype=np.int32))) == 0.0


def test_positional_restraint(rng):
    conf = jnp.asarray(random_conf(rng, 5))
    conf2 = conf + 0.05 * jnp.asarray(rng.normal(size=(5, 3)))
    box = jnp.eye(3) * 3.0
    mine = bonded.harmonic_positional_restraint(conf, conf2, box, k=100.0)
    ref = ref_bonded.harmonic_positional_restraint(conf, conf2, box, k=100.0)
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-10)


def test_water_pattern_fast_path_matches_generic():
    """The strided-lane water fast path (ops/bonded.py _water_bond_energy /
    _water_angle_energy) must be numerically identical (x64) to the generic
    gather implementation, including gradients and the generic tail rows."""
    import jax

    from timemachine_tpu.ops import bonded as bonded_mod

    rng = np.random.default_rng(0)
    nw = 50
    n = 3 * nw + 7
    conf = jnp.asarray(rng.normal(0, 1, (n, 3)))

    saved = bonded_mod.WATER_FAST_PATH
    try:
        bonded_mod.WATER_FAST_PATH = True
        bidx = []
        for w in range(nw):
            bidx += [[3 * w, 3 * w + 1], [3 * w, 3 * w + 2]]
        bidx += [[3 * nw, 3 * nw + 3], [3 * nw + 1, 3 * nw + 5], [-1, -1]]
        bidx = np.array(bidx, np.int32)
        bp = jnp.asarray(rng.uniform(100, 500, (len(bidx), 2)))
        # numpy idxs trigger pattern detection; jnp idxs force the generic path
        u_fast = bonded.harmonic_bond(conf, bp, None, bidx)
        u_ref = bonded.harmonic_bond(conf, bp, None, jnp.asarray(bidx))
        assert float(u_fast) == pytest.approx(float(u_ref), rel=1e-12)
        g_fast = jax.grad(lambda c: bonded.harmonic_bond(c, bp, None, bidx))(conf)
        g_ref = jax.grad(lambda c: bonded.harmonic_bond(c, bp, None, jnp.asarray(bidx)))(conf)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-9)

        aidx = [[3 * w + 1, 3 * w, 3 * w + 2] for w in range(nw)] + [[3 * nw, 3 * nw + 1, 3 * nw + 2]]
        aidx = np.array(aidx, np.int32)
        ap = jnp.asarray(
            np.column_stack(
                [rng.uniform(100, 500, len(aidx)), rng.uniform(1.5, 2.0, len(aidx)), np.full(len(aidx), 1e-3)]
            )
        )
        u_fast = bonded.harmonic_angle(conf, ap, None, aidx)
        u_ref = bonded.harmonic_angle(conf, ap, None, jnp.asarray(aidx))
        assert float(u_fast) == pytest.approx(float(u_ref), rel=1e-10)
        g_fast = jax.grad(lambda c: bonded.harmonic_angle(c, ap, None, aidx))(conf)
        g_ref = jax.grad(lambda c: bonded.harmonic_angle(c, ap, None, jnp.asarray(aidx)))(conf)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-9)
    finally:
        # restore — leaking False here disabled the fast path for every
        # later test in the suite
        bonded_mod.WATER_FAST_PATH = saved


def test_analytic_bonded_forces_match_autodiff():
    """generic_bond/angle/torsion_energy_force (closed-form forward forces,
    ops/bonded.py) must match the autodiff gradient of the energy fns to
    machine precision in x64, including eps-stabilized angles and padded
    rows (where the torsion autodiff reference NaNs via the where-mask
    gradient leak — the analytic path must stay finite)."""
    import jax

    from timemachine_tpu.ops import bonded as b

    rng = np.random.default_rng(11)

    def rows(n_rows, width, nat):
        return np.stack([rng.choice(nat, size=width, replace=False) for _ in range(n_rows)]).astype(np.int32)

    nat = 60
    for _ in range(3):
        conf = jnp.asarray(rng.normal(0, 1.2, (nat, 3)))

        bidx = rows(30, 2, nat)
        bp = jnp.asarray(
            np.column_stack(
                [rng.uniform(100, 500, 30), np.where(rng.random(30) < 0.2, 0.0, rng.uniform(0.1, 0.2, 30))]
            )
        )
        u1, f1 = b.generic_bond_energy_force(conf, bp, None, bidx)
        u2, g2 = jax.value_and_grad(lambda c: b.harmonic_bond(c, bp, None, bidx))(conf)
        assert abs(float(u1 - u2)) < 1e-9
        np.testing.assert_allclose(np.asarray(f1), -np.asarray(g2), atol=1e-9)

        aidx = rows(20, 3, nat)
        eps = np.where(rng.random(20) < 0.5, 0.0, rng.uniform(1e-4, 5e-2, 20))
        ap = jnp.asarray(np.column_stack([rng.uniform(100, 400, 20), rng.uniform(1.0, 2.8, 20), eps]))
        u1, f1 = b.generic_angle_energy_force(conf, ap, None, aidx)
        u2, g2 = jax.value_and_grad(lambda c: b.harmonic_angle(c, ap, None, aidx))(conf)
        assert abs(float(u1 - u2)) < 1e-9
        np.testing.assert_allclose(np.asarray(f1), -np.asarray(g2), atol=1e-9)

        core = rows(25, 4, nat)
        tidx = np.concatenate([core, [[-1, -1, -1, -1]]]).astype(np.int32)
        tp = jnp.asarray(
            np.column_stack(
                [rng.uniform(1, 60, 26), rng.uniform(-3, 3, 26), rng.integers(1, 6, 26).astype(float)]
            )
        )
        u1, f1 = b.torsion_energy_force(conf, tp, None, tidx)
        assert np.all(np.isfinite(np.asarray(f1)))  # padded row stays finite
        # autodiff reference over the unpadded rows (padded rows NaN under grad)
        u2, g2 = jax.value_and_grad(lambda c: b.periodic_torsion(c, tp[:25], None, core))(conf)
        assert abs(float(u1 - u2)) < 1e-9
        np.testing.assert_allclose(np.asarray(f1), -np.asarray(g2), atol=1e-9)
