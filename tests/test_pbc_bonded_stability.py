"""Periodic-geometry utilities and bonded-term numerical stability.

Parity targets: reference tests/test_jax_utils.py (delta_r/distance
semantics), tests/test_bonded_stable.py (angles stable at collinear
geometries), tests/test_bonded.py (restraint forms).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops import bonded
from timemachine_tpu.ops import pbc


# -- ops/pbc ------------------------------------------------------------------


def _brute_force_min_image(ri, rj, box_diag):
    """Minimum |ri - rj + n*box| over a 9x9x9 image block (points may sit
    several box lengths apart)."""
    best = np.inf
    rng4 = range(-4, 5)
    for nx in rng4:
        for ny in rng4:
            for nz in rng4:
                d = ri - rj + np.array([nx, ny, nz]) * box_diag
                best = min(best, float(np.linalg.norm(d)))
    return best


def test_periodic_delta_matches_brute_force_images():
    rng = np.random.default_rng(0)
    box_diag = np.array([2.0, 3.0, 2.5])
    box = np.diag(box_diag)
    for _ in range(50):
        ri = rng.uniform(-5, 5, 3)
        rj = rng.uniform(-5, 5, 3)
        d = np.linalg.norm(np.asarray(pbc.periodic_delta(ri, rj, box)))
        assert d == pytest.approx(_brute_force_min_image(ri, rj, box_diag), abs=1e-10)
        # min-image displacement never exceeds half the box diagonal
        assert (np.abs(np.asarray(pbc.periodic_delta(ri, rj, box))) <= box_diag / 2 + 1e-12).all()


def test_periodic_delta_vacuum():
    ri, rj = np.array([10.0, 0.0, 0.0]), np.array([0.0, 0.0, 0.0])
    np.testing.assert_allclose(pbc.periodic_delta(ri, rj, None), ri - rj)


def test_lifted_distance_adds_w_in_quadrature():
    ri = np.array([[0.0, 0.0, 0.0]])
    rj = np.array([[3.0, 0.0, 0.0]])
    w = np.array([4.0])
    d = pbc.lifted_distance_on_pairs(ri, rj, box=None, w_offsets=w)
    np.testing.assert_allclose(d, [5.0], rtol=1e-12)  # 3-4-5


def test_lifted_distance_grad_safe_at_coincidence():
    """d == 0 at coincident points must give finite (zero) gradient — the
    softcore w=0, r=0 corner."""

    def f(ri):
        return jnp.sum(pbc.lifted_distance_on_pairs(ri, jnp.zeros((1, 3))))

    g = jax.grad(f)(jnp.zeros((1, 3)))
    assert np.isfinite(np.asarray(g)).all()


def test_pairwise_distance_matrix_consistency():
    rng = np.random.default_rng(1)
    box = np.diag([3.0, 3.0, 3.0])
    x = rng.uniform(0, 3, (6, 3))
    dm = np.asarray(pbc.pairwise_distance_matrix(x, box))
    assert dm.shape == (6, 6)
    np.testing.assert_allclose(dm, dm.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(dm), 0.0)
    for i in range(6):
        for j in range(i + 1, 6):
            expected = float(pbc.distance(x[i], x[j], box))
            assert dm[i, j] == pytest.approx(expected, abs=1e-6)

    # 4D lift
    w = rng.uniform(0, 1, 6)
    dm_w = np.asarray(pbc.pairwise_distance_matrix(x, box, w=jnp.asarray(w)))
    ij = (0, 3)
    expected = np.sqrt(dm[ij] ** 2 + (w[0] - w[3]) ** 2)
    assert dm_w[ij] == pytest.approx(expected, abs=1e-6)


def test_idxs_within_cutoff_brute_force():
    rng = np.random.default_rng(2)
    box = np.diag([4.0, 4.0, 4.0])
    x = rng.uniform(0, 4, (40, 3))
    x_lig = rng.uniform(0, 4, (3, 3))
    cutoff = 0.8
    got = set(np.asarray(pbc.idxs_within_cutoff(x, x_lig, box, cutoff=cutoff)).tolist())
    want = set()
    for i in range(40):
        for ell in range(3):
            if _brute_force_min_image(x[i], x_lig[ell], np.diagonal(box)) < cutoff:
                want.add(i)
    assert got == want


def test_image_molecules_preserves_geometry_and_wraps_centroids():
    rng = np.random.default_rng(3)
    box = np.diag([2.0, 2.0, 2.0])
    # two 3-atom "waters", one shifted far outside the box
    x = rng.uniform(0, 0.3, (6, 3))
    x[3:] += np.array([7.0, -5.0, 3.0])
    groups = [np.array([0, 1, 2]), np.array([3, 4, 5])]
    out = pbc.image_molecules(x, box, groups)
    for idxs in groups:
        centroid = out[idxs].mean(axis=0)
        assert ((centroid >= 0) & (centroid < np.diagonal(box))).all()
        # intra-molecular geometry untouched (rigid integer-box shift)
        np.testing.assert_allclose(
            out[idxs] - out[idxs][0], x[idxs] - x[idxs][0], atol=1e-12
        )


def test_pair_index_helpers():
    ap = pbc.all_pairs_idxs(5)
    assert ap.shape == (10, 2)
    assert (ap[:, 0] < ap[:, 1]).all()
    ig = pbc.interaction_group_idxs([0, 1], [7, 8, 9])
    assert ig.shape == (6, 2)
    assert set(map(tuple, ig)) == {(a, b) for a in (0, 1) for b in (7, 8, 9)}


# -- ops/bonded numerical stability --------------------------------------------


def test_stable_angle_at_collinear_geometry():
    """theta and d(theta)/dx stay finite at exactly collinear i-j-k — the
    reason for the Kahan half-angle form (ref test_bonded_stable.py)."""
    ci = jnp.array([[0.0, 0.0, 0.0]])
    cj = jnp.array([[1.0, 0.0, 0.0]])
    ck = jnp.array([[2.0, 0.0, 0.0]])  # exactly linear: theta = pi
    eps = jnp.array([1e-3])

    theta = bonded.stable_angle(ci, cj, ck, eps)
    assert np.isfinite(float(theta[0]))
    assert float(theta[0]) == pytest.approx(np.pi, abs=1e-2)

    def u(cj_):
        return jnp.sum(bonded.stable_angle(ci, cj_, ck, eps))

    g = jax.grad(u)(cj)
    assert np.isfinite(np.asarray(g)).all()


def test_harmonic_angle_force_finite_at_collinear():
    conf = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    params = jnp.array([[100.0, 1.9, 1e-3]])  # (k, theta0, eps)
    idxs = np.array([[0, 1, 2]], dtype=np.int32)
    box = jnp.eye(3) * 10.0

    u = bonded.harmonic_angle(conf, params, box, idxs)
    assert np.isfinite(float(u))
    g = jax.grad(lambda c: bonded.harmonic_angle(c, params, box, idxs))(conf)
    assert np.isfinite(np.asarray(g)).all()


def test_harmonic_angle_matches_arccos_away_from_singularity():
    rng = np.random.default_rng(4)
    conf = jnp.asarray(rng.normal(0, 1, (3, 3)))
    params = jnp.array([[150.0, 2.0, 0.0]])
    idxs = np.array([[0, 1, 2]], dtype=np.int32)
    u = float(bonded.harmonic_angle(conf, params, jnp.eye(3) * 99, idxs))

    x = np.asarray(conf)
    v1, v2 = x[0] - x[1], x[2] - x[1]
    theta = np.arccos(np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    assert u == pytest.approx(0.5 * 150.0 * (theta - 2.0) ** 2, rel=1e-6)


def test_harmonic_bond_r0_zero_grad_finite_at_coincidence():
    conf = jnp.zeros((2, 3))
    params = jnp.array([[1000.0, 0.0]])  # r0 = 0: k/2 d^2 fallback
    idxs = np.array([[0, 1]], dtype=np.int32)
    box = jnp.eye(3) * 10.0
    u = bonded.harmonic_bond(conf, params, box, idxs)
    assert float(u) == 0.0
    g = jax.grad(lambda c: bonded.harmonic_bond(c, params, box, idxs))(conf)
    assert np.isfinite(np.asarray(g)).all()


def test_signed_torsion_sign_convention_and_periodicity():
    """Butane-like 4-atom chain: phi = +pi/2 and -pi/2 staggered geometries
    are mirror images with opposite sign."""

    def frame(sign):
        return (
            jnp.array([[0.0, 1.0, sign * 0.0]]),
            jnp.array([[0.0, 0.0, 0.0]]),
            jnp.array([[1.0, 0.0, 0.0]]),
            jnp.array([[1.0, 0.0, sign * 1.0]]),
        )

    phi_pos = float(bonded.signed_torsion_angle(*frame(+1))[0])
    phi_neg = float(bonded.signed_torsion_angle(*frame(-1))[0])
    assert phi_pos == pytest.approx(-phi_neg, abs=1e-10)
    assert abs(phi_pos) == pytest.approx(np.pi / 2, abs=1e-10)


def test_periodic_torsion_energy_at_known_angles():
    # cis (phi=0) vs trans (phi=pi) for U = k (1 + cos(n phi - phase))
    ci = jnp.array([0.0, 1.0, 0.0])
    cj = jnp.array([0.0, 0.0, 0.0])
    ck = jnp.array([1.0, 0.0, 0.0])
    cl_cis = jnp.array([1.0, 1.0, 0.0])
    cl_trans = jnp.array([1.0, -1.0, 0.0])
    params = jnp.array([[5.0, 0.0, 1.0]])  # k=5, phase=0, n=1
    box = jnp.eye(3) * 99.0

    conf_cis = jnp.stack([ci, cj, ck, cl_cis])
    conf_trans = jnp.stack([ci, cj, ck, cl_trans])
    idxs = np.array([[0, 1, 2, 3]], dtype=np.int32)
    u_cis = float(bonded.periodic_torsion(conf_cis, params, box, idxs))
    u_trans = float(bonded.periodic_torsion(conf_trans, params, box, idxs))
    assert u_cis == pytest.approx(10.0, abs=1e-6)  # 1 + cos(0) = 2
    assert u_trans == pytest.approx(0.0, abs=1e-6)  # 1 + cos(pi) = 0


def test_flat_bottom_bond_zero_inside_well():
    box = jnp.eye(3) * 10.0
    idxs = np.array([[0, 1]], dtype=np.int32)
    params = jnp.array([[400.0, 0.2, 0.5]])  # (k, r_min, r_max)

    def conf_at(r):
        return jnp.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])

    assert float(bonded.flat_bottom_bond(conf_at(0.35), params, box, idxs)) == 0.0
    # quartic walls on both sides
    u_over = float(bonded.flat_bottom_bond(conf_at(0.7), params, box, idxs))
    assert u_over == pytest.approx(0.25 * 400.0 * 0.2**4, rel=1e-5)
    u_under = float(bonded.flat_bottom_bond(conf_at(0.1), params, box, idxs))
    assert u_under == pytest.approx(0.25 * 400.0 * 0.1**4, rel=1e-4)


def test_log_flat_bottom_infinite_at_zero_restraint_energy():
    """-1/beta log(1 - exp(-beta U)): U -> 0 inside the well means the
    log-inverse potential diverges (this is the 'stay OUTSIDE' selection
    potential of local MD)."""
    box = jnp.eye(3) * 10.0
    idxs = np.array([[0, 1]], dtype=np.int32)
    params = jnp.array([[400.0, 0.0, 0.5]])
    conf_inside = jnp.array([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0]])
    conf_outside = jnp.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]])
    u_inside = float(bonded.log_flat_bottom_bond(conf_inside, params, box, idxs, beta=1.0))
    u_outside = float(bonded.log_flat_bottom_bond(conf_outside, params, box, idxs, beta=1.0))
    assert np.isinf(u_inside)
    # far outside the well U_fb is large, exp(-beta U) ~ 0, so the
    # log-inverse term vanishes: the potential only repels from the well
    assert u_outside == pytest.approx(0.0, abs=1e-8)


def test_centroid_restraint_zero_at_b0_and_b0_zero_branch():
    conf = jnp.array(
        [[0.0, 0.0, 0.0], [0.2, 0.0, 0.0], [1.0, 0.0, 0.0], [1.2, 0.0, 0.0]]
    )
    ga, gb = np.array([0, 1]), np.array([2, 3])
    # centroid distance = 1.0
    u = float(bonded.centroid_restraint(conf, None, None, ga, gb, kb=50.0, b0=1.0))
    assert u == pytest.approx(0.0, abs=1e-10)
    u2 = float(bonded.centroid_restraint(conf, None, None, ga, gb, kb=50.0, b0=0.0))
    assert u2 == pytest.approx(50.0 * 1.0**2, rel=1e-6)
    # b0 == 0 branch has finite grad at coincident centroids
    conf_co = jnp.zeros((4, 3))
    g = jax.grad(lambda c: bonded.centroid_restraint(c, None, None, ga, gb, kb=50.0, b0=0.0))(conf_co)
    assert np.isfinite(np.asarray(g)).all()


def test_water_fast_path_matches_generic_bonded():
    """The strided leading-water fast paths must agree with the generic
    gather implementation on the same inputs."""
    rng = np.random.default_rng(5)
    nw = 4
    conf = jnp.asarray(rng.normal(0, 0.1, (3 * nw, 3)))
    box = jnp.eye(3) * 10.0

    # water bond layout: rows (3w, 3w+1), (3w, 3w+2) per water (builders.py)
    bond_idxs = np.array([[3 * w + a, 3 * w + b] for w in range(nw) for a, b in ((0, 1), (0, 2))], np.int32)
    bond_params = jnp.asarray(np.tile([462750.4, 0.09572], (2 * nw, 1)))
    u_fast = float(bonded.harmonic_bond(conf, bond_params, box, bond_idxs))
    u_slow = float(bonded.harmonic_bond(conf, bond_params, box, bond_idxs[::-1].copy()))
    assert u_fast == pytest.approx(u_slow, rel=1e-6)

    angle_idxs = np.array([[3 * w + 1, 3 * w, 3 * w + 2] for w in range(nw)], np.int32)
    angle_params = jnp.asarray(np.tile([836.8, 1.82421813, 0.0], (nw, 1)))
    u_fast = float(bonded.harmonic_angle(conf, angle_params, box, angle_idxs))
    u_slow = float(bonded.harmonic_angle(conf, angle_params, box, angle_idxs[::-1].copy()))
    assert u_fast == pytest.approx(u_slow, rel=1e-6)

    # analytic fused water (u, force) path vs autodiff
    u_a, f_a = bonded.water_bond_energy_force(np.asarray(conf), np.asarray(bond_params), nw)
    u_ref = bonded.harmonic_bond(conf, bond_params, box, bond_idxs)
    g_ref = jax.grad(lambda c: bonded.harmonic_bond(c, bond_params, box, bond_idxs))(conf)
    np.testing.assert_allclose(float(u_a), float(u_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_a), -np.asarray(g_ref), atol=1e-4)
