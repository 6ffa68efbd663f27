"""Native AM1 semi-empirical QM validation.

All expected values are published AM1 results (Dewar et al., JACS 107:3902,
1985; MOPAC manual tables) — external pins, not self-generated goldens:
geometries, heats of formation, dipole moments, ionization potentials and
Mulliken charges of small molecules. The reference framework outsources
these numbers to OpenEye (`timemachine/ff/handlers/nonbonded.py:343-520`);
agreement here validates the native backend that replaces it.
"""

import numpy as np
import pytest
from scipy.optimize import minimize

from timemachine_tpu.qm import am1
from timemachine_tpu.qm.integrals import element_multipoles, sto_overlap
from timemachine_tpu.qm.params import AM1_ELEMENTS, BOHR_PER_ANGSTROM
from timemachine_tpu.qm.scf import atomic_eisol, heat_of_formation_kcal



def _opt(elements, x0, **kw):
    x0 = np.asarray(x0, dtype=np.float64)
    f = lambda flat: am1(elements, flat.reshape(-1, 3)).energy_total
    m = minimize(f, x0.ravel(), method="Nelder-Mead",
                 options=dict(xatol=1e-4, fatol=1e-7, maxiter=6000, maxfev=8000, **kw))
    return m.x.reshape(-1, 3)


def test_sto_overlap_closed_form():
    # 1s-1s equal exponents: S = e^-p (1 + p + p^2/3)
    for zeta, r in [(1.188078, 1.3), (1.0, 2.0), (2.5, 0.7)]:
        p = zeta * r
        expected = np.exp(-p) * (1 + p + p * p / 3.0)
        got = sto_overlap(1, 0, zeta, 1, 0, zeta, r, 0)
        assert abs(got - expected) < 1e-12


def test_sto_overlap_symmetry():
    # <a|b>(R) == <b|a>(R) for sigma overlaps up to p-orbital direction:
    # swapping centers flips both the axis and the p lobes, so
    # s-p overlaps pick up a sign, p-p and s-s do not
    assert np.isclose(
        sto_overlap(2, 0, 1.8, 1, 0, 1.2, 2.1, 0),
        sto_overlap(1, 0, 1.2, 2, 0, 1.8, 2.1, 0),
        atol=1e-10,
    )
    assert np.isclose(
        sto_overlap(2, 1, 1.7, 2, 1, 2.5, 2.8, 0),
        sto_overlap(2, 1, 2.5, 2, 1, 1.7, 2.8, 0),
        atol=1e-10,
    )


def test_multipole_one_center_limits():
    """rho solving: R->0 self-interactions reproduce gss / hsp / hpp'."""
    from timemachine_tpu.qm.integrals import _interact

    for z in (6, 7, 8, 16, 17):
        el = AM1_ELEMENTS[z]
        cfg, (r0, r1, r2) = element_multipoles(z)
        mono = [(1.0, np.zeros(3), 0)]
        assert np.isclose(_interact(mono, mono, np.zeros(3), r0, r0), el.gss, atol=1e-8)
        sp = cfg[(0, 3)]
        assert np.isclose(_interact(sp, sp, np.zeros(3), r1, r1), el.hsp, atol=1e-8)
        sq = cfg[(1, 2)]
        assert np.isclose(
            _interact(sq, sq, np.zeros(3), r2, r2), 0.5 * (el.gpp - el.gp2), atol=1e-8
        )


def test_eisol_matches_mopac_tables():
    # MOPAC-distributed AM1 EISOL values (eV)
    expected = {1: -11.396427, 6: -120.815794, 7: -202.408789 , 8: -316.099520, 9: -482.290583}
    for z, e in expected.items():
        assert abs(atomic_eisol(z) - e) < 2e-3, (z, atomic_eisol(z))


def test_h2():
    from scipy.optimize import minimize_scalar

    m = minimize_scalar(lambda r: am1([1, 1], [[0, 0, 0], [0, 0, r]]).energy_total,
                        bracket=(0.6, 0.7, 0.9))
    assert abs(m.x - 0.677) < 0.005  # published AM1 bond length
    hof = heat_of_formation_kcal(am1([1, 1], [[0, 0, 0], [0, 0, m.x]]), [1, 1])
    assert abs(hof - (-5.2)) < 0.3  # published AM1 HOF


def test_water_geometry_charges_dipole_ip():
    x = _opt([8, 1, 1], [[0, 0, 0], [0.96, 0, 0], [-0.23, 0.93, 0]])
    r_oh = np.linalg.norm(x[1] - x[0])
    v1, v2 = x[1] - x[0], x[2] - x[0]
    ang = np.degrees(np.arccos(v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))))
    assert abs(r_oh - 0.961) < 0.005
    assert abs(ang - 103.5) < 1.0
    res = am1([8, 1, 1], x)
    assert abs(res.charges[0] - (-0.383)) < 0.01  # published AM1 Mulliken q(O)
    assert abs(res.charges.sum()) < 1e-9
    assert abs(np.linalg.norm(res.dipole) - 1.86) < 0.05  # published AM1 dipole, D
    assert abs(-res.homo - 12.46) < 0.1  # published AM1 IP (Koopmans), eV
    hof = heat_of_formation_kcal(res, [8, 1, 1])
    assert abs(hof - (-59.24)) < 0.5


def test_methane_hof_and_geometry():
    x0 = [[0, 0, 0], [0, 0, 1.11], [1.05, 0, -0.37], [-0.52, 0.91, -0.37], [-0.52, -0.91, -0.37]]
    x = _opt([6, 1, 1, 1, 1], x0)
    r_ch = np.linalg.norm(x[1] - x[0])
    assert abs(r_ch - 1.112) < 0.005
    hof = heat_of_formation_kcal(am1([6, 1, 1, 1, 1], x), [6, 1, 1, 1, 1])
    assert abs(hof - (-8.79)) < 0.5


def test_ammonia_hof():
    x = _opt([7, 1, 1, 1], [[0, 0, 0.1], [0.94, 0, -0.3], [-0.47, 0.81, -0.3], [-0.47, -0.81, -0.3]])
    hof = heat_of_formation_kcal(am1([7, 1, 1, 1], x), [7, 1, 1, 1])
    assert abs(hof - (-7.28)) < 0.5


def test_rotational_translational_invariance():
    rng = np.random.default_rng(5)
    x0 = np.array([[0, 0, 0], [0, 0, 1.22], [0.94, 0, -0.54], [-0.94, 0, -0.54]])
    res0 = am1([6, 8, 1, 1], x0)
    # random rotation + translation
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, xq, yq, zq = q
    rot = np.array([
        [1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq), 2 * (xq * zq + w * yq)],
        [2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - w * xq)],
        [2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq), 1 - 2 * (xq * xq + yq * yq)],
    ])
    x1 = x0 @ rot.T + np.array([3.1, -2.2, 0.7])
    res1 = am1([6, 8, 1, 1], x1)
    assert abs(res0.energy_total - res1.energy_total) < 1e-6
    np.testing.assert_allclose(res0.charges, res1.charges, atol=1e-7)
    assert abs(np.linalg.norm(res0.dipole) - np.linalg.norm(res1.dipole)) < 1e-6


def test_charged_species():
    # hydronium H3O+: closed shell, net +1; charges must sum to +1
    from timemachine_tpu.qm.scf import AM1System

    x = [[0, 0, 0.1], [0.98, 0, -0.2], [-0.49, 0.85, -0.2], [-0.49, -0.85, -0.2]]
    res = AM1System([8, 1, 1, 1], x, charge=1).solve()
    assert abs(res.charges.sum() - 1.0) < 1e-9
    assert res.charges[0] < 0  # O still negative; H's carry the + charge


def test_radical_rejected():
    from timemachine_tpu.qm.scf import AM1System
    with pytest.raises(ValueError, match="closed-shell"):
        AM1System([8, 1], [[0, 0, 0], [0, 0, 0.97]], charge=0)


def test_unsupported_element_rejected():
    from timemachine_tpu.qm.scf import AM1System
    with pytest.raises(ValueError, match="unavailable"):
        AM1System([3, 1], [[0, 0, 0], [0, 0, 1.6]], charge=0)
