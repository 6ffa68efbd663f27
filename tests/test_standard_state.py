"""Standard-state restraint-release corrections (fe/standard_state.py)."""

import numpy as np
import pytest

from timemachine_tpu.fe.standard_state import (
    angle_u,
    integrate_radial_Z,
    integrate_radial_Z_exact,
    integrate_rotation_Z,
    release_orientational_restraints,
    standard_state_correction,
)


def test_radial_Z_closed_form_matches_quadrature():
    beta = 1.0 / 2.479
    for k in [100.0, 1000.0, 10000.0]:
        Z_exact = integrate_radial_Z_exact(k, beta)
        Z_num = integrate_radial_Z(lambda r: k * r * r, beta, r_max=np.inf)
        assert Z_num == pytest.approx(Z_exact, rel=1e-8)


def test_rotation_Z_limits():
    beta = 1.0 / 2.479
    # vanishing restraint: Z -> volume of SO(3) in this parameterization
    # (4*pi * int sin^2 = 4*pi * pi/4 = pi^2)
    Z_free = integrate_rotation_Z(lambda th: angle_u(th, 1e-9), beta)
    assert Z_free == pytest.approx(np.pi**2, rel=1e-4)
    # stiff restraint confines the angle: Z strictly smaller
    Z_stiff = integrate_rotation_Z(lambda th: angle_u(th, 1e4), beta)
    assert 0 < Z_stiff < 1e-3 * Z_free


def test_release_orientational_restraints_signs_and_monotonicity():
    beta = 1.0 / 2.479
    dG_t1, dG_r1 = release_orientational_restraints(5000.0, 50.0, beta)
    dG_t2, dG_r2 = release_orientational_restraints(50000.0, 500.0, beta)
    # releasing a stiffer restraint into the same volume costs more
    assert dG_t2 < dG_t1 < 0  # tighter confinement => more negative Z-ratio log
    assert dG_r2 < dG_r1
    # translational release against the standard volume: analytic expectation
    Z = integrate_radial_Z_exact(5000.0, beta)
    assert dG_t1 == pytest.approx(standard_state_correction(Z, beta))
