"""Standard-state corrections for restraint release.

Parity target: reference `timemachine/fe/standard_state.py` — radial
partition functions (:9-82), SO(3) rotational partition function (:85-130),
release_orientational_restraints (:133-172).
"""

import functools

import numpy as np
import scipy.integrate
import scipy.special

from timemachine_tpu.ops import rmsd


def integrate_radial_Z(u_fn, beta, r_max):
    """Z = ∫ 4π r² exp(−β u(r)) dr over [0, r_max] (ref standard_state.py:9-41)."""

    def integrand(r):
        return 4 * np.pi * (r**2) * np.exp(-beta * u_fn(r))

    Z, err = scipy.integrate.quad(integrand, 0.0, r_max)
    assert err < 1e-5
    return Z


def standard_state_correction(Z_infty, beta):
    """dG of release into the standard molar volume 1.660 nm³
    (ref standard_state.py:44-62)."""
    return -np.log(1.660 / Z_infty) / beta  # kJ/mol


def integrate_radial_Z_exact(k, beta):
    """Analytic Z for u = k r² (b0 = 0) (ref standard_state.py:65-80)."""
    k = k * beta
    b = 0.0
    return (
        4.0
        * np.pi
        * (
            (b * np.exp(-(b**2) * k)) / (2 * k)
            + ((1 + 2 * b**2 * k) * np.sqrt(np.pi) * (1 + scipy.special.erf(b * np.sqrt(k)))) / (4 * k ** (3 / 2))
        )
    )


def integrate_rotation_Z(u_fn, beta):
    """Partition function of a rotational restraint over SO(3), in quaternion
    half-angle form (ref standard_state.py:85-130)."""

    def integrand(alpha, theta):
        nrg = u_fn(2 * theta)
        assert nrg > 0
        return np.exp(-beta * nrg) * np.sin(theta) ** 2 * np.sin(alpha)

    Z, Z_err = scipy.integrate.dblquad(integrand, 0, np.pi / 2, lambda x: 0, lambda x: np.pi)
    assert Z_err < 1e-5
    return Z * 2 * np.pi


def angle_u(theta, k):
    """Rotation-angle restraint energy k (1 − cos θ) (ref potentials/rmsd.py:9-11)."""
    return k * (1.0 - np.cos(theta))


def release_orientational_restraints(k_t, k_r, beta):
    """(dG_translation, dG_rotation) for releasing a harmonic translational
    restraint and an RMSD rotational restraint into the standard state
    (ref standard_state.py:133-172)."""

    def harmonic_restraint(r):
        return k_t * r**2

    Z_numeric = integrate_radial_Z(harmonic_restraint, beta, r_max=np.inf)
    Z_exact = integrate_radial_Z_exact(k_t, beta)
    np.testing.assert_almost_equal(Z_exact, Z_numeric)
    dG_translation = standard_state_correction(Z_numeric, beta)

    u_fn = functools.partial(angle_u, k=k_r)
    Z_rotation = integrate_rotation_Z(u_fn, beta)
    dG_rotation = (-1 / beta) * np.log(1 / Z_rotation)
    return dG_translation, dG_rotation


__all__ = [
    "integrate_radial_Z",
    "integrate_radial_Z_exact",
    "integrate_rotation_Z",
    "release_orientational_restraints",
    "standard_state_correction",
    "rmsd",
]
