"""OpenMM System -> BoundPotentials (protein/host parameterization).

Capability target: reference `timemachine/ff/handlers/openmm_deserializer.py`
(nonbonded extraction with exclusion scale-factor recovery, bonded
extraction with proper/improper splitting).

OpenMM is an OPTIONAL dependency (absent in this image, so this module runs
only where OpenMM is installed): the reference uses it solely to
parameterize protein hosts with the Amber residue templates that ship with
it. Water-only hosts never touch this path (md/builders.py is native).

Organized as per-force extractors feeding a single term table, with the
proper/improper split done as a post-pass over the assembled angle set.
"""

from __future__ import annotations

import numpy as np

from timemachine_tpu import constants, potentials
from timemachine_tpu.ff.handlers import canonicalize_bond


def in_md_units(quantity):
    from openmm import unit

    return quantity.value_in_unit_system(unit.md_unit_system)


def _extract_bonds(force):
    rows = [force.getBondParameters(i) for i in range(force.getNumBonds())]
    idxs = np.array([[r[0], r[1]] for r in rows], dtype=np.int32)
    params = np.array([(in_md_units(r[3]), in_md_units(r[2])) for r in rows])  # (k, length)
    return idxs, params


def _extract_angles(force):
    rows = [force.getAngleParameters(i) for i in range(force.getNumAngles())]
    idxs = np.array([[r[0], r[1], r[2]] for r in rows], dtype=np.int32)
    params = np.array([(in_md_units(r[4]), in_md_units(r[3]), 0.0) for r in rows])  # (k, theta0, eps)
    return idxs, params


def _extract_torsions(force):
    rows = [force.getTorsionParameters(i) for i in range(force.getNumTorsions())]
    idxs = np.array([r[:4] for r in rows], dtype=np.int32)
    params = np.array([(in_md_units(r[6]), in_md_units(r[5]), r[4]) for r in rows])  # (k, phase, period)
    return idxs, params


def _split_torsions(torsion_idxs, torsion_params, angle_idxs):
    """Proper torsions have BOTH internal angles present in the angle set;
    torsions with exactly one are impropers (the Amber convention the
    reference recovers, openmm_deserializer.py:219-245)."""
    known_angles = {tuple(canonicalize_bond(tuple(map(int, row)))) for row in angle_idxs}

    def n_internal_angles(i, j, k, l):
        return sum(
            tuple(canonicalize_bond(t)) in known_angles for t in ((i, j, k), (j, k, l))
        )

    counts = np.array([n_internal_angles(*map(int, row)) for row in torsion_idxs])
    if np.any(counts == 0):
        raise AssertionError("torsion with no adjacent angles")
    is_proper = counts == 2
    return (
        (torsion_idxs[is_proper], torsion_params[is_proper]),
        (torsion_idxs[~is_proper], torsion_params[~is_proper]),
    )


def deserialize_nonbonded_force(force, N: int):
    """(nb_params (N, 4), exclusion_idxs, beta, scale_factors), parameters in
    this framework's layout [q*sqrt(ONE_4PI_EPS0), sig/2, sqrt(eps), w]."""
    rows = [force.getParticleParameters(i) for i in range(force.getNumParticles())]
    charges = np.array([in_md_units(r[0]) for r in rows]) * np.sqrt(constants.ONE_4PI_EPS0)
    sigs = np.array([in_md_units(r[1]) for r in rows])
    epss = np.array([in_md_units(r[2]) for r in rows])

    exclusion_idxs = []
    scale_factors = []
    for e_idx in range(force.getNumExceptions()):
        src, dst, q_target, sig_target, eps_target = force.getExceptionParameters(e_idx)
        q_target = in_md_units(q_target) * constants.ONE_4PI_EPS0
        sig_target = in_md_units(sig_target)
        eps_target = in_md_units(eps_target)

        combined_eps = np.sqrt(epss[src] * epss[dst])
        combined_q = charges[src] * charges[dst]

        # the exception expresses how much of the combined interaction is
        # REMOVED; recover that scale (the reference applies the LJ factor to
        # both columns, openmm_deserializer.py:95-101)
        if combined_eps == 0.0:
            if eps_target != 0.0:
                raise RuntimeError("No LJ scaling factor possible to arrive at desired_eps")
            lj_scale = 1.0
        else:
            lj_scale = 1.0 - eps_target / combined_eps
        if combined_q == 0.0 and q_target != 0.0:
            raise RuntimeError("No ES scaling factor possible to arrive at desired_q")
        if eps_target != 0.0:
            np.testing.assert_almost_equal((sigs[src] + sigs[dst]) / 2, sig_target)

        exclusion_idxs.append((src, dst))
        scale_factors.append((lj_scale, lj_scale))

    nb_params = np.stack([charges, sigs / 2.0, np.sqrt(epss), np.zeros(len(rows))], axis=1)
    beta = 2.0  # erfc reaction-field correction
    return (
        nb_params,
        np.array(exclusion_idxs, dtype=np.int32).reshape(-1, 2),
        beta,
        np.array(scale_factors).reshape(-1, 2),
    )


def deserialize_system(system, cutoff: float):
    """OpenMM System -> ([bond, angle, proper, improper, nonbonded] bound
    potentials, masses)."""
    import openmm as mm

    masses = [in_md_units(system.getParticleMass(p)) for p in range(system.getNumParticles())]
    N = len(masses)

    by_type: dict = {}
    for force in system.getForces():
        by_type.setdefault(type(force).__name__, []).append(force)

    def gather(type_name, extract, widths):
        idx_parts, param_parts = [], []
        for force in by_type.get(type_name, []):
            idxs, params = extract(force)
            idx_parts.append(idxs.reshape(-1, widths[0]))
            param_parts.append(params.reshape(-1, widths[1]))
        if not idx_parts:
            return np.zeros((0, widths[0]), np.int32), np.zeros((0, widths[1]))
        return np.concatenate(idx_parts), np.concatenate(param_parts)

    bond_idxs, bond_params = gather("HarmonicBondForce", _extract_bonds, (2, 2))
    angle_idxs, angle_params = gather("HarmonicAngleForce", _extract_angles, (3, 3))
    torsion_idxs, torsion_params = gather("PeriodicTorsionForce", _extract_torsions, (4, 3))
    (proper_idxs, proper_params), (improper_idxs, improper_params) = _split_torsions(
        torsion_idxs, torsion_params, angle_idxs
    )

    nb_forces = by_type.get("NonbondedForce", [])
    assert len(nb_forces) == 1, "Only supports a single nonbonded force"
    nb_params, exclusion_idxs, beta, scale_factors = deserialize_nonbonded_force(nb_forces[0], N)

    assert len(bond_idxs) and len(angle_idxs)
    bps = [
        potentials.HarmonicBond(bond_idxs).bind(bond_params),
        potentials.HarmonicAngle(angle_idxs).bind(angle_params),
        potentials.PeriodicTorsion(proper_idxs).bind(proper_params),
        potentials.PeriodicTorsion(improper_idxs).bind(improper_params),
        potentials.Nonbonded(N, exclusion_idxs, scale_factors, beta, cutoff).bind(nb_params),
    ]
    return bps, masses
