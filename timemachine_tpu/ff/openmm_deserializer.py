"""OpenMM System -> BoundPotentials (protein/host parameterization).

Parity target: reference `timemachine/ff/handlers/openmm_deserializer.py` —
nonbonded extraction with exclusion scale-factor recovery (:13-127),
bond/angle/torsion extraction with proper/improper splitting (:130-266).

OpenMM is an OPTIONAL dependency (absent in this image, so this module is
exercised only where OpenMM is installed): the reference uses it solely to
parameterize protein hosts with Amber residue templates, which ship with
OpenMM. Water-only hosts never touch this path (md/builders.py is native).
"""

from __future__ import annotations

import numpy as np

from timemachine_tpu import constants, potentials
from timemachine_tpu.ff.handlers import canonicalize_bond


def value(quantity):
    from openmm import unit

    return quantity.value_in_unit_system(unit.md_unit_system)


def deserialize_nonbonded_force(force, N: int):
    """(nb_params (N,4), exclusion_idxs, beta, scale_factors)
    (ref openmm_deserializer.py:13-127). Parameters use this framework's
    layout: [q*sqrt(ONE_4PI_EPS0), sig/2, sqrt(eps), w]."""
    num_atoms = force.getNumParticles()

    charges = np.zeros(num_atoms)
    sigs = np.zeros(num_atoms)
    epss = np.zeros(num_atoms)
    for a_idx in range(num_atoms):
        charge, sig, eps = force.getParticleParameters(a_idx)
        charges[a_idx] = value(charge) * np.sqrt(constants.ONE_4PI_EPS0)
        sigs[a_idx] = value(sig)
        epss[a_idx] = value(eps)

    exclusion_idxs_ = []
    scale_factors_ = []
    for e_idx in range(force.getNumExceptions()):
        src, dst, new_q, new_sig, new_eps = force.getExceptionParameters(e_idx)
        desired_q = value(new_q) * constants.ONE_4PI_EPS0
        desired_sig = value(new_sig)
        desired_eps = value(new_eps)

        initial_sig = (sigs[src] + sigs[dst]) / 2
        initial_eps = np.sqrt(epss[src] * epss[dst])
        initial_q = charges[src] * charges[dst]

        exclusion_idxs_.append([src, dst])

        # scale factor measures how much of the interaction is REMOVED
        if initial_eps == 0:
            if desired_eps != 0:
                raise RuntimeError("No LJ scaling factor possible to arrive at desired_eps")
            lj_scale_factor = 1.0
        else:
            lj_scale_factor = 1.0 - desired_eps / initial_eps

        if initial_q == 0:
            if desired_q != 0:
                raise RuntimeError("No ES scaling factor possible to arrive at desired_q")
        # the reference uses the LJ factor for both columns (openmm_deserializer.py:95-101)
        scale_factors_.append((lj_scale_factor, lj_scale_factor))

        if desired_eps != 0:
            np.testing.assert_almost_equal(initial_sig, desired_sig)

    exclusion_idxs = np.array(exclusion_idxs_, dtype=np.int32).reshape(-1, 2)
    scale_factors = np.array(scale_factors_).reshape(-1, 2)

    nb_params = np.stack([charges, sigs / 2.0, np.sqrt(epss), np.zeros(num_atoms)], axis=1)
    beta = 2.0  # erfc reaction-field correction
    return nb_params, exclusion_idxs, beta, scale_factors


def deserialize_system(system, cutoff: float):
    """OpenMM System -> ([bond, angle, proper, improper, nonbonded] bound
    potentials, masses) (ref openmm_deserializer.py:130-266)."""
    import openmm as mm

    masses = [value(system.getParticleMass(p)) for p in range(system.getNumParticles())]
    N = len(masses)
    omm_forces = system.getForces()

    def forces_of(force_type):
        return [f for f in omm_forces if isinstance(f, force_type)]

    bond = angle = proper = improper = nonbonded = None
    angle_idxs = np.zeros((0, 3), dtype=np.int32)

    bond_forces = forces_of(mm.HarmonicBondForce)
    if bond_forces:
        bond_idxs_, bond_params_ = [], []
        for force in bond_forces:
            for b_idx in range(force.getNumBonds()):
                src_idx, dst_idx, length, k = force.getBondParameters(b_idx)
                bond_idxs_.append([src_idx, dst_idx])
                bond_params_.append((value(k), value(length)))
        bond = potentials.HarmonicBond(np.array(bond_idxs_, dtype=np.int32)).bind(np.array(bond_params_))

    angle_forces = forces_of(mm.HarmonicAngleForce)
    if angle_forces:
        angle_idxs_, angle_params_ = [], []
        for force in angle_forces:
            for a_idx in range(force.getNumAngles()):
                src_idx, mid_idx, dst_idx, theta0, k = force.getAngleParameters(a_idx)
                angle_idxs_.append([src_idx, mid_idx, dst_idx])
                angle_params_.append((value(k), value(theta0), 0.0))
        angle_idxs = np.array(angle_idxs_, dtype=np.int32)
        angle = potentials.HarmonicAngle(angle_idxs).bind(np.array(angle_params_))

    torsion_forces = forces_of(mm.PeriodicTorsionForce)
    if torsion_forces:
        torsion_idxs_, torsion_params_ = [], []
        for force in torsion_forces:
            for t_idx in range(force.getNumTorsions()):
                a_idx, b_idx, c_idx, d_idx, period, phase, k = force.getTorsionParameters(t_idx)
                torsion_idxs_.append([a_idx, b_idx, c_idx, d_idx])
                torsion_params_.append((value(k), value(phase), period))

        # split proper vs improper: a proper torsion has both of its internal
        # angles present in the angle set (ref openmm_deserializer.py:219-245)
        canonical_angles = {tuple(canonicalize_bond(tuple(map(int, idxs)))) for idxs in angle_idxs}
        proper_idxs, proper_params, improper_idxs, improper_params = [], [], [], []
        for idxs, params in zip(torsion_idxs_, torsion_params_):
            i, j, k, l = idxs
            has_ijk = tuple(canonicalize_bond((i, j, k))) in canonical_angles
            has_jkl = tuple(canonicalize_bond((j, k, l))) in canonical_angles
            if has_ijk and has_jkl:
                proper_idxs.append(idxs)
                proper_params.append(params)
            elif not has_ijk and not has_jkl:
                raise AssertionError("torsion with no adjacent angles")
            else:
                improper_idxs.append(idxs)
                improper_params.append(params)
        proper = potentials.PeriodicTorsion(np.array(proper_idxs, dtype=np.int32).reshape(-1, 4)).bind(
            np.array(proper_params).reshape(-1, 3)
        )
        improper = potentials.PeriodicTorsion(np.array(improper_idxs, dtype=np.int32).reshape(-1, 4)).bind(
            np.array(improper_params).reshape(-1, 3)
        )

    nb_forces = forces_of(mm.NonbondedForce)
    if nb_forces:
        assert len(nb_forces) == 1, "Only supports a single nonbonded force"
        nb_params, exclusion_idxs, beta, scale_factors = deserialize_nonbonded_force(nb_forces[0], N)
        nonbonded = potentials.Nonbonded(N, exclusion_idxs, scale_factors, beta, cutoff).bind(nb_params)

    assert bond is not None and angle is not None and nonbonded is not None
    if proper is None:
        proper = potentials.PeriodicTorsion(np.zeros((0, 4), dtype=np.int32)).bind(np.zeros((0, 3)))
    if improper is None:
        improper = potentials.PeriodicTorsion(np.zeros((0, 4), dtype=np.int32)).bind(np.zeros((0, 3)))

    return [bond, angle, proper, improper, nonbonded], masses
