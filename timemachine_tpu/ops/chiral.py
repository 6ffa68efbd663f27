"""Chirality-preserving flat-bottom restraints.

Parity target: reference `timemachine/potentials/chiral_restraints.py`.
These keep stereocenters from inverting while bonded terms are interpolated
across alchemical states. Padding convention: idx rows containing -1 are
inert.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unit(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def pyramidal_volume(xc, x1, x2, x3):
    """Normalized signed volume of the pyramid with apex xc: the triple
    product of the three unit vectors out of the center. Range (-1, 1)
    (ref chiral_restraints.py:9-35)."""
    v0 = _unit(x1 - xc)
    v1 = _unit(x2 - xc)
    v2 = _unit(x3 - xc)
    return jnp.sum(jnp.cross(v0, v1) * v2, axis=-1)


def torsion_volume(ci, cj, ck, cl):
    """Normalized torsional volume: dot of the two unit-plane normals
    (ref chiral_restraints.py:38-61)."""
    rij = _unit(cj - ci)
    rkj = _unit(cj - ck)
    rkl = _unit(cl - ck)
    n1 = jnp.cross(rij, rkj)
    n2 = jnp.cross(rkj, rkl)
    return jnp.sum(n1 * n2, axis=-1)


def chiral_atom_restraint(conf, params, box, idxs):
    """One-sided flat-bottom on pyramidal volume: U = k v² when v > 0 else 0.

    idxs: (C, 4) [center, a, b, c]; params: (C,) force constants.
    (ref chiral_restraints.py:64-74,103-112). box unused.
    """
    if idxs.shape[0] == 0:
        return jnp.asarray(0.0, dtype=conf.dtype)
    mask = jnp.all(idxs >= 0, axis=-1)
    safe = jnp.where(idxs >= 0, idxs, 0)
    x = conf[safe]
    v = pyramidal_volume(x[:, 0], x[:, 1], x[:, 2], x[:, 3])
    e = jnp.where(v > 0, params * v**2, 0.0)
    return jnp.sum(jnp.where(mask, e, 0.0))


def chiral_bond_restraint(conf, params, box, idxs, signs):
    """One-sided flat-bottom on torsion volume with per-term sign:
    U = k v² when v·s > 0 else 0 (ref chiral_restraints.py:77-125). box unused.
    """
    if idxs.shape[0] == 0:
        return jnp.asarray(0.0, dtype=conf.dtype)
    mask = jnp.all(idxs >= 0, axis=-1)
    safe = jnp.where(idxs >= 0, idxs, 0)
    x = conf[safe]
    v = torsion_volume(x[:, 0], x[:, 1], x[:, 2], x[:, 3])
    e = jnp.where(v * signs > 0, params * v**2, 0.0)
    return jnp.sum(jnp.where(mask, e, 0.0))
