"""Rigid alignment (Kabsch) and RMSD-based restraints.

Parity target: reference `timemachine/potentials/rmsd.py` — optimal
rotation/translation (:19-68), align_x2_unto_x1 (:70-99), rmsd_align
(:101-137), rmsd_restraint (:139-end).

Pure JAX: differentiable through the SVD, jit/vmap friendly (used batched in
md/enhanced.py's aligned ligand proposals).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_optimal_rotation(x1, x2):
    """Rotation R minimizing ||x1 - x2 @ R|| for centered x1, x2 (Kabsch with
    reflection correction; ref rmsd.py:19-31)."""
    correlation = jnp.dot(x2.T, x1)
    u, s, vh = jnp.linalg.svd(correlation, full_matrices=False)
    d = jnp.sign(jnp.linalg.det(jnp.dot(u, vh)))
    flip = jnp.diag(jnp.array([1.0, 1.0, d], dtype=x1.dtype))
    return u @ flip @ vh


def get_optimal_translation(x1, x2):
    """Translation moving x2's centroid onto x1's (ref rmsd.py:33-38)."""
    return jnp.mean(x1, axis=0) - jnp.mean(x2, axis=0)


def get_optimal_rotation_and_translation(x1, x2):
    """(R, t) minimizing RMSD(x1, x2 @ R + t) (ref rmsd.py:40-59)."""
    t = get_optimal_translation(x1, x2)
    x1_c = x1 - jnp.mean(x1, axis=0)
    x2_c = x2 - jnp.mean(x2, axis=0)
    return get_optimal_rotation(x1_c, x2_c), t


def apply_rotation_and_translation(x, R, t):
    """Rotate about x's centroid then translate (ref rmsd.py:61-68)."""
    centroid = jnp.mean(x, axis=0)
    return (x - centroid) @ R + centroid + t


def align_x2_unto_x1(x1, x2):
    """Rigidly transform x2 to be maximally aligned with x1
    (ref rmsd.py:70-99)."""
    R, t = get_optimal_rotation_and_translation(x1, x2)
    return apply_rotation_and_translation(x2, R, t)


def rmsd_align(x1, x2):
    """Symmetric alignment to the mutual centroid frame: returns (x1', x2')
    with both conformers centered and x2 rotated onto x1
    (ref rmsd.py:101-137)."""
    x1_c = x1 - jnp.mean(x1, axis=0)
    x2_c = x2 - jnp.mean(x2, axis=0)
    R = get_optimal_rotation(x1_c, x2_c)
    return x1_c, x2_c @ R


def psi(rotation, k):
    """Restraint energy of a rotation matrix: k·(1 − cos θ) where θ is the
    residual rotation angle (ref rmsd.py:4-16)."""
    cos_theta = (jnp.trace(rotation) - 1.0) / 2.0
    return k * (1.0 - cos_theta)


def rmsd_restraint(conf, params, box, group_a_idxs, group_b_idxs, k):
    """Restrain the residual rigid rotation between two atom groups
    (ref rmsd.py:139-end). Translation-invariant: only the optimal-rotation
    angle is penalized."""
    del params, box
    x_a = conf[group_a_idxs]
    x_b = conf[group_b_idxs]
    x_a_c = x_a - jnp.mean(x_a, axis=0)
    x_b_c = x_b - jnp.mean(x_b, axis=0)
    R = get_optimal_rotation(x_a_c, x_b_c)
    return psi(R, k)
