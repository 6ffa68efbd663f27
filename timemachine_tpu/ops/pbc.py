"""Periodic-boundary geometry, including the 4D "lifted" distances used by
alchemical softcore decoupling.

Parity target: reference `timemachine/potentials/jax_utils.py` (delta_r,
distance_on_pairs, pairwise_distances, ...). Boxes are assumed rectangular
(only the diagonal is used), matching the reference's convention
(jax_utils.py:37-44).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import vmap


def periodic_delta(ri, rj, box=None):
    """Minimum-image displacement ri - rj under a rectangular periodic box.

    box=None means vacuum (no imaging). Only diag(box) is used.
    Ref semantics: jax_utils.py:37-44.
    """
    diff = ri - rj
    if box is not None:
        box_diag = jnp.diagonal(box, axis1=-2, axis2=-1)
        diff = diff - box_diag * jnp.floor(diff / box_diag + 0.5)
    return diff


def distance_sq(ri, rj, box=None):
    d = periodic_delta(ri, rj, box)
    return jnp.sum(d * d, axis=-1)


def distance(ri, rj, box=None):
    return jnp.sqrt(distance_sq(ri, rj, box))


def lifted_distance_on_pairs(ri, rj, box=None, w_offsets=None):
    """Per-pair distance, optionally lifted into 4D with aperiodic w offsets.

    The 4th dimension is the alchemical decoupling coordinate: the effective
    pair distance is sqrt(|Δr_3d|² + Δw²) (ref jax_utils.py:77-99,
    Rodinger/Howell/Pomès 2005 4D-TI).
    """
    d2 = distance_sq(ri, rj, box)
    if w_offsets is not None:
        d2 = d2 + jnp.asarray(w_offsets) ** 2
    # grad-safe sqrt: coincident points give d = 0 with zero (not NaN) gradient
    safe = jnp.where(d2 > 0.0, d2, 1.0)
    return jnp.where(d2 > 0.0, jnp.sqrt(safe), 0.0)


def pairwise_distance_matrix(x, box=None, w=None):
    """(N, N) matrix of (optionally 4D-lifted) periodic distances.

    Diagonal is forced to exactly zero before the sqrt so gradients stay
    finite (the same stabilization the reference applies,
    jax_utils.py:144-181).
    """
    n = x.shape[0]
    d = periodic_delta(x[:, None, :], x[None, :, :], box)
    d2 = jnp.sum(d * d, axis=-1)
    if w is not None:
        dw = w[:, None] - w[None, :]
        d2 = d2 + dw * dw
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye, 0.0, d2)
    # off-diagonal zeros would still produce nan grads; guard them too
    safe = jnp.where(d2 > 0.0, d2, 1.0)
    return jnp.where(d2 > 0.0, jnp.sqrt(safe), 0.0)


def distances_from_point(x_i, x_others, box=None, cutoff=jnp.inf):
    """Distances from one point to a set; entries beyond cutoff become +inf
    (ref jax_utils.py:184-204)."""
    d2 = distance_sq(x_i, x_others, box)
    return jnp.where(d2 <= cutoff**2, jnp.sqrt(d2), jnp.inf)


def idxs_within_cutoff(x, x_lig, box, cutoff=0.5):
    """Indices of rows of x within cutoff of any point in x_lig
    (ref jax_utils.py:55-74). Host-side (dynamic output shape)."""

    def near(point):
        return jnp.any(distances_from_point(point, x_lig, box) < cutoff)

    return jnp.where(vmap(near)(x))[0]


def all_pairs_idxs(n: int) -> np.ndarray:
    """All (i, j) with i < j — static, host-side."""
    return np.stack(np.triu_indices(n, k=1)).T.astype(np.int32)


def interaction_group_idxs(group_a, group_b) -> np.ndarray:
    """Cartesian product pairs (a, b) — static, host-side."""
    a = np.asarray(group_a)
    b = np.asarray(group_b)
    pairs = np.stack(np.meshgrid(a, b, indexing="ij")).reshape(2, -1).T
    return pairs.astype(np.int32)


def image_molecules(x, box, mol_groups):
    """Wrap each molecule's centroid into the home box (used when writing
    frames). mol_groups: list of index arrays. Host-side convenience."""
    x = np.asarray(x)
    box_diag = np.diagonal(box)
    out = x.copy()
    for idxs in mol_groups:
        centroid = x[idxs].mean(axis=0)
        shift = box_diag * np.floor(centroid / box_diag)
        out[idxs] = x[idxs] - shift
    return out
