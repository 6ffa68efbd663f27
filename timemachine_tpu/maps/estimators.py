"""Map-augmented free-energy estimator inputs (targeted FEP).

Capability target: reference `timemachine/maps/estimators.py` (Jarzynski 2002
targeted FEP; Paliwal & Shirts 2013 configuration mapping). Given invertible
configuration maps M[i→j] with tractable log|det J|, reduced works and u_kn
matrices pick up a Jacobian correction: u'_j(M(x)) = u_j(M(x)) − log|det J(x)|.

Structured differently from the reference: the u_kn assembly is built per
source state as a stacked (K, N_k) block — evaluating one state's samples
under every target map/state at a time — then blocks are concatenated along
the sample axis, matching the fe.mbar u_kn layout directly (no padded
(K, K, N_max) intermediate).
"""

from __future__ import annotations

import numpy as np

__all__ = ["mapped_work", "mapped_u_kn", "compute_mapped_reduced_work", "compute_mapped_u_kn"]


def mapped_work(samples, u_src, u_dst, map_fn) -> np.ndarray:
    """Reduced work of transporting `samples` from state src to state dst
    through the invertible map: u_dst(M(x)) − u_src(x) − log|det J_M(x)|."""
    y, logdetjac = map_fn(samples)
    return np.asarray(u_dst(y)) - np.asarray(u_src(samples)) - np.asarray(logdetjac)


def mapped_u_kn(sample_lists, reduced_energy_fns, map_fns) -> np.ndarray:
    """(K, N_tot) reduced-energy matrix for MBAR, with samples of state k
    transported into each state l by map_fns[k, l] before evaluation.

    Caller guarantees map_fns[k, l] inverts map_fns[l, k] and respects the
    states' supports. Column blocks are ordered by source state, i.e.
    columns [sum(N[:k]), sum(N[:k+1])) hold state-k samples — the same
    convention as fe.mbar.kln_to_kn.
    """
    n_states = len(sample_lists)
    if len(reduced_energy_fns) != n_states:
        raise ValueError("one reduced-energy fn per state required")

    blocks = []
    for k, xs in enumerate(sample_lists):
        rows = []
        for l, u_l in enumerate(reduced_energy_fns):
            ys, logdetjac = map_fns[k, l](xs)
            rows.append(np.asarray(u_l(ys)) - np.asarray(logdetjac))
        blocks.append(np.stack(rows))  # (K, N_k)

    u_kn = np.concatenate(blocks, axis=1)
    assert u_kn.shape == (n_states, sum(len(xs) for xs in sample_lists))
    return u_kn


# reference-parity aliases (timemachine/maps/estimators.py:9,26)
compute_mapped_reduced_work = mapped_work
compute_mapped_u_kn = mapped_u_kn
