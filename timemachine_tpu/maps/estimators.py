"""Mapped works / mapped u_kn incorporating invertible configuration maps.

Parity target: reference `timemachine/maps/estimators.py` (mapped reduced
work :9-23, mapped u_kn :26-63; Jarzynski 2002 targeted FEP, Paliwal & Shirts
2013 configuration mapping).
"""

import numpy as np

from timemachine_tpu.fe.mbar import kln_to_kn

__all__ = ["compute_mapped_reduced_work", "compute_mapped_u_kn"]


def compute_mapped_reduced_work(src_samples, src_reduced_energy_fxn, dst_reduced_energy_fxn, map_fxn):
    """−log importance weights including the map's change of variables
    (ref estimators.py:9-23)."""
    mapped_samples, logdetjacs = map_fxn(src_samples)
    return dst_reduced_energy_fxn(mapped_samples) - src_reduced_energy_fxn(src_samples) - logdetjacs


def compute_mapped_u_kn(sample_lists, reduced_energy_fxns, map_fxns):
    """u_kn with user-supplied maps map_fxns[i, j] applied before evaluating
    state-i samples in state j (ref estimators.py:26-63).

    Assumes map_fxns[i, j]⁻¹ == map_fxns[j, i] and matching supports."""
    K = len(sample_lists)
    assert len(reduced_energy_fxns) == K

    N_k = [len(xs_k) for xs_k in sample_lists]
    u_kln = np.zeros((K, K, max(N_k)))
    for k in range(K):
        xs_k = sample_lists[k]
        for l in range(K):
            u_l = reduced_energy_fxns[l]
            xs_mapped, logdetjacs = map_fxns[k, l](xs_k)
            u_kln[k, l, : N_k[k]] = u_l(xs_mapped) - logdetjacs

    u_kn = kln_to_kn(u_kln, np.array(N_k))
    assert u_kn.shape == (K, sum(N_k))
    return u_kn
