"""Nonbonded energy: Lennard-Jones + reaction-field (erfc-switched) Coulomb,
with 4D alchemical lifting.

Parity target: reference `timemachine/potentials/nonbonded.py` (JAX math) and
the CUDA kernel family `timemachine/cpp/src/kernels/k_nonbonded.cuh`. Model:

* electrostatics = q_i q_j erfc(β d) / d, multiplied by a C² switching
  function that zeroes {f, f', f''} at the cutoff (β=2.0 is the real-space
  part of PME; ref nonbonded.py:23-77, README.md:100)
* LJ with Lorentz-Berthelot combining, pre-transformed parameters:
  sigma stored as σ/2 (so σ_ij = s_i + s_j) and epsilon stored as √ε
  (so ε_ij = e_i e_j) — ref nonbonded.py:42-55
* pair distance is 4D: d = sqrt(|Δr_3d|² + (w_i - w_j)²); the per-atom w
  coordinate implements softcore decoupling (ref nonbonded.py:221-272)

Per-atom parameter rows: [q·√(138.935456), σ/2, √ε, w] (constants.NBParamIdx).

All forms here are pure JAX with static shapes. The O(N) production path
(neighborlisted tiles, Pallas) lives in ops/neighborlist.py + ops/pallas/.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc

from timemachine_tpu.ops.pbc import lifted_distance_on_pairs, periodic_delta


def _polyval_t(t, coeffs):
    """Monomial series on t in [-1, 1] (Horner; static float coeffs,
    low->high — the basis es_energy_force_series emits). On the symmetric
    domain max|coef| < 1, so f32 Horner error matches Clenshaw's (~1.6e-7
    measured) at half the op count."""
    acc = jnp.full_like(t, coeffs[-1])
    for ck in coeffs[-2::-1]:
        acc = acc * t + ck
    return acc

# The switch function's cutoff is pinned at 1.2 nm in the reference regardless
# of the interaction cutoff (nonbonded.py:23-39); we keep that contract.
SWITCH_CUTOFF = 1.2


def switch_fn(dij, cutoff=SWITCH_CUTOFF):
    """cos^3((π/2)(d/c)^8) for d < c else 0: keeps erfc(βd)·switch close to
    erfc(βd) on [0, c) while sending {f, f', f''} to 0 at c
    (ref nonbonded.py:23-39; cutoff intentionally pinned)."""
    del cutoff
    c = SWITCH_CUTOFF
    f = jnp.cos(0.5 * jnp.pi * (dij / c) ** 8) ** 3
    return jnp.where(dij < c, f, 0.0)


def combine_sigma(sig_half_i, sig_half_j):
    """Lorentz-Berthelot arithmetic mean, on σ/2-stored params."""
    return sig_half_i + sig_half_j


def combine_epsilon(sqrt_eps_i, sqrt_eps_j):
    """Lorentz-Berthelot geometric mean, on √ε-stored params."""
    return sqrt_eps_i * sqrt_eps_j


def lennard_jones(dij, sig_ij, eps_ij):
    """4 ε ((σ/d)^12 - (σ/d)^6). Caller guarantees dij > 0 where eps != 0."""
    sig6 = (sig_ij / dij) ** 6
    return 4.0 * eps_ij * (sig6 * sig6 - sig6)


def direct_space_pme(dij, qij, beta):
    """q_ij erfc(β d) / d — the real-space Ewald/PME term
    (ref nonbonded.py:66-72)."""
    return qij * erfc(beta * dij) / dij


def switched_direct_space_pme(dij, qij, beta, cutoff):
    return direct_space_pme(dij, qij, beta) * switch_fn(dij, cutoff)


def validate_coulomb_cutoff(cutoff=1.0, beta=2.0, threshold=1e-2):
    import warnings

    tail = float(erfc(beta * cutoff))
    if tail > threshold:
        warnings.warn(f"erfc(beta * cutoff) = {tail} > threshold = {threshold}")


def exclusions_to_rescale_masks(exclusion_idxs, scale_factors, n):
    """Dense (N, N) multiplicative masks from the exclusion list: mask = 1 - scale.

    Host-side (numpy). Column 0 of scale_factors scales charge, column 1 LJ
    (ref nonbonded.py:159-173).
    """
    charge_mask = np.ones((n, n))
    lj_mask = np.ones((n, n))
    for (i, j), (q_scale, lj_scale) in zip(np.asarray(exclusion_idxs), np.asarray(scale_factors)):
        charge_mask[i, j] = charge_mask[j, i] = 1.0 - q_scale
        lj_mask[i, j] = lj_mask[j, i] = 1.0 - lj_scale
    return charge_mask, lj_mask


def filter_exclusions(atom_idxs, exclusion_idxs, scale_factors, update_idxs=False):
    """Drop exclusions touching atoms outside atom_idxs; optionally remap
    indices into the compacted frame (ref nonbonded.py:176-218). Host-side."""
    keep = set(int(a) for a in atom_idxs)
    remap = {int(j): i for i, j in enumerate(atom_idxs)}
    out_idxs, out_scales = [], []
    for (i, j), sf in zip(np.asarray(exclusion_idxs), np.asarray(scale_factors)):
        i, j = int(i), int(j)
        if i not in keep or j not in keep:
            continue
        if update_idxs:
            i, j = remap[i], remap[j]
        out_idxs.append((i, j))
        out_scales.append(sf)
    out_idxs_arr = np.array(out_idxs, dtype=np.int32).reshape(-1, 2)
    n_cols = np.asarray(scale_factors).reshape(len(scale_factors), -1).shape[1] if len(scale_factors) else 2
    out_scales_arr = np.array(out_scales, dtype=np.float64).reshape(-1, n_cols)
    return out_idxs_arr, out_scales_arr


def nonbonded_block_unsummed(xi, xj, box, params_i, params_j, beta, cutoff):
    """(N, M) energy block between two disjoint particle sets, no exclusions
    (ref nonbonded.py:80-149). Used for host-guest coupling and tests."""
    dr = periodic_delta(xi[:, None, :], xj[None, :, :], box)
    dw = params_i[:, 3][:, None] - params_j[:, 3][None, :]
    dij = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + dw * dw)

    sig_ij = combine_sigma(params_i[:, 1][:, None], params_j[:, 1][None, :])
    eps_ij = combine_epsilon(params_i[:, 2][:, None], params_j[:, 2][None, :])
    qij = params_i[:, 0][:, None] * params_j[:, 0][None, :]

    es = switched_direct_space_pme(dij, qij, beta, cutoff)
    lj = lennard_jones(dij, sig_ij, eps_ij)
    return jnp.where(dij < cutoff, es + lj, 0.0)


def nonbonded_block(xi, xj, box, params_i, params_j, beta, cutoff):
    return jnp.sum(nonbonded_block_unsummed(xi, xj, box, params_i, params_j, beta, cutoff))


def nonbonded_all_pairs_dense(
    conf,
    params,
    box,
    charge_rescale_mask,
    lj_rescale_mask,
    beta,
    cutoff,
    atom_mask=None,
):
    """Dense O(N²) all-pairs energy with exclusion masks.

    TPU-facing variant of ref nonbonded.py:221-339: instead of filtering a
    dynamic atom subset, `atom_mask` (N,) multiplicatively deactivates atoms —
    static shapes, jit-stable. Exclusion semantics: each pair's ES/LJ terms
    are scaled by (1 - scale) masks built by `exclusions_to_rescale_masks`.
    """
    n = conf.shape[0]
    charges, sig, eps, w = params[:, 0], params[:, 1], params[:, 2], params[:, 3]

    sig_ij = combine_sigma(sig[None, :], sig[:, None])
    eps_ij = combine_epsilon(eps[None, :], eps[:, None])

    dr = periodic_delta(conf[:, None, :], conf[None, :, :], box)
    d2 = jnp.sum(dr * dr, axis=-1)
    dw = w[:, None] - w[None, :]
    d2 = d2 + dw * dw

    eye = jnp.eye(n, dtype=bool)
    keep = ~eye
    if atom_mask is not None:
        pair_active = (atom_mask[:, None] > 0) & (atom_mask[None, :] > 0)
        keep = keep & pair_active

    d2 = jnp.where(eye, 1.0, d2)  # keep sqrt grad finite on the diagonal
    dij = jnp.sqrt(d2)

    in_range = keep & (dij < cutoff)

    eps_eff = jnp.where(in_range, eps_ij, 0.0)
    sig_eff = jnp.where(in_range, sig_ij, 0.0)
    lj = jnp.where(eps_eff != 0, lennard_jones(jnp.where(in_range, dij, 1.0), sig_eff, eps_eff), 0.0)

    qij = jnp.where(in_range, charges[:, None] * charges[None, :], 0.0)
    es = jnp.where(in_range, switched_direct_space_pme(jnp.where(in_range, dij, 1.0), qij, beta, cutoff), 0.0)

    total = lj * lj_rescale_mask + es * charge_rescale_mask
    return 0.5 * jnp.sum(total)


def nonbonded_on_specific_pairs(conf, params, box, pairs, beta, cutoff=None, rescale_mask=None, pair_mask=None,
                                es_poly_coeffs=None):
    """Per-pair (vdW, electrostatics) energies over an explicit pair list
    (ref nonbonded.py:342-400).

    pairs: (P, 2). rescale_mask: (P, 2) multiplicative [q, lj] factors.
    pair_mask: optional (P,) bool — padding rows (also implied by idx < 0).
    es_poly_coeffs: optional Chebyshev series of the switched-erfc factor
    h(u), u = d/SWITCH_CUTOFF on [0, 1] (rowscan kernel's polynomial ES) —
    pass the kernel's own series so exclusion corrections cancel the
    kernel's all-pairs term exactly rather than to polynomial-fit accuracy.
    Returns two (P,) arrays (caller sums), so exclusion potentials can negate.
    """
    if pairs.shape[0] == 0:
        z = jnp.zeros((1,), dtype=conf.dtype)
        return z, z

    valid = jnp.all(pairs >= 0, axis=-1)
    if pair_mask is not None:
        valid = valid & pair_mask
    safe_pairs = jnp.where(pairs >= 0, pairs, 0)
    inds_l, inds_r = safe_pairs[:, 0], safe_pairs[:, 1]

    charges, sig, eps, w = params[:, 0], params[:, 1], params[:, 2], params[:, 3]
    w_offsets = w[inds_l] - w[inds_r]
    dij = lifted_distance_on_pairs(conf[inds_l], conf[inds_r], box, w_offsets)
    cutoff_val = jnp.inf if cutoff is None else cutoff
    keep = valid & (dij < cutoff_val)
    dij_safe = jnp.where(dij > 0, dij, 1.0)

    sig_ij = jnp.where(keep, combine_sigma(sig[inds_l], sig[inds_r]), 0.0)
    eps_ij = jnp.where(keep, combine_epsilon(eps[inds_l], eps[inds_r]), 0.0)
    vdW = jnp.where(eps_ij != 0, lennard_jones(dij_safe, sig_ij, eps_ij), 0.0)

    qij = jnp.where(keep, charges[inds_l] * charges[inds_r], 0.0)
    if es_poly_coeffs is None:
        electrostatics = jnp.where(keep, switched_direct_space_pme(dij_safe, qij, beta, cutoff_val), 0.0)
    else:
        t = 2.0 * (dij_safe / SWITCH_CUTOFF) - 1.0
        h = _polyval_t(t, es_poly_coeffs)
        electrostatics = jnp.where(keep, qij * h / dij_safe, 0.0)

    if rescale_mask is not None:
        vdW = jnp.where(rescale_mask[:, 1] != 0, vdW * rescale_mask[:, 1], 0.0)
        electrostatics = jnp.where(rescale_mask[:, 0] != 0, electrostatics * rescale_mask[:, 0], 0.0)

    return vdW, electrostatics


def nonbonded_on_precomputed_pairs(conf, params, box, pairs, beta, cutoff=None):
    """Pair list with pre-combined parameters per pair:
    params rows (q_ij, σ_ij, ε_ij, Δw_ij) — the intramolecular ligand term
    (ref nonbonded.py:403-446)."""
    if pairs.shape[0] == 0:
        z = jnp.zeros((1,), dtype=conf.dtype)
        return z, z

    valid = jnp.all(pairs >= 0, axis=-1)
    safe_pairs = jnp.where(pairs >= 0, pairs, 0)
    inds_l, inds_r = safe_pairs[:, 0], safe_pairs[:, 1]
    q_ij, sig_ij, eps_ij, offsets = params[:, 0], params[:, 1], params[:, 2], params[:, 3]

    dij = lifted_distance_on_pairs(conf[inds_l], conf[inds_r], box, offsets)
    cutoff_val = jnp.inf if cutoff is None else cutoff
    keep = valid & (dij < cutoff_val)
    dij_safe = jnp.where(dij > 0, dij, 1.0)

    q_eff = jnp.where(keep, q_ij, 0.0)
    sig_eff = jnp.where(keep, sig_ij, 0.0)
    eps_eff = jnp.where(keep, eps_ij, 0.0)

    vdW = jnp.where(eps_eff != 0, lennard_jones(dij_safe, sig_eff, eps_eff), 0.0)
    electrostatics = jnp.where(q_eff != 0, switched_direct_space_pme(dij_safe, q_eff, beta, cutoff_val), 0.0)
    return vdW, electrostatics


def validate_interaction_group_idxs(n_atoms, a_idxs, b_idxs):
    a, b = set(map(int, a_idxs)), set(map(int, b_idxs))
    ab = a | b
    assert a.isdisjoint(b)
    assert max(ab) < n_atoms and min(ab) >= 0
    assert len(a_idxs) == len(a) and len(b_idxs) == len(b)


def nonbonded_interaction_groups(conf, params, box, a_idxs, b_idxs, beta, cutoff=None):
    """All (i in A) × (j in B) interactions (ref nonbonded.py:460-481).
    Returns per-pair (vdW, es) arrays."""
    from timemachine_tpu.ops.pbc import interaction_group_idxs

    n = conf.shape[0]
    if b_idxs is None:
        b_idxs = np.setdiff1d(np.arange(n), np.asarray(a_idxs))
    validate_interaction_group_idxs(n, a_idxs, b_idxs)
    pairs = interaction_group_idxs(a_idxs, b_idxs)
    return nonbonded_on_specific_pairs(conf, params, box, jnp.asarray(pairs), beta, cutoff)


# ---------------------------------------------------------------------------
# Prefactor machinery for fast reweighting over charge / LJ parameters
# (linear-basis trick; ref nonbonded.py:491-885). Energies of the
# ligand-environment interaction group become dot products in the ligand
# parameters, so a trajectory can be re-scored for new parameters in O(T·N_lig).
# ---------------------------------------------------------------------------


def coulomb_prefactors_on_snapshot(x_ligand, x_env, q_env, box=None, beta=2.0, cutoff=jnp.inf):
    """prefactor_i = Σ_j q_j erfc(β d_ij) switch(d_ij) / d_ij
    (ref nonbonded.py:497-543)."""
    from timemachine_tpu.ops.pbc import distances_from_point

    def per_atom(x_i):
        d = distances_from_point(x_i, x_env, box, cutoff)
        return jnp.sum(q_env / d * erfc(beta * d) * switch_fn(d, cutoff))

    import jax

    return jax.vmap(per_atom)(x_ligand)


def coulomb_interaction_group_energy(q_ligand, q_prefactors):
    return jnp.dot(q_prefactors, q_ligand)


def _lj_basis_powers(power):
    exponents = power - np.arange(power + 1)
    from scipy.special import binom

    coeffs = binom(power, exponents)
    return exponents, coeffs


def basis_expand_lj_env(sig_env, eps_env, r_env):
    """[20] basis vector summarizing the environment for the Naden-Shirts
    linear-basis LJ expansion (ref nonbonded.py:690-751)."""
    parts = []
    for power, sign in ((12, 1.0), (6, -1.0)):
        exps, coeffs = _lj_basis_powers(power)
        r_inv = r_env ** (-power)
        raised = sig_env ** jnp.asarray(exps)[:, None]
        h = jnp.sum(4.0 * r_inv * raised * jnp.asarray(coeffs)[:, None] * eps_env[None, :], axis=1)
        parts.append(sign * h)
    return jnp.concatenate(parts)


def basis_expand_lj_atom(sig, eps):
    """[20] projection of one atom's (σ, ε) onto the basis
    (ref nonbonded.py:754-776)."""
    exponents = jnp.concatenate([jnp.arange(13.0), jnp.arange(7.0)])
    return eps * sig**exponents


def lj_prefactors_on_snapshot(x_ligand, x_env, sig_env, eps_env, box=None, cutoff=jnp.inf):
    """(N_lig, 20) environment prefactors (ref nonbonded.py:779-831)."""
    from timemachine_tpu.ops.pbc import distances_from_point

    import jax

    def per_atom(x_i):
        r = distances_from_point(x_i, x_env, box, cutoff)
        return basis_expand_lj_env(sig_env, eps_env, r)

    return jax.vmap(per_atom)(x_ligand)


def lj_interaction_group_energy(sig_ligand, eps_ligand, lj_prefactors):
    import jax

    projection = jax.vmap(basis_expand_lj_atom)(sig_ligand, eps_ligand)
    return jnp.sum(projection * lj_prefactors)


def leading_water_exclusions(exc_idxs, exc_scales) -> int:
    """Number of leading TIP3P waters whose exclusions appear as rows
    [3w, 3w+1, 3w+2] = [(3w,3w+1), (3w,3w+2), (3w+1,3w+2)] with full
    [1, 1] scales (the native builder layout, md/builders.py:128-129).
    Host-side; lets the per-step exclusion correction run on strided lane
    slices instead of gather/scatter rows."""
    exc_idxs = np.asarray(exc_idxs)
    exc_scales = np.asarray(exc_scales)
    if exc_idxs.ndim != 2 or exc_idxs.shape[0] < 3:
        return 0
    nw = exc_idxs.shape[0] // 3
    w = np.arange(nw)
    ok = (
        (exc_idxs[3 * w, 0] == 3 * w)
        & (exc_idxs[3 * w, 1] == 3 * w + 1)
        & (exc_idxs[3 * w + 1, 0] == 3 * w)
        & (exc_idxs[3 * w + 1, 1] == 3 * w + 2)
        & (exc_idxs[3 * w + 2, 0] == 3 * w + 1)
        & (exc_idxs[3 * w + 2, 1] == 3 * w + 2)
        & np.all(exc_scales[3 * w] == 1.0, axis=-1)
        & np.all(exc_scales[3 * w + 1] == 1.0, axis=-1)
        & np.all(exc_scales[3 * w + 2] == 1.0, axis=-1)
    )
    bad = np.nonzero(~ok)[0]
    return int(bad[0]) if bad.size else nw


def water_exclusion_energy(conf, params, box, nw, beta, cutoff, es_poly_coeffs=None):
    """Exclusion energy of the first nw waters' three intra pairs on strided
    lane slices (scatter-free adjoint). Matches nonbonded_on_specific_pairs
    with full [1, 1] scales for those rows."""
    xT = conf[:, :3].T  # (3, N)
    pT = params.T  # (4, N)
    box_diag = jnp.diagonal(box)[:, None]
    u = jnp.asarray(0.0, dtype=conf.dtype)
    sl = [slice(k, 3 * nw, 3) for k in range(3)]
    for a, b in ((0, 1), (0, 2), (1, 2)):
        d = xT[:, sl[a]] - xT[:, sl[b]]
        d = d - box_diag * jnp.floor(d / box_diag + 0.5)
        dw = pT[3, sl[a]] - pT[3, sl[b]]
        dij = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=0) + dw * dw, 1e-24))
        keep = dij < cutoff
        dij_safe = jnp.where(dij > 0, dij, 1.0)
        sig = jnp.where(keep, combine_sigma(pT[1, sl[a]], pT[1, sl[b]]), 0.0)
        eps = jnp.where(keep, combine_epsilon(pT[2, sl[a]], pT[2, sl[b]]), 0.0)
        u = u + jnp.sum(jnp.where(eps != 0, lennard_jones(dij_safe, sig, eps), 0.0))
        qij = jnp.where(keep, pT[0, sl[a]] * pT[0, sl[b]], 0.0)
        if es_poly_coeffs is None:
            es = jnp.where(keep, switched_direct_space_pme(dij_safe, qij, beta, cutoff), 0.0)
        else:
            t = 2.0 * (dij_safe / SWITCH_CUTOFF) - 1.0
            es = jnp.where(keep, qij * _polyval_t(t, es_poly_coeffs) / dij_safe, 0.0)
        u = u + jnp.sum(es)
    return u


def specific_pairs_force_contribs(conf, params, box, pairs, beta, cutoff, rescale_mask, es_poly_coeffs):
    """Closed-form forward pass of `nonbonded_on_specific_pairs` with
    polynomial (Chebyshev) electrostatics. Returns (u, [f_l, f_r]) per-role
    FORCE contributions (f = -dU/dx side), zero on padding/beyond-cutoff
    rows — shared by the scatter (specific_pairs_energy_force) and
    scatter-free (ops/assembly.py) assembly paths."""
    import numpy as _np

    if pairs.shape[0] == 0:
        z = jnp.zeros((0, 3), conf.dtype)
        return jnp.asarray(0.0, dtype=conf.dtype), [z, z]
    coeffs = jnp.asarray(es_poly_coeffs, dtype=conf.dtype)
    dcoeffs = jnp.asarray(_np.polynomial.polynomial.polyder(_np.asarray(es_poly_coeffs)), dtype=conf.dtype)

    valid = jnp.all(pairs >= 0, axis=-1)
    safe_pairs = jnp.where(pairs >= 0, pairs, 0)
    inds_l, inds_r = safe_pairs[:, 0], safe_pairs[:, 1]

    charges, sig, eps, w = params[:, 0], params[:, 1], params[:, 2], params[:, 3]
    w_offsets = w[inds_l] - w[inds_r]
    from timemachine_tpu.ops.pbc import periodic_delta

    dx = periodic_delta(conf[inds_l], conf[inds_r], box)  # (P, 3)
    d2 = jnp.sum(dx * dx, axis=-1) + w_offsets**2
    safe_d2 = jnp.where(d2 > 0, d2, 1.0)
    dij = jnp.where(d2 > 0, jnp.sqrt(safe_d2), 0.0)
    keep = valid & (dij < cutoff)
    dij_safe = jnp.where(dij > 0, dij, 1.0)

    sig_ij = jnp.where(keep, combine_sigma(sig[inds_l], sig[inds_r]), 0.0)
    eps_ij = jnp.where(keep, combine_epsilon(eps[inds_l], eps[inds_r]), 0.0)
    lj_scale = rescale_mask[:, 1]
    q_scale = rescale_mask[:, 0]
    eps_eff = jnp.where(lj_scale != 0, eps_ij * lj_scale, 0.0)

    inv_d = 1.0 / dij_safe
    sig6 = jnp.where(eps_eff != 0, (sig_ij * inv_d) ** 6, 0.0)
    vdW = 4.0 * eps_eff * (sig6 * sig6 - sig6)
    # d(vdW)/dd = 4 eps (-12 sig12/d^13 + 6 sig6/d^7) = (4 eps / d)(6 sig6 - 12 sig12)
    dvdW = 4.0 * eps_eff * inv_d * (6.0 * sig6 - 12.0 * sig6 * sig6)

    qij = jnp.where(keep, charges[inds_l] * charges[inds_r] * q_scale, 0.0)
    t = 2.0 * (dij_safe / SWITCH_CUTOFF) - 1.0
    h = _polyval_t(t, coeffs)
    hp = _polyval_t(t, dcoeffs)
    es = qij * h * inv_d
    # d(es)/dd = q (h'(t) (2/S) / d - h / d^2)
    des = qij * (hp * (2.0 / SWITCH_CUTOFF) * inv_d - h * inv_d * inv_d)

    u = jnp.sum(vdW + es)
    dU = jnp.where(keep, dvdW + des, 0.0)  # dU/dd per pair
    # force on l = -dU/dd * (dx / d); force on r = +...
    g = (dU * inv_d)[:, None] * dx
    g = jnp.where(keep[:, None], g, 0.0)
    return u, [-g, g]


def specific_pairs_energy_force(conf, params, box, pairs, beta, cutoff, rescale_mask, es_poly_coeffs):
    """Closed-form (u, force) of `nonbonded_on_specific_pairs` with
    polynomial (Chebyshev) electrostatics — the exclusion-correction hot
    path. u = Σ vdW + Σ es (caller negates for exclusions); force = -dU/dx
    assembled by scatter-add, skipping the autodiff adjoint.

    Requires es_poly_coeffs (the rowscan kernel's own h(u) series so the
    cancellation against the all-pairs term is exact); callers without a
    polynomial ES stay on autodiff."""
    n = conf.shape[0]
    if pairs.shape[0] == 0:
        return jnp.asarray(0.0, dtype=conf.dtype), jnp.zeros_like(conf)
    u, (g_l, g_r) = specific_pairs_force_contribs(
        conf, params, box, pairs, beta, cutoff, rescale_mask, es_poly_coeffs
    )
    valid = jnp.all(pairs >= 0, axis=-1)
    force = jnp.zeros_like(conf)
    force = force.at[jnp.where(valid, pairs[:, 0], n)].add(g_l, mode="drop")
    force = force.at[jnp.where(valid, pairs[:, 1], n)].add(g_r, mode="drop")
    return u, force


def interaction_group_energy_force(conf, params, box, a_idxs, b_idxs, beta, cutoff, col_mask=None):
    """Closed-form (u, force) for the A×B interaction group in grid form.

    col_mask: optional (C,) bool — False columns contribute nothing (lets a
    spatially-partitioned caller pad b_idxs to an even split by duplicating
    a real index without double counting; parallel/spatial_md.py).

    The pair-list formulation's autodiff adjoint scatter-adds 2·R·C force
    contributions (the dominant per-step cost of RBFE windows at ~224k
    ligand×env pairs); here the (R, C) grid reduces each side's force by a
    SUM over the other axis — no large scatters. Per-pair dU/dd comes from
    an elementwise jax.grad of the scalar pair energy (exact, no adjoint
    through gather/scatter). Energy semantics identical to
    nonbonded_interaction_groups / nonbonded_on_specific_pairs."""
    import jax

    from timemachine_tpu.ops.pbc import periodic_delta

    n = conf.shape[0]
    if b_idxs is None:
        b_idxs = np.setdiff1d(np.arange(n), np.asarray(a_idxs))
    a_idxs = jnp.asarray(a_idxs)
    b_idxs = jnp.asarray(b_idxs)

    charges, sig, eps, w = params[:, 0], params[:, 1], params[:, 2], params[:, 3]
    xa, xb = conf[a_idxs], conf[b_idxs]
    dx = periodic_delta(xa[:, None, :], xb[None, :, :], box)  # (R, C, 3)
    dw = w[a_idxs][:, None] - w[b_idxs][None, :]
    d2 = jnp.sum(dx * dx, axis=-1) + dw * dw
    safe_d2 = jnp.where(d2 > 0, d2, 1.0)
    dij = jnp.where(d2 > 0, jnp.sqrt(safe_d2), 0.0)
    keep = dij < cutoff
    dij_safe = jnp.where(dij > 0, dij, 1.0)
    if col_mask is not None:
        keep = keep & jnp.asarray(col_mask)[None, :]

    sig_ij = jnp.where(keep, combine_sigma(sig[a_idxs][:, None], sig[b_idxs][None, :]), 0.0)
    eps_ij = jnp.where(keep, combine_epsilon(eps[a_idxs][:, None], eps[b_idxs][None, :]), 0.0)
    qij = jnp.where(keep, charges[a_idxs][:, None] * charges[b_idxs][None, :], 0.0)

    def pair_u(d, q_ij, s_ij, e_ij):
        vdw = jnp.where(e_ij != 0, lennard_jones(d, s_ij, e_ij), 0.0)
        es = switched_direct_space_pme(d, q_ij, beta, cutoff)
        return vdw + es

    u_grid, du_dd = jax.vmap(jax.vmap(jax.value_and_grad(pair_u), in_axes=(0, 0, 0, 0)))(
        dij_safe, qij, sig_ij, eps_ij
    )
    u = jnp.sum(jnp.where(keep, u_grid, 0.0))

    g = jnp.where(keep, du_dd, 0.0)[:, :, None] * (dx / dij_safe[:, :, None])  # dU/d(xa) per pair
    f_a = -jnp.sum(g, axis=1)  # (R, 3)
    f_b = +jnp.sum(g, axis=0)  # (C, 3)
    force = jnp.zeros_like(conf)
    force = force.at[a_idxs].add(f_a)
    force = force.at[b_idxs].add(f_b)
    return u, force
