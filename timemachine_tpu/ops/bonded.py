"""Bonded (valence) energy terms.

Parity target: reference `timemachine/potentials/bonded.py` and the CUDA
kernels `timemachine/cpp/src/k_harmonic_bond.cuh` etc. All functions take
(conf, params, box, idxs) and return a scalar energy in kJ/mol; all are
jit/grad/vmap-safe with static shapes. Empty index arrays return 0.

A per-term mask convention: rows of `idxs` equal to -1 (any slot) are padding
and contribute zero energy. This lets alchemical systems keep static shapes
across λ states — the TPU analog of the reference's dynamically-sized lists.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from timemachine_tpu.constants import DEFAULT_POSITIONAL_RESTRAINT_K
from timemachine_tpu.ops.pbc import periodic_delta


def _pad_mask(idxs):
    """True for real rows, False for -1 padded rows."""
    return jnp.all(idxs >= 0, axis=-1)


def _safe_gather(conf, idxs):
    """Gather conf rows, mapping padding (-1) to row 0 to keep indices valid."""
    return conf[jnp.where(idxs >= 0, idxs, 0)]


# Strided water fast paths: ON by default. An isolated bonded-only scan probe
# measured the strided slice-adjoint slightly slower than the generic
# gather/scatter path (0.68 vs 0.55 ms/step at 23k atoms), but the FULL MD
# step disagrees: bench.py drops 45.5 -> 43.2 ns/day with this off — inside
# the fused step the strided ops overlap with the Pallas sweep where the
# scatter path serializes. End-to-end wins.
WATER_FAST_PATH = True


def _leading_water_bonds(bond_idxs) -> int:
    """Number of leading TIP3P-pattern waters whose bonds appear as
    [(3w, 3w+1), (3w, 3w+2)] rows 2w/2w+1 (the native builder layout,
    builders.py:124); see WATER_FAST_PATH."""
    if not WATER_FAST_PATH:
        return 0
    if not isinstance(bond_idxs, np.ndarray) or bond_idxs.ndim != 2 or bond_idxs.shape[0] < 2:
        return 0
    nw = bond_idxs.shape[0] // 2
    w = np.arange(nw)
    ok = (
        (bond_idxs[2 * w, 0] == 3 * w)
        & (bond_idxs[2 * w, 1] == 3 * w + 1)
        & (bond_idxs[2 * w + 1, 0] == 3 * w)
        & (bond_idxs[2 * w + 1, 1] == 3 * w + 2)
    )
    bad = np.nonzero(~ok)[0]
    return int(bad[0]) if bad.size else nw


def _water_bond_energy(conf, params, nw):
    """Strided-slice energy of the first nw waters' O-H bonds (lane-major,
    scatter-free adjoint)."""
    xT = conf.T  # (3, N)
    o = xT[:, 0 : 3 * nw : 3]
    u = jnp.asarray(0.0, dtype=conf.dtype)
    for h_off, row_off in ((1, 0), (2, 1)):
        h = xT[:, h_off : 3 * nw : 3]
        d = h - o
        dm = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=0), 1e-24))
        k = params[row_off : 2 * nw : 2, 0]
        r0 = params[row_off : 2 * nw : 2, 1]
        u = u + jnp.sum(0.5 * k * (dm - r0) ** 2)
    return u


def harmonic_bond(conf, params, box, bond_idxs):
    """U = Σ k/2 (|ri - rj| - r0)²; params rows (k, r0).

    The r0==0 case falls back to k/2 d² to keep the derivative finite at
    d == 0 (ref bonded.py:60-79). Not periodic (bonds never cross the box).
    """
    if bond_idxs.shape[0] == 0:
        return jnp.asarray(0.0, dtype=conf.dtype)
    nw = _leading_water_bonds(bond_idxs)
    if nw > 0:
        u_fast = _water_bond_energy(conf, params, nw)
        rest = bond_idxs[2 * nw :]
        if rest.shape[0] == 0:
            return u_fast
        return u_fast + harmonic_bond(conf, params[2 * nw :], box, rest)
    mask = _pad_mask(bond_idxs)
    ci = _safe_gather(conf, bond_idxs[:, 0])
    cj = _safe_gather(conf, bond_idxs[:, 1])
    dx = ci - cj
    d2 = jnp.sum(dx * dx, axis=-1)
    safe_d2 = jnp.where(d2 > 0, d2, 1.0)
    d = jnp.where(d2 > 0, jnp.sqrt(safe_d2), 0.0)
    k, r0 = params[:, 0], params[:, 1]
    e = jnp.where(r0 == 0, 0.5 * k * d2, 0.5 * k * (d - r0) ** 2)
    return jnp.sum(jnp.where(mask, e, 0.0))


def stable_angle(ci, cj, ck, eps):
    """Angle at j spanned by j->i and j->k, computed via the half-angle
    (Kahan) formulation 2·atan2(|n_jk r_ji − n_ji r_jk|, |n_jk r_ji + n_ji r_jk|),
    stabilized by appending eps as an extra vector component so the angle is
    defined even when r_ji or r_jk collapses (ref bonded.py:82-98)."""
    rji = jnp.concatenate([ci - cj, eps[..., None]], axis=-1)
    rjk = jnp.concatenate([ck - cj, eps[..., None]], axis=-1)
    nji = jnp.linalg.norm(rji, axis=-1, keepdims=True)
    njk = jnp.linalg.norm(rjk, axis=-1, keepdims=True)
    y = jnp.linalg.norm(njk * rji - nji * rjk, axis=-1)
    x = jnp.linalg.norm(njk * rji + nji * rjk, axis=-1)
    return 2.0 * jnp.arctan2(y, x)


def _leading_water_angles(angle_idxs) -> int:
    """Number of leading waters whose H-O-H angle appears as row w =
    (3w+1, 3w, 3w+2) (builders.py:126); see WATER_FAST_PATH."""
    if not WATER_FAST_PATH:
        return 0
    if not isinstance(angle_idxs, np.ndarray) or angle_idxs.ndim != 2 or angle_idxs.shape[0] < 1:
        return 0
    nw = angle_idxs.shape[0]
    w = np.arange(nw)
    ok = (angle_idxs[:, 0] == 3 * w + 1) & (angle_idxs[:, 1] == 3 * w) & (angle_idxs[:, 2] == 3 * w + 2)
    bad = np.nonzero(~ok)[0]
    return int(bad[0]) if bad.size else nw


def _water_angle_energy(conf, params, nw):
    """Strided-slice H-O-H angle energy of the first nw waters."""
    xT = conf.T
    o = xT[:, 0 : 3 * nw : 3]
    h1 = xT[:, 1 : 3 * nw : 3]
    h2 = xT[:, 2 : 3 * nw : 3]
    eps = params[:nw, 2]
    rji = jnp.concatenate([h1 - o, eps[None, :]], axis=0)  # (4, nw)
    rjk = jnp.concatenate([h2 - o, eps[None, :]], axis=0)
    nji = jnp.sqrt(jnp.sum(rji * rji, axis=0, keepdims=True))
    njk = jnp.sqrt(jnp.sum(rjk * rjk, axis=0, keepdims=True))
    ya = njk * rji - nji * rjk
    xa = njk * rji + nji * rjk
    theta = 2.0 * jnp.arctan2(
        jnp.sqrt(jnp.maximum(jnp.sum(ya * ya, axis=0), 1e-24)),
        jnp.sqrt(jnp.maximum(jnp.sum(xa * xa, axis=0), 1e-24)),
    )
    k, a0 = params[:nw, 0], params[:nw, 1]
    return jnp.sum(0.5 * k * (theta - a0) ** 2)


def harmonic_angle(conf, params, box, angle_idxs):
    """U = Σ k/2 (θ - θ0)²; params rows (k, θ0, eps) — eps is the numerical
    stabilizer threaded through `stable_angle` (ref bonded.py:101-138)."""
    if angle_idxs.shape[0] == 0:
        return jnp.asarray(0.0, dtype=conf.dtype)
    nw = _leading_water_angles(angle_idxs)
    if nw > 0:
        u_fast = _water_angle_energy(conf, params, nw)
        rest = angle_idxs[nw:]
        if rest.shape[0] == 0:
            return u_fast
        return u_fast + harmonic_angle(conf, params[nw:], box, rest)
    mask = _pad_mask(angle_idxs)
    ci = _safe_gather(conf, angle_idxs[:, 0])
    cj = _safe_gather(conf, angle_idxs[:, 1])
    ck = _safe_gather(conf, angle_idxs[:, 2])
    k, a0, eps = params[:, 0], params[:, 1], params[:, 2]
    theta = stable_angle(ci, cj, ck, eps)
    e = 0.5 * k * (theta - a0) ** 2
    return jnp.sum(jnp.where(mask, e, 0.0))


def signed_torsion_angle(ci, cj, ck, cl):
    """Signed dihedral i-j-k-l via the atan2 formulation (numerically stable
    at 0; ref bonded.py:141-174)."""
    rij = cj - ci
    rkj = cj - ck
    rkl = cl - ck
    n1 = jnp.cross(rij, rkj)
    n2 = jnp.cross(rkj, rkl)
    rkj_unit = rkj / jnp.linalg.norm(rkj, axis=-1, keepdims=True)
    y = jnp.sum(jnp.cross(n1, n2) * rkj_unit, axis=-1)
    x = jnp.sum(n1 * n2, axis=-1)
    return jnp.arctan2(y, x)


def periodic_torsion(conf, params, box, torsion_idxs):
    """U = Σ k (1 + cos(n φ - phase)); params rows (k, phase, n)
    (ref bonded.py:177-216). Only the first 3 coordinates are used."""
    if torsion_idxs.shape[0] == 0:
        return jnp.asarray(0.0, dtype=conf.dtype)
    mask = _pad_mask(torsion_idxs)
    conf3 = conf[:, :3]
    ci = _safe_gather(conf3, torsion_idxs[:, 0])
    cj = _safe_gather(conf3, torsion_idxs[:, 1])
    ck = _safe_gather(conf3, torsion_idxs[:, 2])
    cl = _safe_gather(conf3, torsion_idxs[:, 3])
    k, phase, period = params[:, 0], params[:, 1], params[:, 2]
    angle = signed_torsion_angle(ci, cj, ck, cl)
    e = k * (1.0 + jnp.cos(period * angle - phase))
    return jnp.sum(jnp.where(mask, e, 0.0))


def _flat_bottom_terms(conf, params, box, bond_idxs):
    """Per-pair quartic flat-bottom restraint:
    U = k/4 (r - r_max)^4 for r > r_max; k/4 (r - r_min)^4 for r < r_min
    (ref bonded.py:219-232). Periodic-aware."""
    i, j = bond_idxs[:, 0], bond_idxs[:, 1]
    d = periodic_delta(_safe_gather(conf, i), _safe_gather(conf, j), box)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    k, r_min, r_max = params[:, 0], params[:, 1], params[:, 2]
    over = jnp.where(r > r_max, r - r_max, 0.0)
    under = jnp.where(r < r_min, r - r_min, 0.0)
    return 0.25 * k * (over**4 + under**4)


def flat_bottom_bond(conf, params, box, bond_idxs):
    if bond_idxs.shape[0] == 0:
        return jnp.asarray(0.0, dtype=conf.dtype)
    e = _flat_bottom_terms(conf, params, box, bond_idxs)
    return jnp.sum(jnp.where(_pad_mask(bond_idxs), e, 0.0))


def log_flat_bottom_bond(conf, params, box, bond_idxs, beta):
    """-1/β Σ log(1 - exp(-β U_fb)): the log-inverse flat-bottom used for
    probabilistic free-region selection in local MD (ref bonded.py:245-253)."""
    if bond_idxs.shape[0] == 0:
        return jnp.asarray(0.0, dtype=conf.dtype)
    u = _flat_bottom_terms(conf, params, box, bond_idxs)
    log_terms = -jnp.log(1.0 - jnp.exp(-beta * u))
    return jnp.sum(jnp.where(_pad_mask(bond_idxs), log_terms, 0.0)) / beta


def centroid_restraint(conf, params, box, group_a_idxs, group_b_idxs, kb, b0):
    """U = kb (|c_a - c_b| - b0)² between geometric centroids; the b0 == 0
    branch avoids the sqrt singularity (ref bonded.py:8-31). params/box unused."""
    ca = jnp.mean(conf[group_a_idxs], axis=0)
    cb = jnp.mean(conf[group_b_idxs], axis=0)
    dx = ca - cb
    d2 = jnp.sum(dx * dx)
    safe_d2 = jnp.where(d2 > 0, d2, 1.0)
    d = jnp.where(d2 > 0, jnp.sqrt(safe_d2), 0.0)
    return jnp.where(b0 == 0, kb * d2, kb * (d - b0) ** 2)


def harmonic_positional_restraint(x_init, x_new, box, k=DEFAULT_POSITIONAL_RESTRAINT_K):
    """PBC-aware k/2 Σ |x_new - x_init|², for minimization tethering
    (ref bonded.py:256-269)."""
    d2 = jnp.sum(periodic_delta(x_new, x_init, box) ** 2, axis=-1)
    return jnp.sum(0.5 * k * d2)


def water_bond_energy_force(conf, params, nw: int):
    """Analytic (u, force) of the first nw waters' O-H bonds — forward-only
    strided math, no autodiff adjoint, forces assembled by reshape (atoms of
    water w are contiguous rows 3w..3w+2). Layout per builders.py:126."""
    xT = conf[: 3 * nw].reshape(nw, 3, 3)  # (water, atom{O,H1,H2}, xyz)
    o = xT[:, 0]
    u = jnp.asarray(0.0, dtype=conf.dtype)
    f_o = jnp.zeros_like(o)
    f_h = []
    for h_idx, row_off in ((1, 0), (2, 1)):
        d = xT[:, h_idx] - o  # (nw, 3)
        r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=1), 1e-24))
        k = params[row_off : 2 * nw : 2, 0]
        r0 = params[row_off : 2 * nw : 2, 1]
        delta = r - r0
        u = u + jnp.sum(0.5 * k * delta * delta)
        pref = (k * delta / r)[:, None]  # dU/dr / r
        f_h.append(-pref * d)
        f_o = f_o + pref * d
    force_w = jnp.stack([f_o, f_h[0], f_h[1]], axis=1).reshape(3 * nw, 3)
    force = jnp.concatenate([force_w, jnp.zeros((conf.shape[0] - 3 * nw, 3), conf.dtype)])
    return u, force


def water_angle_energy_force(conf, params, nw: int):
    """Analytic (u, force) of the first nw waters' H-O-H angles (standard
    arccos form — identical to `stable_angle` at eps = 0, which is what the
    water FF rows carry; H-O-H never approaches the linear/collapsed
    singularities)."""
    xT = conf[: 3 * nw].reshape(nw, 3, 3)
    o, h1, h2 = xT[:, 0], xT[:, 1], xT[:, 2]
    d1 = h1 - o
    d2 = h2 - o
    r1 = jnp.sqrt(jnp.maximum(jnp.sum(d1 * d1, axis=1), 1e-24))
    r2 = jnp.sqrt(jnp.maximum(jnp.sum(d2 * d2, axis=1), 1e-24))
    u1 = d1 / r1[:, None]
    u2 = d2 / r2[:, None]
    c = jnp.clip(jnp.sum(u1 * u2, axis=1), -1.0 + 1e-7, 1.0 - 1e-7)
    s_inv = (1.0 - c * c) ** -0.5
    theta = jnp.arccos(c)

    k = params[:nw, 0]
    a0 = params[:nw, 1]
    delta = theta - a0
    u = jnp.sum(0.5 * k * delta * delta)

    # dtheta/d(d1) = (c*u1 - u2) * s_inv / r1 ; force = -k*delta * dtheta/dx
    g = (k * delta * s_inv)[:, None]
    f_h1 = -g * (c[:, None] * u1 - u2) / r1[:, None]
    f_h2 = -g * (c[:, None] * u2 - u1) / r2[:, None]
    f_o = -(f_h1 + f_h2)
    force_w = jnp.stack([f_o, f_h1, f_h2], axis=1).reshape(3 * nw, 3)
    force = jnp.concatenate([force_w, jnp.zeros((conf.shape[0] - 3 * nw, 3), conf.dtype)])
    return u, force


def _scatter_force(force, idxs_col, contrib, mask, n):
    """force.at[idxs].add(contrib) with padded (-1) rows dropped (negative
    indices would wrap in JAX; map them out of range and use mode='drop')."""
    safe = jnp.where(mask, idxs_col, n)
    return force.at[safe].add(jnp.where(mask[:, None], contrib, 0.0), mode="drop")


def bond_force_contribs(conf, params, idxs):
    """Closed-form harmonic-bond forward pass: (u, [force contribution of
    each bond on its role-0 atom, on its role-1 atom]) — contributions of
    padding rows are zero. Shared by the scatter (generic_bond_energy_force)
    and scatter-free (ops/assembly.py) assembly paths."""
    mask = _pad_mask(idxs)
    ci = _safe_gather(conf, idxs[:, 0])
    cj = _safe_gather(conf, idxs[:, 1])
    dx = ci - cj
    d2 = jnp.sum(dx * dx, axis=-1)
    safe_d2 = jnp.where(d2 > 0, d2, 1.0)
    d = jnp.where(d2 > 0, jnp.sqrt(safe_d2), 0.0)
    k, r0 = params[:, 0], params[:, 1]
    e = jnp.where(r0 == 0, 0.5 * k * d2, 0.5 * k * (d - r0) ** 2)
    u = jnp.sum(jnp.where(mask, e, 0.0))
    # dU/d(ci) = pref * dx with pref = k (r0==0) else k*(d-r0)/d
    pref = jnp.where(r0 == 0, k, k * (d - r0) / jnp.where(d > 0, d, 1.0))
    g = jnp.where(mask, pref, 0.0)[:, None] * dx
    return u, [-g, g]


def generic_bond_energy_force(conf, params, box, idxs):
    """Closed-form (u, force) for arbitrary harmonic-bond rows — the forward
    derivative of `harmonic_bond` assembled by gather + scatter-add, skipping
    the autodiff adjoint (protein/ligand tails; ref k_harmonic_bond.cuh does
    the same on CUDA)."""
    n = conf.shape[0]
    mask = _pad_mask(idxs)
    u, (g_i, g_j) = bond_force_contribs(conf, params, idxs)
    force = jnp.zeros_like(conf)
    force = _scatter_force(force, idxs[:, 0], g_i, mask, n)
    force = _scatter_force(force, idxs[:, 1], g_j, mask, n)
    return u, force


def angle_force_contribs(conf, params, idxs):
    """Closed-form harmonic-angle forward pass, INCLUDING the eps stabilizer:
    the Kahan form in `stable_angle` equals arccos of the eps-extended
    vectors (d, eps), whose gradient in the 3-D components is closed-form.
    Returns (u, [f_i, f_j, f_k] per-role force contributions, zero on
    padding rows)."""
    mask = _pad_mask(idxs)
    ci = _safe_gather(conf, idxs[:, 0])
    cj = _safe_gather(conf, idxs[:, 1])
    ck = _safe_gather(conf, idxs[:, 2])
    d1 = ci - cj
    d2v = ck - cj
    k, a0, eps = params[:, 0], params[:, 1], params[:, 2]
    eps2 = eps * eps
    r1 = jnp.sqrt(jnp.maximum(jnp.sum(d1 * d1, axis=1) + eps2, 1e-24))
    r2 = jnp.sqrt(jnp.maximum(jnp.sum(d2v * d2v, axis=1) + eps2, 1e-24))
    c = jnp.clip((jnp.sum(d1 * d2v, axis=1) + eps2) / (r1 * r2), -1.0 + 1e-7, 1.0 - 1e-7)
    s_inv = (1.0 - c * c) ** -0.5
    theta = jnp.arccos(c)
    delta = theta - a0
    u = jnp.sum(jnp.where(mask, 0.5 * k * delta * delta, 0.0))
    # dtheta/d(d1) = -s_inv (d2/(r1 r2) - c d1/r1^2); force = -k delta dtheta
    g = jnp.where(mask, k * delta * s_inv, 0.0)[:, None]
    f_i = g * (d2v / (r1 * r2)[:, None] - c[:, None] * d1 / (r1 * r1)[:, None])
    f_k = g * (d1 / (r1 * r2)[:, None] - c[:, None] * d2v / (r2 * r2)[:, None])
    return u, [f_i, -(f_i + f_k), f_k]


def generic_angle_energy_force(conf, params, box, idxs):
    """Closed-form (u, force) for harmonic-angle rows (see
    angle_force_contribs), assembled by scatter-add."""
    n = conf.shape[0]
    mask = _pad_mask(idxs)
    u, (f_i, f_j, f_k) = angle_force_contribs(conf, params, idxs)
    force = jnp.zeros_like(conf)
    force = _scatter_force(force, idxs[:, 0], f_i, mask, n)
    force = _scatter_force(force, idxs[:, 1], f_j, mask, n)
    force = _scatter_force(force, idxs[:, 2], f_k, mask, n)
    return u, force


def torsion_force_contribs(conf, params, idxs):
    """Closed-form periodic-torsion forward pass via the Blondel-Karplus
    dihedral gradient (adapted to this module's `signed_torsion_angle`
    vector convention; ref k_periodic_torsion.cuh). Collinear
    near-singularities are clamped the same way autodiff's 1/|n|^2 factors
    saturate. Returns (u, [f_i, f_j, f_k, f_l] 3-wide per-role force
    contributions, zero on padding rows)."""
    mask = _pad_mask(idxs)
    conf3 = conf[:, :3]
    ci = _safe_gather(conf3, idxs[:, 0])
    cj = _safe_gather(conf3, idxs[:, 1])
    ck = _safe_gather(conf3, idxs[:, 2])
    cl = _safe_gather(conf3, idxs[:, 3])
    rij = cj - ci
    rkj = cj - ck
    rkl = cl - ck
    n1 = jnp.cross(rij, rkj)
    n2 = jnp.cross(rkj, rkl)
    rkj2 = jnp.sum(rkj * rkj, axis=-1)
    rkj_norm = jnp.sqrt(jnp.maximum(rkj2, 1e-24))
    y = jnp.sum(jnp.cross(n1, n2) * rkj, axis=-1) / rkj_norm
    x = jnp.sum(n1 * n2, axis=-1)
    phi = jnp.arctan2(y, x)
    k, phase, period = params[:, 0], params[:, 1], params[:, 2]
    u = jnp.sum(jnp.where(mask, k * (1.0 + jnp.cos(period * phi - phase)), 0.0))

    dU = -k * period * jnp.sin(period * phi - phase)  # dU/dphi
    n1_2 = jnp.maximum(jnp.sum(n1 * n1, axis=-1), 1e-18)
    n2_2 = jnp.maximum(jnp.sum(n2 * n2, axis=-1), 1e-18)
    # phi == -phi_std (std: b2 = rk - rj = -rkj; m_std = -n1, n_std = -n2),
    # so F = -dU/dphi * dphi/dr = +dU/dphi * dphi_std/dr with
    # dphi_std/dri = |rkj| n1/|n1|^2, dphi_std/drl = -|rkj| n2/|n2|^2
    gi = (rkj_norm / n1_2)[:, None] * n1
    gl = -(rkj_norm / n2_2)[:, None] * n2
    t = -(jnp.sum(rij * rkj, axis=-1) / jnp.maximum(rkj2, 1e-24))
    s = -(jnp.sum(rkl * rkj, axis=-1) / jnp.maximum(rkj2, 1e-24))
    gj = -(t + 1.0)[:, None] * gi + s[:, None] * gl
    gk = t[:, None] * gi - (s + 1.0)[:, None] * gl

    w = jnp.where(mask, dU, 0.0)[:, None]
    return u, [w * gi, w * gj, w * gk, w * gl]


def torsion_energy_force(conf, params, box, idxs):
    """Closed-form (u, force) for periodic-torsion rows (see
    torsion_force_contribs), assembled by scatter-add."""
    n = conf.shape[0]
    mask = _pad_mask(idxs)
    u, contribs = torsion_force_contribs(conf, params, idxs)
    force3 = jnp.zeros((n, 3), conf.dtype)
    for role, c in enumerate(contribs):
        force3 = force3.at[jnp.where(mask, idxs[:, role], n)].add(c, mode="drop")
    if conf.shape[1] > 3:
        force3 = jnp.concatenate([force3, jnp.zeros((n, conf.shape[1] - 3), conf.dtype)], axis=1)
    return u, force3
