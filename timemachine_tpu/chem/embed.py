"""3D conformer embedding (native replacement for the slice of RDKit's
EmbedMolecule the framework needs: producing a physically-reasonable starting
geometry for minimization + MD; not a conformer ensemble generator).

Strategy: BFS placement with idealized bond lengths / hybridization angles,
then a staged force-field-free relaxation (bonds + angles + soft nonbonded
repulsion) under FIRE with force clipping. Callers typically follow with a
real forcefield minimization (md/minimizer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.chem.mol import Mol

# covalent radii (nm) for common elements
_COV_RADII = {1: 0.031, 5: 0.085, 6: 0.076, 7: 0.071, 8: 0.066, 9: 0.057, 14: 0.111,
              15: 0.107, 16: 0.105, 17: 0.102, 35: 0.120, 53: 0.139}


def _ideal_bond_length(mol: Mol, i: int, j: int) -> float:
    r = _COV_RADII.get(mol.atoms[i].atomic_num, 0.1) + _COV_RADII.get(mol.atoms[j].atomic_num, 0.1)
    b = mol.get_bond(i, j)
    if b is not None and b.order == 2:
        r *= 0.92
    elif b is not None and b.order == 3:
        r *= 0.86
    return r


def _ideal_angle(mol: Mol, j: int) -> float:
    """Idealized angle at center j from hybridization."""
    orders = [mol.bonds[bi].order for _, bi in mol._adjacency()[j]]
    deg = mol.total_connectivity(j)
    if 3 in orders or deg == 2 and 2 in orders and orders.count(2) >= 2:
        return np.pi
    if 2 in orders or 4 in orders or deg == 3 and mol.atoms[j].atomic_num == 6:
        return 2 * np.pi / 3
    return np.deg2rad(109.47)


def embed_mol(mol: Mol, seed: int = 2024, n_steps: int = 4000, max_tries: int = 6) -> Mol:
    """Assign 3D coordinates (nm, stored on mol.coords). Returns mol.

    Retries with fresh random placements until the relaxed geometry has no
    steric clash (nonbonded pairs closer than their contact floor, which
    would blow up a real-forcefield LJ term downstream — cage/fused-ring
    molecules can interlock under a single BFS placement); keeps the
    least-clashing attempt if none fully succeeds."""
    best = None  # (min margin over floor, coords)
    for attempt in range(max_tries):
        coords, min_margin = _embed_once(mol, seed + 7919 * attempt, n_steps)
        if best is None or min_margin > best[0]:
            best = (min_margin, coords)
        if min_margin >= 0.0:
            break
    mol.set_conf(best[1])
    return mol


def _contact_floor(anum_i: int, anum_j: int) -> float:
    """Minimum acceptable nonbonded separation (nm): below this, real LJ is
    catastrophically repulsive. H pairs may sit closer than heavy pairs."""
    n_h = (anum_i == 1) + (anum_j == 1)
    return (0.16, 0.19, 0.24)[2 - n_h]


def _embed_once(mol: Mol, seed: int, n_steps: int) -> tuple[np.ndarray, float]:
    rng = np.random.default_rng(seed)
    n = mol.num_atoms
    coords = np.zeros((n, 3))
    placed = np.zeros(n, dtype=bool)

    # BFS placement component by component
    for root in range(n):
        if placed[root]:
            continue
        coords[root] = rng.normal(0, 0.05, 3) + (placed.sum() * 0.5)
        placed[root] = True
        queue = [root]
        while queue:
            cur = queue.pop(0)
            for nb in mol.neighbors(cur):
                if placed[nb]:
                    continue
                direction = rng.normal(size=3)
                direction /= np.linalg.norm(direction)
                coords[nb] = coords[cur] + direction * _ideal_bond_length(mol, cur, nb)
                placed[nb] = True
                queue.append(nb)

    # build idealized terms
    bond_idxs = np.array([[b.src, b.dst] for b in mol.bonds], dtype=np.int32).reshape(-1, 2)
    bond_r0 = np.array([_ideal_bond_length(mol, i, j) for i, j in bond_idxs])
    angle_rows = []
    angle_t0 = []
    for j in range(n):
        nbs = mol.neighbors(j)
        for a in range(len(nbs)):
            for b in range(a + 1, len(nbs)):
                angle_rows.append((nbs[a], j, nbs[b]))
                angle_t0.append(_ideal_angle(mol, j))
    angle_idxs = np.array(angle_rows, dtype=np.int32).reshape(-1, 3)
    angle_t0 = np.array(angle_t0)

    # 1-2/1-3 exclusions for the soft repulsion
    excl = set()
    for i, j in bond_idxs:
        excl.add((min(i, j), max(i, j)))
    for a, j, b in angle_idxs:
        excl.add((min(a, b), max(a, b)))
    pair_rows = [(i, j) for i in range(n) for j in range(i + 1, n) if (i, j) not in excl]
    pairs = np.array(pair_rows, dtype=np.int32).reshape(-1, 2)
    anums = np.array([a.atomic_num for a in mol.atoms])
    pair_floor = (
        np.array([_contact_floor(anums[i], anums[j]) for i, j in pairs]) if len(pairs) else np.zeros(0)
    )

    from timemachine_tpu.ops.bonded import harmonic_bond, stable_angle

    def u_embed(x, k_rep):
        u = harmonic_bond(x, jnp.stack([jnp.full(len(bond_idxs), 1e5), jnp.asarray(bond_r0)], axis=1), None, bond_idxs)
        if len(angle_idxs):
            theta = stable_angle(x[angle_idxs[:, 0]], x[angle_idxs[:, 1]], x[angle_idxs[:, 2]], jnp.full(len(angle_idxs), 1e-4))
            u = u + jnp.sum(0.5 * 200.0 * (theta - angle_t0) ** 2)
        if len(pairs):
            d2 = jnp.sum((x[pairs[:, 0]] - x[pairs[:, 1]]) ** 2, axis=1)
            d = jnp.sqrt(jnp.maximum(d2, 1e-8))
            # half-harmonic floor at the per-pair contact distance: firm
            # enough that relaxed geometries can't hide LJ-fatal clashes
            viol = jnp.maximum(jnp.asarray(pair_floor) - d, 0.0)
            u = u + jnp.sum(0.5 * k_rep * viol**2)
        return u

    from timemachine_tpu.md.fire import FireMinimizationConfig, fire_minimize_jax

    def make_force(k_rep):
        grad_fn = jax.grad(lambda x: u_embed(x, k_rep))

        def force(x):
            g = grad_fn(x)
            g = jnp.where(jnp.isnan(g), 0.0, g)
            norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
            return -g * jnp.minimum(1.0, 1e4 / jnp.maximum(norm, 1e-12))

        return force

    # stage 1: gentle repulsion lets ring topology settle without tearing
    # bonds; stage 2: firm floor expels residual interlocks
    x = fire_minimize_jax(jnp.asarray(coords), make_force(2e2), FireMinimizationConfig(n_steps // 2, dt_max=2e-3))
    x = fire_minimize_jax(x, make_force(2e4), FireMinimizationConfig(n_steps, dt_max=2e-3))

    x = np.asarray(x)
    if len(pairs):
        d = np.linalg.norm(x[pairs[:, 0]] - x[pairs[:, 1]], axis=1)
        min_margin = float(np.min(d - pair_floor))
    else:
        min_margin = np.inf
    return x, min_margin
