"""Scatter-free force assembly for irregular term lists.

XLA:TPU scatter-add serializes read-modify-writes at ~9 ns/update (measured,
ARCHITECTURE.md "measured XLA/TPU primitive costs"); the solvated-DHFR
protein tail carries ~90k bonded/exclusion force-contribution updates per MD
step — ~0.8 ms of pure scatter. This module replaces every scatter with ONE
statically-planned, gather-only pipeline (the reference has no analog: CUDA
scatters through atomicAdd, which is cheap there; on TPU the idiomatic form
is a static permutation + prefix-scan):

1. each term type produces per-role force-contribution vectors in canonical
   term order (pure vector math, no data movement);
2. a host-side plan sorts contribution SLOTS by receiving atom — a static
   permutation applied with one gather;
3. per-atom sums are prefix-sum differences at static atom boundaries
   (one cumulative sum + two row gathers), yielding the (N, 3) force array
   directly — no scatter anywhere.

Precision: boundary differences of an f32 running sum carry rounding from
the prefix magnitude (~1e-4 relative worst case at DHFR scale — comparable
to the f32 pair-sweep kernel itself); under x64 (CPU test suite) the same
code runs in f64 and matches autodiff to reference tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ContribPlan:
    """Static assembly plan over a fixed set of term-index groups.

    Flat contribution index space: groups are laid out in order, each group
    role-major — contribution of term t, role r in group g lives at
    offset_g + r * T_g + t. Contributions of padding terms (-1 index rows)
    are sorted to a trailing sentinel segment (their values are zero by the
    term-math masking contract, so where they land is immaterial; keeping
    them out of real segments documents intent).
    """

    perm: np.ndarray  # (L,) int32: atom-major position -> flat contribution index
    starts: np.ndarray  # (n_atoms + 1,) int32 boundaries into atom-major order
    n_atoms: int
    group_shapes: tuple  # ((T_g, arity_g), ...) for layout validation


def build_contrib_plan(groups, n_atoms: int) -> ContribPlan:
    """groups: list of int32 index arrays (T_g, arity_g); rows with any -1
    are padding. Host-side (numpy) — call once at trace/build time."""
    atoms = []
    offset = 0
    shapes = []
    for idxs in groups:
        idxs = np.asarray(idxs)
        t_g, arity = idxs.shape
        shapes.append((int(t_g), int(arity)))
        pad = np.any(idxs < 0, axis=1)
        for r in range(arity):
            a = idxs[:, r].astype(np.int64)
            a = np.where(pad, n_atoms, a)  # sentinel: past the last atom
            atoms.append(a)
        offset += t_g * arity
    if atoms:
        atom_of = np.concatenate(atoms)
    else:
        atom_of = np.zeros((0,), np.int64)
    perm = np.argsort(atom_of, kind="stable").astype(np.int32)
    sorted_atoms = atom_of[perm]
    starts = np.searchsorted(sorted_atoms, np.arange(n_atoms + 1)).astype(np.int32)
    return ContribPlan(perm=perm, starts=starts, n_atoms=n_atoms, group_shapes=tuple(shapes))


def assemble_forces(plan: ContribPlan, contribs):
    """contribs: list over groups of lists over roles of (T_g, 3) arrays
    (role order matching the plan's groups). Returns the (n_atoms, 3) summed
    force. Padding-term contributions MUST already be zero (masked by the
    term math)."""
    flat = [c for group in contribs for c in group]
    if not flat:
        raise ValueError("assemble_forces called with no contributions")
    c = jnp.concatenate(flat, axis=0)
    assert c.shape[0] == plan.perm.shape[0], (c.shape, plan.perm.shape)
    c_sorted = c[plan.perm]
    cs = jnp.concatenate([jnp.zeros((1, c.shape[1]), c.dtype), jnp.cumsum(c_sorted, axis=0)], axis=0)
    return cs[plan.starts[1:]] - cs[plan.starts[:-1]]
