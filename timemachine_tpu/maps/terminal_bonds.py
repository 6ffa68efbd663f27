"""Invertible terminal-bond-length maps for targeted FEP.

Capability target: reference `timemachine/maps/terminal_bonds.py`. When two
alchemical states differ only in terminal HarmonicBond parameters, samples
can be transported between them by rescaling each terminal bond length from
the source state's thermal window onto the destination's, sharpening mapped
estimators (Jarzynski 2002; Paliwal & Shirts 2013).

TPU-first redesign vs the reference:

- The log|det J| of the radial map r ↦ f(r) applied to the terminal atom
  about its (fixed) anchor is analytic — log f'(r) + 2 log(f(r)/r) in 3D —
  so no 6×6 numerical `jax.jacobian` + slogdet per (frame, bond).
- Terminal atoms are distinct across terminal bonds and anchors never move,
  so all bond maps commute; they are applied in ONE vectorized pass
  (gather both endpoints for all bonds, rescale, scatter the terminal
  atoms), vmapped over the trajectory — not a Python loop over bonds.
- Graph degrees come from `np.bincount` on the bond list, not networkx.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax import numpy as jnp

from timemachine_tpu.constants import BOLTZ, DEFAULT_TEMP

# Gaussian support window half-width, in thermal standard deviations
DEFAULT_SIGMA_THRESH = 20


def thermal_length_window(force_constant, eq_length, temperature, sigma_thresh=DEFAULT_SIGMA_THRESH):
    """(lower, upper) support window of a harmonic bond's length at T:
    r0 ± thresh·sqrt(kT/k). Vectorized over bonds."""
    sig = np.sqrt(BOLTZ * temperature / np.asarray(force_constant))
    lo = np.asarray(eq_length) - sigma_thresh * sig
    hi = np.asarray(eq_length) + sigma_thresh * sig
    if np.any(lo <= 0):
        raise ValueError("thermal window extends to non-positive bond lengths; reduce sigma_thresh")
    return lo, hi


def find_terminal_bonds(bond_idxs) -> np.ndarray:
    """(anchor, terminal) pairs for every bond whose second atom has graph
    degree 1, sorted canonically. Degree via bincount over the edge list."""
    bond_idxs = np.asarray(bond_idxs, dtype=int)
    degree = np.bincount(bond_idxs.reshape(-1))
    out = []
    for i, j in bond_idxs:
        # orient (higher-degree anchor, degree-1 terminal); ties keep (i, j)
        anchor, term = (i, j) if degree[i] >= degree[j] else (j, i)
        if degree[term] == 1:
            out.append((int(anchor), int(term)))
    return np.array(sorted(out)).reshape(-1, 2)


def _rescale_lengths(r, src_lo, src_hi, dst_lo, dst_hi):
    """Affine window-to-window length map + analytic radial log|det J|.

    Returns (r_new, per-bond logdetjac); NaN outside the source window."""
    slope = (dst_hi - dst_lo) / (src_hi - src_lo)
    r_new = dst_lo + (r - src_lo) * slope
    inside = (r >= src_lo) & (r <= src_hi)
    r_new = jnp.where(inside, r_new, jnp.nan)
    # 3D radial map about a fixed center: |det J| = f'(r) · (f(r)/r)^2
    logdetjac = jnp.log(slope) + 2.0 * (jnp.log(r_new) - jnp.log(r))
    return r_new, logdetjac


@dataclass(frozen=True)
class TerminalMappableState:
    """Terminal-bond geometry of one state: bond index pairs (anchor,
    terminal) and their thermal length windows."""

    idxs: np.ndarray  # (B, 2) int, columns (anchor, terminal)
    window_lo: np.ndarray  # (B,)
    window_hi: np.ndarray  # (B,)

    @classmethod
    def from_harmonic_bond_params(
        cls, bond_idxs, params, temperature=DEFAULT_TEMP, sigma_thresh=DEFAULT_SIGMA_THRESH
    ) -> "TerminalMappableState":
        by_bond = {frozenset(map(int, b)): np.asarray(p) for b, p in zip(bond_idxs, params)}
        terminal = find_terminal_bonds(bond_idxs)
        ks = np.array([by_bond[frozenset(b)][0] for b in terminal])
        r0s = np.array([by_bond[frozenset(b)][1] for b in terminal])
        lo, hi = thermal_length_window(ks, r0s, temperature, sigma_thresh)
        return cls(terminal, lo, hi)

    def window_of(self, bond) -> tuple[float, float]:
        for (a, t), lo, hi in zip(self.idxs, self.window_lo, self.window_hi):
            if (a, t) == tuple(bond):
                return float(lo), float(hi)
        raise KeyError(bond)

    def contains_in_support(self, x) -> bool:
        d = np.asarray(x)[self.idxs[:, 1]] - np.asarray(x)[self.idxs[:, 0]]
        r = np.linalg.norm(d, axis=-1)
        return bool(np.all((r >= self.window_lo) & (r <= self.window_hi)))


@dataclass(frozen=True)
class TerminalBondMap:
    """Invertible map transporting conformers between two states' terminal
    bond windows. Callable on a trajectory: xs -> (xs', logdetjacs)."""

    idxs: np.ndarray  # (B, 2) (anchor, terminal) for bonds whose windows differ
    src_lo: np.ndarray
    src_hi: np.ndarray
    dst_lo: np.ndarray
    dst_hi: np.ndarray

    @classmethod
    def from_states(cls, src: TerminalMappableState, dst: TerminalMappableState) -> "TerminalBondMap":
        shared = sorted(set(map(tuple, src.idxs.tolist())) & set(map(tuple, dst.idxs.tolist())))
        rows = []
        for bond in shared:
            s_lo, s_hi = src.window_of(bond)
            d_lo, d_hi = dst.window_of(bond)
            if (s_lo, s_hi) != (d_lo, d_hi):
                rows.append((bond, s_lo, s_hi, d_lo, d_hi))
        if rows:
            bonds, s_lo, s_hi, d_lo, d_hi = zip(*rows)
        else:
            bonds, s_lo, s_hi, d_lo, d_hi = (), (), (), (), ()
        return cls(
            np.array(bonds, dtype=int).reshape(-1, 2),
            np.array(s_lo),
            np.array(s_hi),
            np.array(d_lo),
            np.array(d_hi),
        )

    def __call__(self, xs):
        xs = jnp.asarray(xs)
        if len(self.idxs) == 0:
            return xs, jnp.zeros(xs.shape[0], dtype=xs.dtype)

        anchors = jnp.asarray(self.idxs[:, 0])
        terminals = jnp.asarray(self.idxs[:, 1])
        s_lo, s_hi = jnp.asarray(self.src_lo), jnp.asarray(self.src_hi)
        d_lo, d_hi = jnp.asarray(self.dst_lo), jnp.asarray(self.dst_hi)

        def map_frame(x):
            vec = x[terminals] - x[anchors]  # (B, 3)
            r = jnp.linalg.norm(vec, axis=-1)
            r_new, ldj = _rescale_lengths(r, s_lo, s_hi, d_lo, d_hi)
            moved = x[anchors] + vec * (r_new / r)[:, None]
            return x.at[terminals].set(moved), jnp.sum(ldj)

        return jax.jit(jax.vmap(map_frame))(xs)
