"""Invertible maps between terminal-bond length distributions.

Parity target: reference `timemachine/maps/terminal_bonds.py` — interval
model of harmonic-bond supports (:28-57), per-bond conformer map with
log-det-Jacobian (:60-135), terminal-bond discovery (:138-150),
TerminalMappableState / TerminalBondMap (:153-273).

Used to boost precision of mapped estimators (targeted FEP, Jarzynski 2002)
between states that differ in terminal HarmonicBond parameters. Pure JAX;
`TerminalBondMap.__call__` is vmapped over trajectories.
"""

from __future__ import annotations

from dataclasses import dataclass

import networkx as nx
import numpy as np
from jax import jacobian, jit, vmap
from jax import numpy as jnp

from timemachine_tpu.constants import BOLTZ, DEFAULT_TEMP

# support(Gaussian(mu, sig)) ~= interval(mu - k sig, mu + k sig)
DEFAULT_SIGMA_THRESH = 20


@dataclass
class Interval:
    lower: float
    upper: float

    @property
    def width(self) -> float:
        return self.upper - self.lower

    def __post_init__(self):
        assert self.width > 0
        assert self.lower > 0


@dataclass
class Gaussian:
    mean: float
    stddev: float

    def to_interval(self, sigma_thresh=DEFAULT_SIGMA_THRESH) -> Interval:
        r = self.stddev * sigma_thresh
        return Interval(self.mean - r, self.mean + r)

    @classmethod
    def from_harmonic_bond(cls, force_constant, eq_length, temperature=DEFAULT_TEMP):
        return cls(eq_length, np.sqrt(BOLTZ * temperature / force_constant))


@jit
def interval_map(x, src_lb, src_ub, dst_lb, dst_ub):
    """Affine map Interval[src] -> Interval[dst]; NaN outside support
    (ref terminal_bonds.py:60-69)."""
    scale_factor = (dst_ub - dst_lb) / (src_ub - src_lb)
    in_support = (x >= src_lb) & (x <= src_ub)
    return jnp.where(in_support, dst_lb + (x - src_lb) * scale_factor, np.nan)


def conf_map(x, bond, param):
    """Map one bond's length in conformer x; returns (x', logdetjac)
    (ref terminal_bonds.py:72-122)."""
    a, b = bond
    dim = 3

    def apply_map_to_atom_pair(xy, param):
        xa, y = xy[:dim], xy[dim:]
        src_lb, src_ub, dst_lb, dst_ub = param
        r = jnp.linalg.norm(xa - y)
        new_r = interval_map(r, src_lb, src_ub, dst_lb, dst_ub)
        vec = (y - xa) / jnp.linalg.norm(y - xa)
        y_prime = xa + new_r * vec
        return jnp.hstack([xa, y_prime])

    def map_and_logdetjac(xa, y, param):
        xy = jnp.hstack([xa, y])
        xy_prime = apply_map_to_atom_pair(xy, param)
        y_prime = xy_prime[dim:]
        jac = jacobian(apply_map_to_atom_pair)(xy, param)
        sign, logdet = jnp.linalg.slogdet(jac)
        # a negative determinant would mean a non-orientation-preserving map
        logdetjac = jnp.where(sign == 1, logdet, jnp.nan)
        return y_prime, logdetjac

    x_b_mapped, logdetjac = map_and_logdetjac(x[a], x[b], param)
    return x.at[b].set(x_b_mapped), logdetjac


apply_conf_map_to_traj = jit(vmap(conf_map, in_axes=(0, None, None)))


def apply_conf_maps_to_traj(xs, bond_idxs, params):
    """Apply several bond maps to a trajectory; accumulates logdetjacs
    (ref terminal_bonds.py:125-140)."""
    xs_shape = xs.shape
    xs = jnp.array(xs)
    logdetjacs = np.zeros(len(xs))
    for bond, param in zip(bond_idxs, params):
        xs, increments = apply_conf_map_to_traj(xs, bond, param)
        logdetjacs += increments
    assert xs.shape == xs_shape
    assert logdetjacs.shape == (len(xs),)
    return xs, logdetjacs


def get_degrees(bond_idxs):
    g = nx.Graph()
    g.add_edges_from(map(tuple, bond_idxs))
    return np.array([g.degree(i) for i in range(g.number_of_nodes())])


def get_terminal_bonds(bond_idxs) -> list:
    """Bonded pairs (anchor, terminal) where terminal has degree 1
    (ref terminal_bonds.py:143-150)."""
    degrees = get_degrees(bond_idxs)
    bonds = [tuple(sorted(bond, key=lambda i: degrees[i], reverse=True)) for bond in map(tuple, bond_idxs)]
    return sorted(b for b in bonds if degrees[b[1]] == 1)


class TerminalMappableState:
    """(ref terminal_bonds.py:153-216)"""

    def __init__(self, terminal_bond_idxs, ks, eq_lengths, temperature=DEFAULT_TEMP, sigma_thresh=DEFAULT_SIGMA_THRESH):
        B = len(terminal_bond_idxs)
        assert (len(ks) == B) and (len(eq_lengths) == B)
        self.idxs = terminal_bond_idxs
        self.ks = ks
        self.eq_lengths = eq_lengths
        self.temperature = temperature
        self.sigma_thresh = sigma_thresh
        self.gaussians = [Gaussian.from_harmonic_bond(k, r0, temperature) for k, r0 in zip(ks, eq_lengths)]
        self.intervals = [g.to_interval(sigma_thresh) for g in self.gaussians]

    def contains_in_support(self, x) -> bool:
        bond_valid = []
        for i in range(len(self.idxs)):
            a, b = self.idxs[i]
            r = jnp.linalg.norm(x[a] - x[b])
            interval = self.intervals[i]
            bond_valid.append((r <= interval.upper) * (r >= interval.lower))
        return jnp.array(bond_valid).all().item()

    @classmethod
    def from_harmonic_bond_params(cls, bond_idxs, params, temperature=DEFAULT_TEMP, sigma_thresh=DEFAULT_SIGMA_THRESH):
        param_dict = dict(zip(map(tuple, map(tuple, bond_idxs)), params))
        terminal_bond_tuples = get_terminal_bonds(bond_idxs)
        ks, eq_lengths = np.array([param_dict[tuple(sorted(bond))] for bond in terminal_bond_tuples]).T
        return cls(np.array(terminal_bond_tuples), ks, eq_lengths, temperature=temperature, sigma_thresh=sigma_thresh)


def states_to_conf_map_params(src: TerminalMappableState, dst: TerminalMappableState):
    """Shared terminal bonds whose length distributions differ, with map
    params (src_lb, src_ub, dst_lb, dst_ub) (ref terminal_bonds.py:219-258)."""
    src_bonds = set(tuple(b) for b in src.idxs)
    dst_bonds = set(tuple(b) for b in dst.idxs)
    bonds_in_common = src_bonds.intersection(dst_bonds)

    mapped_bond_list, params_list = [], []
    for a, b in bonds_in_common:
        src_interval = next(iv for (idx, iv) in zip(src.idxs, src.intervals) if tuple(idx) == (a, b))
        dst_interval = next(iv for (idx, iv) in zip(dst.idxs, dst.intervals) if tuple(idx) == (a, b))
        if src_interval != dst_interval:
            mapped_bond_list.append((a, b))
            params_list.append((src_interval.lower, src_interval.upper, dst_interval.lower, dst_interval.upper))

    return np.array(sorted(mapped_bond_list)), np.array(
        [p for _, p in sorted(zip(mapped_bond_list, params_list))]
    )


@dataclass
class TerminalBondMap:
    """(ref terminal_bonds.py:261-273)"""

    mapped_bond_idxs: np.ndarray
    map_params: np.ndarray

    @classmethod
    def from_states(cls, src: TerminalMappableState, dst: TerminalMappableState):
        bond_idxs, params = states_to_conf_map_params(src, dst)
        return cls(bond_idxs, params)

    def __call__(self, xs):
        return apply_conf_maps_to_traj(xs, self.mapped_bond_idxs, self.map_params)
