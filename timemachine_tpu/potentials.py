"""Potential descriptors: the single source of truth for a system's topology
and energy model.

Parity target: reference `timemachine/potentials/potentials.py` +
`potential.py` (the L2 abstraction). Differences by design (TPU-first):

* single track — `__call__(conf, params, box)` IS the accelerated path (XLA
  compiles it); there is no `.to_gpu()` and no custom-op bridge. Gradients
  (du/dx, du/dp) come from `jax.grad`, which is exact — preserving the
  reference's differentiable-forcefield contract (ref jax_interface.py:12-66)
  without hand-written JVP kernels.
* descriptors hash by identity and are treated as static data under jit;
  `BoundPotential` is a pytree whose only leaf is `params`, so bound
  potentials flow through `lax.scan`/`vmap`/`grad` directly.
* `Nonbonded`/`NonbondedAllPairs` accept an `impl` switch: "dense" (N² — fine
  on the MXU for small systems) or "tiled" (neighborlisted O(N),
  ops/neighborlist.py) chosen by the MD context for large N.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from typing import NamedTuple, Optional, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.ops import bonded, chiral, nonbonded

_P = TypeVar("_P", bound="Potential")


class SortedNBInfo(NamedTuple):
    """Sorted-state MD protocol handed to md/context.py's sorted fast path
    (see ops/pallas/rowscan_kernel.SortedSweepProtocol). `sweep(state, x_s,
    box)` evaluates the nonbonded kernel on pad_order-space coords;
    `canonical_force(conf, params, box)`, when not None, is the potential's
    canonical-space force correction (water-exclusion grad) the Context
    adds before its single canonical→sorted gather."""

    sweep: object
    pad_order: object
    inv: object
    rebuild_interval: int
    canonical_force: object

Conf = jax.Array
Params = jax.Array
Box = Optional[jax.Array]


@dataclass(eq=False)
class Potential:
    """Base descriptor. Subclasses hold static topology (numpy index arrays)
    and implement `__call__(conf, params, box) -> scalar energy` in pure JAX.

    eq=False: descriptors hash/compare by identity so they can serve as
    static (aux) data in pytrees and jit closures despite holding numpy
    arrays.
    """

    def __call__(self, conf: Conf, params: Params, box: Box) -> jax.Array:
        raise NotImplementedError

    def bind(self: _P, params) -> "BoundPotential[_P]":
        return BoundPotential(self, jnp.asarray(params))


class BoundPotential:
    """(potential, params) pair; a pytree with params as its only leaf."""

    __slots__ = ("potential", "params")

    def __init__(self, potential: Potential, params):
        self.potential = potential
        self.params = params

    def __call__(self, conf: Conf, box: Box) -> jax.Array:
        return self.potential(conf, self.params, box)

    def __repr__(self):
        return f"BoundPotential({type(self.potential).__name__}, params.shape={np.shape(self.params)})"


jax.tree_util.register_pytree_node(
    BoundPotential,
    lambda bp: ((bp.params,), bp.potential),
    lambda pot, children: BoundPotential(pot, children[0]),
)


@dataclass(eq=False)
class HarmonicBond(Potential):
    idxs: np.ndarray  # (B, 2) int32

    # bond-graph-local term: exactly invariant under the barostat's rigid
    # per-molecule displacements, so volume moves skip it (md/context.py)
    rigid_group_invariant = True

    def __call__(self, conf, params, box):
        return bonded.harmonic_bond(conf, params, box, self.idxs)

    def energy_force_fn(self):
        """Fused analytic (u, force): strided fast path for leading waters,
        closed-form gather/scatter for all remaining rows (no autodiff
        adjoint anywhere; ref k_harmonic_bond.cuh computes forces in the
        forward pass the same way)."""
        idxs = np.asarray(self.idxs)
        if idxs.shape[0] == 0:
            return None
        nw = bonded._leading_water_bonds(idxs)
        rest_idxs = idxs[2 * nw :]

        def ef(conf, params, box):
            if nw:
                u, force = bonded.water_bond_energy_force(conf, params[: 2 * nw], nw)
            else:
                u, force = 0.0, jnp.zeros_like(conf)
            if len(rest_idxs):
                u_rest, f_rest = bonded.generic_bond_energy_force(conf, params[2 * nw :], box, rest_idxs)
                u = u + u_rest
                force = force + f_rest
            return u, force

        return ef

    def force_contribs(self):
        """Scatter-free step protocol (md/context.py unified assembly):
        (groups, fn) where fn(conf, params, box) -> (per-group per-role force
        contributions, extra (N,3) force | None). The leading-water strided
        block stays a dense reshape-assembled force (already scatter-free);
        only the irregular tail goes through the contribution plan."""
        idxs = np.asarray(self.idxs)
        if idxs.shape[0] == 0:
            return None
        nw = bonded._leading_water_bonds(idxs)
        rest_idxs = idxs[2 * nw :]
        if rest_idxs.shape[0] == 0:
            return None  # pure-water term: the fused path is already scatter-free

        def fn(conf, params, box):
            extra = None
            if nw:
                _, extra = bonded.water_bond_energy_force(conf, params[: 2 * nw], nw)
            _, cs = bonded.bond_force_contribs(conf, params[2 * nw :], rest_idxs)
            return [cs], extra

        return [rest_idxs], fn


@dataclass(eq=False)
class HarmonicAngle(Potential):
    idxs: np.ndarray  # (A, 3) int32

    # bond-graph-local term: exactly invariant under the barostat's rigid
    # per-molecule displacements, so volume moves skip it (md/context.py)
    rigid_group_invariant = True

    def __call__(self, conf, params, box):
        return bonded.harmonic_angle(conf, params, box, self.idxs)

    def energy_force_fn(self):
        """Fused analytic (u, force): strided fast path for the leading-water
        H-O-H rows (valid because water rows carry eps == 0 — builders.py:127
        and the OpenMM deserializer both emit 0.0), eps-aware closed-form
        gather/scatter for all remaining rows (generic_angle_energy_force
        handles the `stable_angle` eps stabilizer analytically)."""
        idxs = np.asarray(self.idxs)
        if idxs.shape[0] == 0:
            return None
        nw = bonded._leading_water_angles(idxs)
        rest_idxs = idxs[nw:]

        def ef(conf, params, box):
            if nw:
                u, force = bonded.water_angle_energy_force(conf, params[:nw], nw)
            else:
                u, force = 0.0, jnp.zeros_like(conf)
            if len(rest_idxs):
                u_rest, f_rest = bonded.generic_angle_energy_force(conf, params[nw:], box, rest_idxs)
                u = u + u_rest
                force = force + f_rest
            return u, force

        return ef

    def force_contribs(self):
        """Scatter-free step protocol — see HarmonicBond.force_contribs."""
        idxs = np.asarray(self.idxs)
        if idxs.shape[0] == 0:
            return None
        nw = bonded._leading_water_angles(idxs)
        rest_idxs = idxs[nw:]
        if rest_idxs.shape[0] == 0:
            return None

        def fn(conf, params, box):
            extra = None
            if nw:
                _, extra = bonded.water_angle_energy_force(conf, params[:nw], nw)
            _, cs = bonded.angle_force_contribs(conf, params[nw:], rest_idxs)
            return [cs], extra

        return [rest_idxs], fn


@dataclass(eq=False)
class PeriodicTorsion(Potential):
    idxs: np.ndarray  # (T, 4) int32

    # bond-graph-local term: exactly invariant under the barostat's rigid
    # per-molecule displacements, so volume moves skip it (md/context.py)
    rigid_group_invariant = True

    def __call__(self, conf, params, box):
        return bonded.periodic_torsion(conf, params, box, self.idxs)

    def energy_force_fn(self):
        """Fused analytic (u, force) via the Blondel-Karplus dihedral
        gradient (ops/bonded.py torsion_energy_force) — skips the autodiff
        adjoint AND is NaN-free on padded (-1) rows, where autodiff's
        `where`-mask leaks atan2(0, 0) gradients."""
        idxs = np.asarray(self.idxs)
        if idxs.shape[0] == 0:
            return None

        def ef(conf, params, box):
            return bonded.torsion_energy_force(conf, params, box, idxs)

        return ef

    def force_contribs(self):
        """Scatter-free step protocol — see HarmonicBond.force_contribs."""
        idxs = np.asarray(self.idxs)
        if idxs.shape[0] == 0:
            return None

        def fn(conf, params, box):
            _, cs = bonded.torsion_force_contribs(conf, params, idxs)
            return [cs], None

        return [idxs], fn


@dataclass(eq=False)
class CentroidRestraint(Potential):
    group_a_idxs: np.ndarray
    group_b_idxs: np.ndarray
    kb: float
    b0: float

    def __call__(self, conf, params, box):
        return bonded.centroid_restraint(conf, params, box, self.group_a_idxs, self.group_b_idxs, self.kb, self.b0)


@dataclass(eq=False)
class ChiralAtomRestraint(Potential):
    idxs: np.ndarray  # (C, 4) int32

    # bond-graph-local term: exactly invariant under the barostat's rigid
    # per-molecule displacements, so volume moves skip it (md/context.py)
    rigid_group_invariant = True

    def __call__(self, conf, params, box):
        return chiral.chiral_atom_restraint(conf, params, box, self.idxs)


@dataclass(eq=False)
class ChiralBondRestraint(Potential):
    idxs: np.ndarray  # (C, 4) int32
    signs: np.ndarray  # (C,) ±1

    def __call__(self, conf, params, box):
        return chiral.chiral_bond_restraint(conf, params, box, self.idxs, self.signs)


@dataclass(eq=False)
class FlatBottomBond(Potential):
    idxs: np.ndarray  # (B, 2) int32

    def __call__(self, conf, params, box):
        return bonded.flat_bottom_bond(conf, params, box, self.idxs)


@dataclass(eq=False)
class LogFlatBottomBond(Potential):
    idxs: np.ndarray  # (B, 2) int32
    beta: float

    def __call__(self, conf, params, box):
        return bonded.log_flat_bottom_bond(conf, params, box, self.idxs, self.beta)


def _dense_masks(num_atoms, exclusion_idxs, scale_factors):
    """(N, N) exclusion rescale masks, built IN-JIT from the exclusion list.

    Host-side numpy masks would be embedded in the jitted program as O(N²)
    literal constants — at protein-host sizes that serializes gigabytes into
    the executable (and overflows remote-compile transports). The traced
    scatter form keeps the program body O(E)."""
    if len(exclusion_idxs) == 0:
        ones = jnp.ones((num_atoms, num_atoms))
        return ones, ones
    idxs = np.asarray(exclusion_idxs, dtype=np.int32)
    scales = np.asarray(scale_factors, dtype=np.float64).reshape(-1, 2)
    i, j = idxs[:, 0], idxs[:, 1]
    q_mask = jnp.ones((num_atoms, num_atoms)).at[i, j].set(1.0 - scales[:, 0]).at[j, i].set(1.0 - scales[:, 0])
    lj_mask = jnp.ones((num_atoms, num_atoms)).at[i, j].set(1.0 - scales[:, 1]).at[j, i].set(1.0 - scales[:, 1])
    return q_mask, lj_mask


@dataclass(eq=False)
class NonbondedAllPairs(Potential):
    """All-pairs LJ + reaction-field Coulomb in 4D, no exclusions.

    impl: "dense" = N² (MXU-friendly for small N); "tiled" = neighborlisted
    O(N) path (ref CUDA analog: nonbonded_all_pairs.cu + k_nonbonded.cuh;
    here ops/neighborlist.py).
    atom_idxs: optional static subset of interacting atoms (ref
    nonbonded_all_pairs.hpp:27).
    """

    num_atoms: int
    beta: float
    cutoff: float
    atom_idxs: Optional[np.ndarray] = None
    impl: str = "dense"
    nblist_padding: float = 0.2
    tiled_grid_dims: Optional[tuple] = None
    tiled_capacity: Optional[int] = None

    # execution-config fields: select a kernel, not physics. Consumed by
    # fe.free_energy.assert_potentials_compatible, which exempts exactly
    # these names on exactly this class from state-compatibility checks.
    _EXEC_CONFIG_FIELDS = frozenset({"impl", "tiled_grid_dims", "tiled_capacity"})

    def __post_init__(self):
        self._atom_mask = None
        if self.atom_idxs is not None:
            m = np.zeros((self.num_atoms,), dtype=np.float64)
            m[np.asarray(self.atom_idxs)] = 1.0
            self._atom_mask = m

    def configure_tiled(self, box, conf=None):
        """Fix the static cell grid from a concrete box (call before jit).
        Pass a representative conf to size capacity from actual occupancy."""
        from timemachine_tpu.ops.neighborlist import choose_capacity, choose_grid

        self.tiled_grid_dims = choose_grid(np.diagonal(np.asarray(box)), self.cutoff)
        self.tiled_capacity = choose_capacity(self.num_atoms, self.tiled_grid_dims, conf=conf, box=box)
        return self

    def configure_pallas(self, box, conf, margin: float = 1.4, interpret: bool = False, cb: int = 2,
                         kernel: str = "rowscan", quad_has_w: bool = True, rowscan_has_w: bool = True):
        """Switch to the fused Pallas tile kernel (the production TPU MD
        path), sizing the static tile budget from the actual geometry.

        kernel="rowscan" (default): v2 Newton-triangular row-chunk kernel
        (ops/pallas/rowscan_kernel.py); electrostatics evaluated as a
        Chebyshev series of the switched erfc (force = exact gradient of the
        polynomial energy; pair the exclusion correction with
        `es_h_coeffs()` so it cancels exactly).
        kernel="gather": v3 atom-granularity compacted full neighbor lists
        + dense sweep (ops/pallas/gather_kernel.py). 2.8x fewer pair slots
        than v2 and a scatter-free interval-based neighbor build, but the
        per-step XLA column gather costs ~2.6 ns/INDEX on v5e (~6.5 ms at
        23k atoms) regardless of row width, which makes it slower end-to-end
        than v2 on current hardware. Kept as the reference implementation of
        atom-exact compaction (and for hardware where gather is vectorized).
        kernel="v1": original (128 x 128*cb)-tile kernel with exact
        transcendental electrostatics (kept for strict-parity paths).
        kernel="dot": rowscan energy/analysis paths + the dotscan MD hot-loop
        provider (ops/pallas/dotscan_kernel.py) — dot-identity distances and
        matmul force accumulation on the MXU; gated on the row-center image
        bound (falls back to rowscan on small boxes)."""
        from timemachine_tpu.ops.pallas.nonbonded_kernel import (
            make_nonbonded_pallas,
            make_nonbonded_pallas_energy_force,
            make_nonbonded_pallas_md,
            suggest_max_tiles,
        )

        mask = self._atom_mask  # static subset supported via invalid rows/cols

        self.impl = "pallas"
        skin = 0.1
        dot_sort = None
        if kernel == "dot":
            # dot = rowscan energy/analysis paths + the dotscan MD hot-loop
            # provider (MXU dot-identity distances + matmul force
            # accumulation, ops/pallas/dotscan_kernel.py); requires the
            # periodic row-center image bound (row half-extent + cutoff <
            # box/2). Prefer the snake sort (12-17% tighter tile census);
            # fall back to Hilbert rows (compact chunks at any density),
            # then to rowscan wholesale.
            from timemachine_tpu.ops.pallas.dotscan_kernel import dotscan_valid

            for cand in ("snake", "hilbert"):
                if dotscan_valid(np.asarray(conf), np.asarray(box), self.cutoff + skin, sort=cand):
                    dot_sort = cand
                    break
            if dot_sort is None:
                kernel = "rowscan"
        if kernel == "quad":
            # quad = rowscan energy/analysis paths + the quadscan MD hot-loop
            # provider (32-granularity packed tiles, per-entry image shifts);
            # requires the constant-shift box invariant and no atom subset —
            # otherwise fall back to rowscan wholesale
            from timemachine_tpu.ops.pallas.quadscan_kernel import constant_shift_valid

            if mask is not None or not constant_shift_valid(
                np.asarray(conf), np.asarray(box), self.cutoff + skin
            ):
                kernel = "rowscan"
        self.pallas_kernel = kernel
        if kernel == "gather":
            from timemachine_tpu.ops.pallas.gather_kernel import (
                make_nonbonded_gather,
                make_nonbonded_gather_energy_force,
                make_nonbonded_gather_md,
                suggest_max_nbrs,
            )
            from timemachine_tpu.ops.pallas.rowscan_kernel import es_energy_force_series

            self._es_series = es_energy_force_series(self.beta, self.cutoff)
            max_nbrs = suggest_max_nbrs(np.asarray(conf), np.asarray(box), self.cutoff, margin=margin, atom_mask=mask)
            # du/dp backward still runs on the v1 dp-only pass
            dp_tiles = suggest_max_tiles(
                np.asarray(conf), np.asarray(box), self.cutoff, margin=margin, cb=cb, atom_mask=mask
            )
            self.pallas_max_tiles = max_nbrs
            self._pallas_energy = make_nonbonded_gather(
                self.beta, self.cutoff, max_nbrs, interpret=interpret, atom_mask=mask,
                dp_max_tiles=dp_tiles, dp_cb=cb,
            )
            self._pallas_energy_force = make_nonbonded_gather_energy_force(
                self.beta, self.cutoff, max_nbrs, interpret=interpret, atom_mask=mask
            )
            md_nbrs = suggest_max_nbrs(
                np.asarray(conf), np.asarray(box), self.cutoff + skin, margin=margin, atom_mask=mask
            )
            self._pallas_md = make_nonbonded_gather_md(
                self.beta, self.cutoff, md_nbrs, skin=skin, rebuild_interval=20, interpret=interpret,
                atom_mask=mask,
            )
            return self
        if kernel in ("rowscan", "quad", "dot"):
            # rowscan, quad and dot share the rowscan ENERGY/analysis wiring
            # (polynomial ES so exclusion corrections cancel exactly; du/dp
            # backward on the v1 dp-only pass) and differ only in the MD
            # hot-loop provider below. quad reaches here only with mask=None
            # (masked systems fall back to rowscan above).
            from timemachine_tpu.ops.pallas.rowscan_kernel import (
                es_energy_force_series,
                make_nonbonded_rowscan,
                make_nonbonded_rowscan_energy_force,
                make_nonbonded_rowscan_md,
                suggest_cell_size,
                suggest_max_pairs,
            )

            self._es_series = es_energy_force_series(self.beta, self.cutoff)
            max_pairs = suggest_max_pairs(
                np.asarray(conf), np.asarray(box), self.cutoff, margin=margin, atom_mask=mask, triangular=True
            )
            dp_tiles = suggest_max_tiles(
                np.asarray(conf), np.asarray(box), self.cutoff, margin=margin, cb=cb, atom_mask=mask
            )
            self.pallas_max_tiles = max_pairs
            self._pallas_energy = make_nonbonded_rowscan(
                self.beta, self.cutoff, max_pairs, interpret=interpret, atom_mask=mask,
                dp_max_tiles=dp_tiles, dp_cb=cb,
            )
            self._pallas_energy_force = make_nonbonded_rowscan_energy_force(
                self.beta, self.cutoff, max_pairs, interpret=interpret, atom_mask=mask
            )
            if kernel == "rowscan":
                # configure-time tile census picks the MD provider's sort-grid
                # cell size (perf-only knob; any value is correct). Gated on
                # system size: small systems are compile-dominated and the
                # census's extra builder compilations aren't worth it there.
                md_cell = 0.65
                if conf.shape[0] >= 8192:
                    md_cell = suggest_cell_size(np.asarray(conf), np.asarray(box), self.cutoff, skin=skin)
                md_pairs = suggest_max_pairs(
                    np.asarray(conf), np.asarray(box), self.cutoff + skin, margin=margin, atom_mask=mask,
                    triangular=True, cell_size=md_cell,
                )
                # preshift: per-atom image mapping to the periodic row-chunk
                # center replaces the 9-op/slot per-pair minimum-image
                # rounding (measured −7.5% sweep, force parity 3.5e-6 rel,
                # scripts/probe_preshift.py). Gated on the dotscan image
                # bound; build_dotscan_tiles rechecks it every rebuild and
                # poisons on violation, so the gate can't silently go stale.
                from timemachine_tpu.ops.pallas.dotscan_kernel import dotscan_valid

                preshift = mask is None and dotscan_valid(
                    np.asarray(conf), np.asarray(box), self.cutoff + skin, cell_size=md_cell
                )
                # rowscan_has_w=False drops the per-slot 4D dw math (~6% of
                # the sweep) for systems whose w offsets are all zero (apo MD,
                # endpoint hosts). Caller-asserted; the provider's _guard_w
                # poisons the state if any nonzero w shows up at rebuild, so
                # wrong usage can't be silent.
                self._pallas_md = make_nonbonded_rowscan_md(
                    self.beta, self.cutoff, md_pairs, skin=skin, rebuild_interval=20, interpret=interpret,
                    atom_mask=mask, preshift=preshift, has_w=rowscan_has_w, cell_size=md_cell,
                )
            elif kernel == "quad":
                from timemachine_tpu.ops.pallas.quadscan_kernel import (
                    make_nonbonded_quadscan_md,
                )
                from timemachine_tpu.ops.pallas.quadscan_kernel import (
                    suggest_max_tiles as suggest_quad_tiles,
                )

                md_tiles = suggest_quad_tiles(np.asarray(conf), np.asarray(box), self.cutoff + skin, margin=margin)
                self._pallas_md = make_nonbonded_quadscan_md(
                    self.beta, self.cutoff, md_tiles, skin=skin, rebuild_interval=20, interpret=interpret,
                    has_w=quad_has_w,
                )
            else:
                from timemachine_tpu.ops.pallas.dotscan_kernel import (
                    make_nonbonded_dotscan_md,
                )
                from timemachine_tpu.ops.pallas.dotscan_kernel import (
                    suggest_max_pairs as suggest_dot_pairs,
                )

                md_pairs = suggest_dot_pairs(
                    np.asarray(conf), np.asarray(box), self.cutoff + skin, margin=margin, atom_mask=mask,
                    triangular=True, sort=dot_sort,
                )
                self._pallas_md = make_nonbonded_dotscan_md(
                    self.beta, self.cutoff, md_pairs, skin=skin, rebuild_interval=20, interpret=interpret,
                    atom_mask=mask, sort=dot_sort,
                )
            return self

        self._es_series = None
        self.pallas_max_tiles = suggest_max_tiles(
            np.asarray(conf), np.asarray(box), self.cutoff, margin=margin, cb=cb, atom_mask=mask
        )
        self._pallas_energy = make_nonbonded_pallas(
            self.beta, self.cutoff, self.pallas_max_tiles, interpret=interpret, cb=cb, atom_mask=mask
        )
        self._pallas_energy_force = make_nonbonded_pallas_energy_force(
            self.beta, self.cutoff, self.pallas_max_tiles, interpret=interpret, cb=cb, atom_mask=mask
        )
        # stateful MD provider: tile list culled at cutoff+skin, rebuilt every
        # rebuild_interval steps instead of per step
        md_tiles = suggest_max_tiles(
            np.asarray(conf), np.asarray(box), self.cutoff + skin, margin=margin, cb=cb, atom_mask=mask
        )
        self._pallas_md = make_nonbonded_pallas_md(
            self.beta, self.cutoff, md_tiles, skin=skin, rebuild_interval=20, interpret=interpret, cb=cb,
            atom_mask=mask,
        )
        return self

    def es_h_coeffs(self):
        """Chebyshev h(u) series of the configured rowscan kernel (None on
        exact-ES paths) — hand to nonbonded_on_specific_pairs(es_poly_coeffs=)
        so exclusion corrections cancel the all-pairs term exactly."""
        series = getattr(self, "_es_series", None)
        return series[0] if series is not None else None

    def energy_force_fn(self):
        """Fused (u, force) implementation if configured, else None. The MD
        Context uses this to skip the autodiff backward sweep."""
        return getattr(self, "_pallas_energy_force", None) if self.impl == "pallas" else None

    def md_force_provider(self):
        """Stateful (init, apply) MD force provider with amortized tile
        rebuilds, or None. apply(state, x, params, box, t) -> (u, f, state')."""
        return getattr(self, "_pallas_md", None) if self.impl == "pallas" else None

    def md_force_provider_sorted(self):
        """SortedNBInfo for the Context's sorted-state MD fast path, or None
        when the configured provider has no sorted protocol (non-cm kernels,
        tiled/dense impls)."""
        prov = self.md_force_provider()
        if prov is None or len(prov) < 6 or prov[5] is None:
            return None
        ss = prov[5]
        return SortedNBInfo(
            sweep=ss.sweep, pad_order=ss.pad_order, inv=ss.inv,
            rebuild_interval=ss.rebuild_interval, canonical_force=None,
        )

    def __call__(self, conf, params, box):
        if self.impl == "pallas":
            return self._pallas_energy(conf, params, box)
        if self.impl == "tiled":
            from timemachine_tpu.ops.neighborlist import nonbonded_all_pairs_tiled

            return nonbonded_all_pairs_tiled(
                conf,
                params,
                box,
                self.beta,
                self.cutoff,
                atom_mask=self._atom_mask,
                padding=self.nblist_padding,
                grid_dims=self.tiled_grid_dims,
                capacity=self.tiled_capacity,
            )
        n = conf.shape[0]
        ones = np.ones((n, n))
        mask = None if self._atom_mask is None else jnp.asarray(self._atom_mask, dtype=conf.dtype)
        return nonbonded.nonbonded_all_pairs_dense(conf, params, box, ones, ones, self.beta, self.cutoff, atom_mask=mask)


@dataclass(eq=False)
class Nonbonded(Potential):
    """AllPairs + intramolecular exclusions, the standard condensed-phase
    term (ref potentials.py:102-138). Exclusions are applied as (1 - scale)
    rescale masks in the dense impl, or as a negated pair-list correction in
    the tiled impl (matching the CUDA decomposition AllPairs + negated
    NonbondedExclusions)."""

    num_atoms: int
    exclusion_idxs: np.ndarray  # (E, 2) int32
    scale_factors: np.ndarray  # (E, 2) [q_scale, lj_scale]
    beta: float
    cutoff: float
    atom_idxs: Optional[np.ndarray] = None
    impl: str = "dense"
    nblist_padding: float = 0.2

    # see NonbondedAllPairs._EXEC_CONFIG_FIELDS
    _EXEC_CONFIG_FIELDS = frozenset({"impl"})

    def __post_init__(self):
        self._filtered = (self.exclusion_idxs, self.scale_factors)
        if self.atom_idxs is not None:
            self._filtered = nonbonded.filter_exclusions(
                self.atom_idxs, self.exclusion_idxs, self.scale_factors, update_idxs=False
            )
        self._all_pairs = NonbondedAllPairs(
            self.num_atoms,
            self.beta,
            self.cutoff,
            atom_idxs=self.atom_idxs,
            impl=self.impl,
            nblist_padding=self.nblist_padding,
        )

    def configure_tiled(self, box, conf=None):
        self._all_pairs.configure_tiled(box, conf=conf)
        return self

    def configure_pallas(self, box, conf, margin: float = 1.4, interpret: bool = False, **kwargs):
        self._all_pairs.configure_pallas(box, conf, margin=margin, interpret=interpret, **kwargs)
        self.impl = "pallas"
        return self

    def set_impl(self, impl: str):
        """Switch between the dense O(N^2) and tiled O(N) evaluation paths."""
        self.impl = impl
        self._all_pairs.impl = impl
        return self

    def _exclusion_energy(self, conf, params, box):
        exc_idxs, exc_scales = self._filtered
        # poly-consistent ES: when the AllPairs term runs the rowscan kernel,
        # subtract its OWN Chebyshev electrostatics so the correction cancels
        # exactly (not just to polynomial-fit accuracy)
        h_coeffs = self._all_pairs.es_h_coeffs() if self.impl == "pallas" else None
        # leading TIP3P water blocks go through the strided lane-slice fast
        # path (scatter-free adjoint; measured ~3x cheaper per MD step)
        nw = nonbonded.leading_water_exclusions(exc_idxs, exc_scales)
        u = 0.0
        if nw > 0:
            u = nonbonded.water_exclusion_energy(
                conf, params, box, nw, self.beta, self.cutoff, es_poly_coeffs=h_coeffs
            )
            exc_idxs = np.asarray(exc_idxs)[3 * nw :]
            exc_scales = np.asarray(exc_scales)[3 * nw :]
            if exc_idxs.shape[0] == 0:
                return u
        vdW, es = nonbonded.nonbonded_on_specific_pairs(
            conf, params, box, jnp.asarray(exc_idxs), self.beta, self.cutoff, rescale_mask=jnp.asarray(exc_scales),
            es_poly_coeffs=h_coeffs,
        )
        return u + jnp.sum(vdW) + jnp.sum(es)

    def _exclusion_energy_force(self, conf, params, box):
        """(u_exc, dU_exc/dx): strided autodiff for the leading-water block
        (scatter-free adjoint), closed-form gather/scatter
        (ops/nonbonded.py specific_pairs_energy_force) for the generic tail
        when the polynomial ES series is available; full autodiff otherwise."""
        exc_idxs, exc_scales = self._filtered
        h_coeffs = self._all_pairs.es_h_coeffs() if self.impl == "pallas" else None
        nw = nonbonded.leading_water_exclusions(exc_idxs, exc_scales)
        tail_idxs = np.asarray(exc_idxs)[3 * nw :]
        tail_scales = np.asarray(exc_scales)[3 * nw :]
        if h_coeffs is None:
            return jax.value_and_grad(self._exclusion_energy)(conf, params, box)
        u, g = 0.0, jnp.zeros_like(conf)
        if nw:
            u_w, g_w = jax.value_and_grad(
                lambda c: nonbonded.water_exclusion_energy(
                    c, params, box, nw, self.beta, self.cutoff, es_poly_coeffs=h_coeffs
                )
            )(conf)
            u, g = u + u_w, g + g_w
        if len(tail_idxs):
            u_t, f_t = nonbonded.specific_pairs_energy_force(
                conf, params, box, tail_idxs, self.beta, self.cutoff, jnp.asarray(tail_scales), h_coeffs
            )
            u, g = u + u_t, g - f_t  # f_t = -dU_t/dx
        return u, g

    def energy_force_fn(self):
        """Fused (u, force) when the AllPairs term runs on the Pallas path;
        the exclusion correction uses the analytic pair force (see
        _exclusion_energy_force)."""
        ef = self._all_pairs.energy_force_fn()
        if ef is None:
            return None
        exc_idxs, _ = self._filtered
        has_exclusions = len(exc_idxs) > 0

        def fn(conf, params, box):
            u, f = ef(conf, params, box)
            if has_exclusions:
                u_exc, g_exc = self._exclusion_energy_force(conf, params, box)
                u = u - u_exc
                f = f + g_exc
            return u, f

        return fn

    def md_force_provider(self):
        """Stateful MD provider: Pallas AllPairs with amortized rebuilds plus
        the autodiff exclusion correction. Returns (init, apply) or
        (init, apply, energy) — the third element, when present, evaluates
        the energy REUSING the state's tile lists (valid within skin/2 of the
        build conf), which is what MC movers want."""
        prov = self._all_pairs.md_force_provider()
        if prov is None:
            return None
        init_ap, apply_ap = prov[0], prov[1]
        energy_ap = prov[2] if len(prov) > 2 else None
        exc_idxs, _ = self._filtered
        has_exclusions = len(exc_idxs) > 0

        def apply_fn(state, conf, params, box, t):
            u, f, state = apply_ap(state, conf, params, box, t)
            if has_exclusions:
                u_exc, g_exc = self._exclusion_energy_force(conf, params, box)
                u = u - u_exc
                f = f + g_exc
            return u, f, state

        if energy_ap is None:
            return init_ap, apply_fn

        def energy_fn(state, conf, params, box):
            u = energy_ap(state, conf, params, box)
            if has_exclusions:
                u = u - self._exclusion_energy(conf, params, box)
            return u

        # 4th element: energy under RIGID per-molecule displacement — the
        # exclusion pairs are bond-graph-local so their correction cancels
        # exactly in a barostat's dU; skipping it saves a pass and avoids
        # f32 cancellation of large intra sums (md/context.py volume moves)
        return init_ap, apply_fn, energy_fn, energy_ap

    def md_force_provider_split(self):
        """Scatter-free step protocol (md/context.py unified assembly):
        (provider, tail_groups, tail_fn). The provider's APPLY omits the
        generic exclusion-tail force — the Context assembles it through the
        shared contribution plan via tail_fn — while all ENERGY paths keep
        the full exclusion correction (MC mover / HREX contracts unchanged).
        None (caller falls back to md_force_provider) when there is no Pallas
        provider, no polynomial ES series, or no exclusion tail."""
        prov = self._all_pairs.md_force_provider()
        if prov is None or len(prov) < 3:
            return None
        h_coeffs = self._all_pairs.es_h_coeffs()
        if h_coeffs is None:
            return None
        exc_idxs, exc_scales = self._filtered
        nw = nonbonded.leading_water_exclusions(exc_idxs, exc_scales)
        tail_idxs = np.asarray(exc_idxs)[3 * nw :]
        if tail_idxs.shape[0] == 0:
            return None
        tail_scales = jnp.asarray(np.asarray(exc_scales)[3 * nw :])
        init_ap, apply_ap, energy_ap = prov[0], prov[1], prov[2]
        beta, cutoff = self.beta, self.cutoff

        def apply_fn(state, conf, params, box, t):
            u, f, state = apply_ap(state, conf, params, box, t)
            if nw:
                _, g_w = jax.value_and_grad(
                    lambda c: nonbonded.water_exclusion_energy(
                        c, params, box, nw, beta, cutoff, es_poly_coeffs=h_coeffs
                    )
                )(conf)
                f = f + g_w
            return u, f, state

        def energy_fn(state, conf, params, box):
            return energy_ap(state, conf, params, box) - self._exclusion_energy(conf, params, box)

        def tail_fn(conf, params, box):
            _, (g_l, g_r) = nonbonded.specific_pairs_force_contribs(
                conf, params, box, tail_idxs, beta, cutoff, tail_scales, h_coeffs
            )
            # the exclusion correction enters the total force as +dU_exc/dx
            return [[-g_l, -g_r]], None

        return (init_ap, apply_fn, energy_fn, energy_ap), [tail_idxs], tail_fn

    def md_force_provider_sorted(self):
        """SortedNBInfo for the Context's sorted-state MD fast path, or None.

        The sorted step composes the force as: sweep_sorted (pad_order
        space) + canonical residual (bonded terms, the exclusion tail
        through the shared contribution plan, and this info's
        `canonical_force` — the leading-water exclusion grad) gathered to
        sorted space once. All ENERGY paths (MC movers, HREX) stay on the
        canonical provider tuple this class already registers via
        md_force_provider / md_force_provider_split, so only the per-step
        force path changes. Requires the polynomial-ES rowscan-cm provider
        (exact exclusion cancellation)."""
        prov = self._all_pairs.md_force_provider()
        if prov is None or len(prov) < 6 or prov[5] is None:
            return None
        h_coeffs = self._all_pairs.es_h_coeffs()
        if h_coeffs is None:
            return None
        ss = prov[5]
        exc_idxs, exc_scales = self._filtered
        nw = nonbonded.leading_water_exclusions(exc_idxs, exc_scales)
        beta, cutoff = self.beta, self.cutoff

        canonical_force = None
        if nw:
            def canonical_force(conf, params, box):
                # the exclusion CORRECTION subtracts U_exc from the total, so
                # its contribution to the force (-dU/dx) is +dU_exc/dx
                _, g_w = jax.value_and_grad(
                    lambda c: nonbonded.water_exclusion_energy(
                        c, params, box, nw, beta, cutoff, es_poly_coeffs=h_coeffs
                    )
                )(conf)
                return g_w

        return SortedNBInfo(
            sweep=ss.sweep, pad_order=ss.pad_order, inv=ss.inv,
            rebuild_interval=ss.rebuild_interval, canonical_force=canonical_force,
        )

    def __call__(self, conf, params, box):
        if self.impl in ("tiled", "pallas"):
            u_all = self._all_pairs(conf, params, box)
            exc_idxs, exc_scales = self._filtered
            if len(exc_idxs) == 0:
                return u_all
            return u_all - self._exclusion_energy(conf, params, box)
        exc_idxs, exc_scales = self._filtered
        q_mask, lj_mask = _dense_masks(self.num_atoms, exc_idxs, exc_scales)
        mask = None if self._all_pairs._atom_mask is None else jnp.asarray(self._all_pairs._atom_mask, dtype=conf.dtype)
        return nonbonded.nonbonded_all_pairs_dense(
            conf, params, box, jnp.asarray(q_mask), jnp.asarray(lj_mask), self.beta, self.cutoff, atom_mask=mask
        )


@dataclass(eq=False)
class NonbondedInteractionGroup(Potential):
    """Row-set × col-set interactions (ligand × environment)
    (ref potentials.py:164-186)."""

    num_atoms: int
    row_atom_idxs: np.ndarray
    beta: float
    cutoff: float
    col_atom_idxs: Optional[np.ndarray] = None

    def __call__(self, conf, params, box):
        vdW, es = nonbonded.nonbonded_interaction_groups(
            conf, params, box, self.row_atom_idxs, self.col_atom_idxs, self.beta, self.cutoff
        )
        return jnp.sum(vdW) + jnp.sum(es)

    def energy_force_fn(self):
        """Fused (u, force) in grid form: both sides' forces are axis
        reductions over the (rows × cols) pair grid instead of 2·R·C
        scatter-adds through the autodiff adjoint — the dominant per-step
        cost of RBFE windows (ops/nonbonded.py interaction_group_energy_force)."""

        def ef(conf, params, box):
            return nonbonded.interaction_group_energy_force(
                conf, params, box, self.row_atom_idxs, self.col_atom_idxs, self.beta, self.cutoff
            )

        return ef


@dataclass(eq=False)
class NonbondedPairList(Potential):
    idxs: np.ndarray  # (P, 2)
    rescale_mask: np.ndarray  # (P, 2)
    beta: float
    cutoff: float

    def __call__(self, conf, params, box):
        vdW, es = nonbonded.nonbonded_on_specific_pairs(
            conf, params, box, self.idxs, self.beta, self.cutoff, jnp.asarray(self.rescale_mask)
        )
        return jnp.sum(vdW) + jnp.sum(es)


@dataclass(eq=False)
class NonbondedExclusions(Potential):
    """Negated pair-list: cancels excluded interactions out of an AllPairs sum
    (ref potentials.py:204-215)."""

    # exclusions are bond-graph-local pairs: invariant under rigid
    # per-molecule displacements (md/context.py)
    rigid_group_invariant = True

    idxs: np.ndarray
    rescale_mask: np.ndarray
    beta: float
    cutoff: float

    def __call__(self, conf, params, box):
        vdW, es = nonbonded.nonbonded_on_specific_pairs(
            conf, params, box, self.idxs, self.beta, self.cutoff, jnp.asarray(self.rescale_mask)
        )
        return -(jnp.sum(vdW) + jnp.sum(es))


@dataclass(eq=False)
class NonbondedPairListPrecomputed(Potential):
    """Pair list whose params are pre-combined (q_ij, σ_ij, ε_ij, Δw_ij) —
    the intramolecular ligand term in single-topology states
    (ref potentials.py:218-237)."""

    # intramolecular ligand pairs: exactly invariant under the barostat's
    # rigid per-molecule displacements (md/context.py)
    rigid_group_invariant = True

    idxs: np.ndarray
    beta: float
    cutoff: float

    def __call__(self, conf, params, box):
        vdW, es = nonbonded.nonbonded_on_precomputed_pairs(conf, params, box, self.idxs, self.beta, self.cutoff)
        return jnp.sum(vdW) + jnp.sum(es)


def unflatten_params(params_flat, shapes):
    sizes = [int(np.prod(s)) for s in shapes]
    offsets = np.cumsum([0] + sizes)
    return [params_flat[offsets[i] : offsets[i + 1]].reshape(shapes[i]) for i in range(len(shapes))]


@dataclass(eq=False)
class SummedPotential(Potential):
    """Sum of potentials over a flat concatenated parameter vector — the
    `set_params(flat θ)` surface that HREX and u_kln evaluation rely on
    (ref potentials.py:240-277). XLA fuses the terms; no stream management."""

    potentials: Sequence[Potential]
    params_init: Sequence[np.ndarray]

    def __post_init__(self):
        if len(self.potentials) != len(self.params_init):
            raise ValueError("number of potentials != number of parameter arrays")
        self.params_shapes = [np.shape(p) for p in self.params_init]

    def __call__(self, conf, params, box):
        ps = unflatten_params(params, self.params_shapes)
        total = 0.0
        for pot, p in zip(self.potentials, ps):
            total = total + pot(conf, p, box)
        return total

    def call_with_params_list(self, conf, params, box):
        flat = jnp.concatenate([jnp.ravel(p) for p in params])
        return self(conf, flat, box)

    def bind_params_list(self, params):
        flat = jnp.concatenate([jnp.ravel(jnp.asarray(p)) for p in params])
        return BoundPotential(self, flat)

    def unflatten_params(self, params):
        return unflatten_params(params, self.params_shapes)


def make_summed_potential(bps: Sequence[BoundPotential]):
    potentials = [bp.potential for bp in bps]
    params = [bp.params for bp in bps]
    return SummedPotential(potentials, params).bind_params_list(params)


@dataclass(eq=False)
class FanoutSummedPotential(Potential):
    """Sum of potentials sharing one parameter array (ref potentials.py:294-304)."""

    potentials: Sequence[Potential]

    def __call__(self, conf, params, box):
        total = 0.0
        for pot in self.potentials:
            total = total + pot(conf, params, box)
        return total


def get_potential_by_type(pots: Sequence[Potential], pot_type):
    for pot in pots:
        if isinstance(pot, pot_type):
            return pot
    raise ValueError(f"Unable to find potential of type: {pot_type}")


def get_bound_potential_by_type(bps: Sequence[BoundPotential], pot_type):
    for bp in bps:
        if isinstance(bp.potential, pot_type):
            return bp
    raise ValueError(f"Unable to find potential of type: {pot_type}")


def sum_potential_energies(bps: Sequence[BoundPotential], conf, box):
    """Total energy of a list of bound potentials (XLA fuses the terms)."""
    total = 0.0
    for bp in bps:
        total = total + bp(conf, box)
    return total
