"""API-parity utility surface for users of the reference's
`timemachine.lib.custom_ops` module (custom_ops.pyi:140-358): spatial sort,
neighborlist, segmented logsumexp, segmented weighted sampling, and the
module-level hardware helpers. Single precision track — on TPU the engine is
f32 with f64 analysis on CPU, so the `_f32/_f64` class suffixes of the
reference collapse into one class each (aliases provided).

These are host-facing convenience objects; the MD hot path uses the fused
Pallas machinery in ops/pallas directly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.ops.pallas.nonbonded_kernel import hilbert_lut


class InvalidHardware(Exception):
    """Raised when no usable accelerator is present
    (ref custom_ops.pyi:151)."""


def device_reset() -> None:
    """Release cached device buffers (ref custom_ops.cuda_device_reset).

    XLA owns allocation on TPU; clearing jit caches is the closest analog and
    is what leak-attribution test fixtures want."""
    jax.clear_caches()


class HilbertSort:
    """Spatial sort on a 2^bits-per-axis grid mapped to the Hilbert curve
    (ref hilbert_sort.hpp:9-37; 128^3 grid)."""

    def __init__(self, size: int, bits: int = 7):
        self.size = size
        self.bits = bits
        self._lut = hilbert_lut(bits)

    def sort(self, coords, box) -> np.ndarray:
        """Permutation (uint32) ordering atoms along the Hilbert curve after
        wrapping into the box."""
        coords = np.asarray(coords)[:, :3]
        box_diag = np.diagonal(np.asarray(box))
        wrapped = coords - box_diag * np.floor(coords / box_diag)
        frac = np.clip(wrapped / box_diag, 0.0, np.nextafter(1.0, 0.0))
        dim = 1 << self.bits
        cell = np.minimum((frac * dim).astype(np.int64), dim - 1)
        # LUT is flat x-major: linear cell index -> Hilbert curve index
        d = self._lut[(cell[:, 0] * dim + cell[:, 1]) * dim + cell[:, 2]]
        return np.argsort(d, kind="stable").astype(np.uint32)


class Neighborlist:
    """Block-bounds neighborlist (ref neighborlist.hpp:30-89): 32-atom block
    bounding boxes + per-block candidate atom lists at a cutoff. Supports the
    row-idxs subset mode used for interaction groups."""

    BLOCK = 32

    def __init__(self, N: int):
        self._n = N
        self._row_idxs: np.ndarray | None = None
        self._last_ixn_count = 0

    def resize(self, size: int) -> None:
        if size <= 0:
            raise RuntimeError("size must be at least 1")
        self._n = size
        self._row_idxs = None

    def set_row_idxs(self, idxs) -> None:
        idxs = np.asarray(idxs, dtype=np.uint32)
        if idxs.size >= self._n:
            raise RuntimeError("number of idxs must be less than N")
        self._row_idxs = idxs

    def reset_row_idxs(self) -> None:
        self._row_idxs = None

    def get_num_row_idxs(self) -> int:
        return self._n if self._row_idxs is None else len(self._row_idxs)

    def compute_block_bounds(self, coords, box, block_size: int = 32):
        """(centers, extents) of ceil(R/block)-atom row blocks after wrapping
        (ref k_neighborlist.cuh block bounds)."""
        rows = self._rows(coords)
        box_diag = np.diagonal(np.asarray(box))
        wrapped = rows - box_diag * np.floor(rows / box_diag)
        n_blocks = -(-len(wrapped) // block_size)
        pad = n_blocks * block_size - len(wrapped)
        padded = np.concatenate([wrapped, np.repeat(wrapped[-1:], pad, axis=0)]).reshape(n_blocks, block_size, 3)
        bmin = padded.min(axis=1)
        bmax = padded.max(axis=1)
        return 0.5 * (bmin + bmax), 0.5 * (bmax - bmin)

    def _rows(self, coords):
        coords = np.asarray(coords)[:, :3]
        if len(coords) != self._n:
            raise RuntimeError(f"N={self._n} coords={len(coords)}")
        return coords if self._row_idxs is None else coords[self._row_idxs]

    def get_nblist(self, coords, box, cutoff) -> list[list[int]]:
        """Per-row-block candidate atom indices: every atom whose minimum-image
        distance to the block's bounding box is < cutoff. In all-atoms mode
        the lists are upper-triangular (only atoms at or after the block, each
        unordered pair represented once); with row_idxs set, lists are the
        candidate COLUMN atoms (complement of row_idxs) for each row block —
        matching the reference's interaction-group mode."""
        coords = np.asarray(coords)[:, :3]
        box_diag = np.diagonal(np.asarray(box))
        wrapped = coords - box_diag * np.floor(coords / box_diag)
        rows = wrapped if self._row_idxs is None else wrapped[self._row_idxs]
        if self._row_idxs is None:
            col_ids = np.arange(self._n)
        else:
            mask = np.ones(self._n, dtype=bool)
            mask[self._row_idxs] = False
            col_ids = np.nonzero(mask)[0]
        cols = wrapped[col_ids]

        B = self.BLOCK
        n_blocks = -(-len(rows) // B)
        out: list[list[int]] = []
        for b in range(n_blocks):
            blk = rows[b * B : (b + 1) * B]
            bmin, bmax = blk.min(axis=0), blk.max(axis=0)
            cen, hal = 0.5 * (bmin + bmax), 0.5 * (bmax - bmin)
            d = cen[None, :] - cols
            d -= box_diag * np.round(d / box_diag)
            gap = np.maximum(np.abs(d) - hal[None, :], 0.0)
            hit = (gap * gap).sum(axis=1) < cutoff * cutoff
            ids = col_ids[hit]
            if self._row_idxs is None:
                ids = ids[ids >= b * B]  # upper-triangular all-pairs mode
            out.append(ids.tolist())
        self._last_ixn_count = sum(len(ids) for ids in out)
        return out

    def get_tile_ixn_count(self) -> int:
        """Interactions found by the most recent get_nblist call."""
        return self._last_ixn_count

    def get_max_ixn_count(self) -> int:
        n_blocks = -(-self.get_num_row_idxs() // self.BLOCK)
        return n_blocks * self.BLOCK * self._n


class SegmentedSumExp:
    """Streaming segmented logsumexp (ref segmented_sumexp.cu/.hpp,
    custom_ops.pyi:302-312)."""

    def __init__(self, max_vals_per_segment: int, num_segments: int):
        self.max_vals_per_segment = max_vals_per_segment
        self.num_segments = num_segments

    def logsumexp(self, values: list) -> list[float]:
        if len(values) > self.num_segments:
            raise RuntimeError(f"got {len(values)} segments, configured for {self.num_segments}")
        out = []
        for seg in values:
            seg = np.asarray(seg, dtype=np.float64)
            if seg.size > self.max_vals_per_segment:
                raise RuntimeError("segment exceeds max_vals_per_segment")
            if seg.size == 0:
                out.append(-np.inf)
                continue
            m = np.max(seg)
            # inf-max semantics match the reference: exp(v - inf) -> 0, log -> -inf + inf
            out.append(float(m + np.log(np.sum(np.exp(seg - m)))))
        return out


class SegmentedWeightedRandomSampler:
    """Batched per-segment categorical sampling from unnormalized weights
    (ref segmented_weighted_random_sampler.cu, custom_ops.pyi:314-324) —
    Gumbel argmax on the log weights, threefry-keyed."""

    def __init__(self, max_vals_per_segment: int, segments: int, seed: int):
        self.max_vals_per_segment = max_vals_per_segment
        self.segments = segments
        self._key = jax.random.key(seed)

    def sample(self, weights: list) -> list[int]:
        if len(weights) > self.segments:
            raise RuntimeError(f"got {len(weights)} segments, configured for {self.segments}")
        out = []
        for seg in weights:
            seg = np.asarray(seg, dtype=np.float64)
            if seg.size > self.max_vals_per_segment:
                raise RuntimeError("segment exceeds max_vals_per_segment")
            if np.any(seg < 0) or not np.all(np.isfinite(seg)) or np.sum(seg) <= 0:
                raise RuntimeError("weights must be finite, non-negative, with positive sum")
            self._key, sub = jax.random.split(self._key)
            idx = int(jax.random.categorical(sub, jnp.log(jnp.asarray(seg))))
            out.append(idx)
        return out


# reference exports both precisions; the TPU engine is single-track
HilbertSort_f32 = HilbertSort_f64 = HilbertSort
Neighborlist_f32 = Neighborlist_f64 = Neighborlist
SegmentedSumExp_f32 = SegmentedSumExp_f64 = SegmentedSumExp
SegmentedWeightedRandomSampler_f32 = SegmentedWeightedRandomSampler_f64 = SegmentedWeightedRandomSampler


class NonbondedMolEnergy:
    """Per-molecule interaction energy of target mols vs the remaining system
    (parity: custom_ops.NonbondedMolEnergy, nonbonded_mol_energy.cu /
    k_nonbonded.cuh:435-608 — the exchange movers' inner loop, exposed
    standalone).

    target_mols: sequence of atom-index lists. Equal-size groups evaluate as
    one chunked vmapped block sweep; ragged groups fall back to a per-mol
    loop.
    """

    def __init__(self, num_atoms: int, target_mols, beta: float, cutoff: float):
        import jax
        import jax.numpy as jnp

        from timemachine_tpu.ops.nonbonded import nonbonded_block_unsummed

        self.num_atoms = num_atoms
        self.beta = beta
        self.cutoff = cutoff
        self._mols = [np.asarray(m, dtype=np.int32) for m in target_mols]
        sizes = {len(m) for m in self._mols}
        self._uniform = len(sizes) == 1
        num_mols = len(self._mols)

        # atom -> owning target mol (num_mols for non-target atoms): used to
        # zero each mol's own columns out of its block
        owner = np.full(num_atoms, num_mols, dtype=np.int32)
        for mol_idx, m in enumerate(self._mols):
            owner[m] = mol_idx
        owner = jnp.asarray(owner)

        def mol_energy(conf, params, box, mol_atom_idxs, mol_idx):
            u = nonbonded_block_unsummed(
                conf[mol_atom_idxs], conf, box, params[mol_atom_idxs], params, beta, cutoff
            )
            u = jnp.where(jnp.isnan(u), jnp.inf, u)
            u = jnp.where((owner == mol_idx)[None, :], 0.0, u)
            return jnp.sum(u)

        if self._uniform:
            idx_mat = jnp.asarray(np.stack(self._mols))

            @jax.jit
            def execute(conf, params, box):
                return jax.vmap(mol_energy, in_axes=(None, None, None, 0, 0))(
                    jnp.asarray(conf), jnp.asarray(params), jnp.asarray(box),
                    idx_mat, jnp.arange(num_mols),
                )

            self._execute = execute
        else:
            fns = [
                jax.jit(partial(mol_energy, mol_atom_idxs=jnp.asarray(m), mol_idx=i))
                for i, m in enumerate(self._mols)
            ]

            def execute(conf, params, box):
                return jnp.stack([f(jnp.asarray(conf), jnp.asarray(params), jnp.asarray(box)) for f in fns])

            self._execute = execute

    def execute(self, coords, params, box) -> np.ndarray:
        return np.asarray(self._execute(coords, params, box))


NonbondedMolEnergy_f32 = NonbondedMolEnergy_f64 = NonbondedMolEnergy
