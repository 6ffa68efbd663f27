"""O(N) nonbonded evaluation via a static-shape cell list.

TPU-native replacement for the reference's Hilbert-sort + 32-atom-block
neighborlist CUDA machinery (nonbonded_all_pairs.cu, neighborlist.cu,
hilbert_sort.cu): instead of a dynamic tile interaction list (dynamic shapes
are hostile to XLA), atoms are binned into a fixed 3-D grid of cells sized
>= cutoff, and every cell interacts with its 27-cell stencil. All shapes are
static: (n_cells, capacity) binning tables padded with sentinel atoms, so the
whole pipeline (binning -> gather -> pair energies -> reduction) compiles to
one fused XLA program and differentiates cleanly (forces = scatter-adds from
the gathers).

Overflowed cells (more atoms than `capacity`) are detected and reported via
an auxiliary counter; callers size capacity with headroom (3x mean occupancy
by default).

The pair math matches ops/nonbonded.py exactly (4D-lifted LJ + switched
erfc Coulomb); consistency against the dense O(N^2) path is enforced by
tests/test_neighborlist.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.ops.nonbonded import lennard_jones, switched_direct_space_pme


def choose_grid(box_diag, cutoff: float, padding: float = 0.0) -> tuple[int, int, int]:
    """Static cells-per-dimension so that cell size >= cutoff + padding.
    Host-side (needs concrete box)."""
    box_diag = np.asarray(box_diag)
    dims = np.maximum(1, np.floor(box_diag / (cutoff + padding)).astype(int))
    return tuple(int(d) for d in dims)


def choose_capacity(num_atoms: int, grid_dims, headroom: float = 3.0, conf=None, box=None) -> int:
    """Cell capacity with headroom. If a concrete conf/box is given, size
    from the ACTUAL max occupancy instead of the mean — much tighter for
    uniform-density systems (pair work scales linearly with capacity)."""
    n_cells = int(np.prod(grid_dims))
    if conf is not None and box is not None:
        box_diag = np.diagonal(np.asarray(box))
        dims = np.asarray(grid_dims)
        frac = np.asarray(conf)[:, :3] / box_diag
        frac = frac - np.floor(frac)
        cell_xyz = np.minimum((frac * dims).astype(int), dims - 1)
        cid = (cell_xyz[:, 0] * grid_dims[1] + cell_xyz[:, 1]) * grid_dims[2] + cell_xyz[:, 2]
        occ = np.bincount(cid, minlength=n_cells)
        cap = int(np.ceil(occ.max() * 1.25)) + 4
    else:
        mean = num_atoms / n_cells
        cap = int(np.ceil(mean * headroom)) + 8
    # round up to a TPU-friendly multiple
    return int(np.ceil(cap / 8) * 8)


@partial(jax.jit, static_argnames=("grid_dims", "capacity"))
def build_cell_list(conf, box, grid_dims: tuple[int, int, int], capacity: int):
    """Bin atoms into (n_cells, capacity) index table (padded with n_atoms,
    pointing at a sentinel row callers must append or mask).

    Returns (cell_table, cell_of_atom, overflow_count).
    """
    n = conf.shape[0]
    box_diag = jnp.diagonal(box)
    dims = jnp.asarray(grid_dims)
    # wrap into home box
    frac = conf[:, :3] / box_diag
    frac = frac - jnp.floor(frac)
    cell_xyz = jnp.minimum((frac * dims).astype(jnp.int32), dims - 1)
    cell_of_atom = (cell_xyz[:, 0] * grid_dims[1] + cell_xyz[:, 1]) * grid_dims[2] + cell_xyz[:, 2]

    n_cells = grid_dims[0] * grid_dims[1] * grid_dims[2]
    order = jnp.argsort(cell_of_atom).astype(jnp.int32)
    sorted_cells = cell_of_atom[order]
    # scatter-free construction: table[c, s] = order[start[c] + s] where valid
    # (XLA:CPU in jax 0.9.0 sporadically miscompiles scatter fused with the
    # downstream gathers; gather/searchsorted-only form is also TPU-friendlier)
    start = jnp.searchsorted(sorted_cells, jnp.arange(n_cells)).astype(jnp.int32)
    end = jnp.searchsorted(sorted_cells, jnp.arange(n_cells), side="right").astype(jnp.int32)
    counts = end - start
    overflow = jnp.sum(jnp.maximum(counts - capacity, 0))
    pos = start[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :]
    valid = pos < end[:, None]
    table = jnp.where(valid, order[jnp.clip(pos, 0, n - 1)], n)
    return table, cell_of_atom, overflow


def _stencil_offsets(grid_dims):
    """(27, 3) neighbor cell offsets; degenerate dims (< 3 cells) shrink the
    stencil to avoid double-visiting cells through periodic wrap."""
    ranges = []
    for d in grid_dims:
        if d >= 3:
            ranges.append((-1, 0, 1))
        elif d == 2:
            ranges.append((0, 1))
        else:
            ranges.append((0,))
    out = [(i, j, k) for i in ranges[0] for j in ranges[1] for k in ranges[2]]
    return np.array(out, dtype=np.int32)


@partial(jax.jit, static_argnames=("grid_dims", "capacity", "beta", "cutoff", "cell_chunk"))
def nonbonded_cell_list_energy(conf, params, box, grid_dims, capacity, beta, cutoff, atom_mask=None, cell_chunk=None):
    """Total LJ + reaction-field energy over the cell-list stencil.

    Sentinel atom: a phantom row appended at index n with all-zero params and
    a far-away coordinate, so padded table entries contribute exactly zero.

    The per-cell pair blocks are processed in chunks of `cell_chunk` cells via
    lax.scan with explicitly batched operations. This bounds peak memory to
    O(cell_chunk * capacity^2 * stencil) regardless of system size, and
    deliberately avoids jax.vmap-of-gather, which miscompiles
    (nondeterministically across compilations) on XLA:CPU in jax 0.9.0 — see
    tests/test_neighborlist.py::test_compilation_determinism.
    """
    n = conf.shape[0]
    table, cell_of_atom, overflow = build_cell_list(conf, box, grid_dims, capacity)

    # atom subsets: fold the mask into the parameters (zero charge and zero
    # epsilon make every pair touching a masked atom contribute exactly 0) —
    # identical semantics to per-pair mask gathers without the extra gather,
    # which is one of the access patterns jax 0.9.0's XLA:CPU pipeline
    # miscompiles at the default optimization level
    if atom_mask is not None:
        m = jnp.asarray(atom_mask, params.dtype)
        params = params.at[:, 0].mul(m).at[:, 2].mul(m)

    # append sentinel row
    far = jnp.asarray(2e5, conf.dtype)
    conf_ext = jnp.concatenate([conf, jnp.full((1, 3), far, conf.dtype)])
    params_ext = jnp.concatenate([params, jnp.zeros((1, params.shape[1]), params.dtype)])

    offsets = jnp.asarray(_stencil_offsets(grid_dims))  # (S, 3)
    dims = jnp.asarray(grid_dims)
    n_cells = grid_dims[0] * grid_dims[1] * grid_dims[2]

    cell_ids = jnp.arange(n_cells)
    cz = cell_ids % grid_dims[2]
    cy = (cell_ids // grid_dims[2]) % grid_dims[1]
    cx = cell_ids // (grid_dims[1] * grid_dims[2])
    cell_xyz = jnp.stack([cx, cy, cz], axis=1)  # (C, 3)

    # neighbor cell ids per cell: (C, S)
    nbr_xyz = (cell_xyz[:, None, :] + offsets[None, :, :]) % dims
    nbr_ids = (nbr_xyz[..., 0] * grid_dims[1] + nbr_xyz[..., 1]) * grid_dims[2] + nbr_xyz[..., 2]

    box_diag = jnp.diagonal(box)

    row_all = table  # (C, capacity)
    col_all = table[nbr_ids].reshape(n_cells, -1)  # (C, S * capacity)

    # pad the cell axis to a multiple of the chunk size with sentinel cells
    if cell_chunk is None:
        cell_chunk = max(1, min(n_cells, 4096 // capacity))
    n_chunks = -(-n_cells // cell_chunk)
    pad = n_chunks * cell_chunk - n_cells
    if pad:
        row_all = jnp.concatenate([row_all, jnp.full((pad, capacity), n, dtype=row_all.dtype)])
        col_all = jnp.concatenate([col_all, jnp.full((pad, col_all.shape[1]), n, dtype=col_all.dtype)])
    row_chunks = row_all.reshape(n_chunks, cell_chunk, capacity)
    col_chunks = col_all.reshape(n_chunks, cell_chunk, -1)

    def chunk_energy(acc, chunk):
        row_idx, col_idx = chunk  # (B, C1), (B, C2)
        b1, c1 = row_idx.shape
        b2, c2 = col_idx.shape
        # flat 1-D gathers + reshape: jax 0.9.0's XLA:CPU pipeline has been
        # observed to miscompile multi-dim-index gather formulations
        # nondeterministically at the default optimization level (see
        # test_compilation_determinism's history)
        xi = conf_ext[row_idx.reshape(-1)].reshape(b1, c1, 3)
        xj = conf_ext[col_idx.reshape(-1)].reshape(b2, c2, 3)
        pi = params_ext[row_idx.reshape(-1)].reshape(b1, c1, -1)
        pj = params_ext[col_idx.reshape(-1)].reshape(b2, c2, -1)

        dr = xi[:, :, None, :] - xj[:, None, :, :]
        dr = dr - box_diag * jnp.floor(dr / box_diag + 0.5)
        dw = pi[..., 3][:, :, None] - pj[..., 3][:, None, :]
        d2 = jnp.sum(dr * dr, axis=-1) + dw * dw

        valid = (
            (row_idx[:, :, None] < n)
            & (col_idx[:, None, :] < n)
            & (row_idx[:, :, None] != col_idx[:, None, :])
        )
        in_range = valid & (d2 < cutoff * cutoff)

        d2_safe = jnp.where(in_range, d2, 1.0)
        dij = jnp.sqrt(d2_safe)

        sig_ij = pi[..., 1][:, :, None] + pj[..., 1][:, None, :]
        eps_ij = pi[..., 2][:, :, None] * pj[..., 2][:, None, :]
        eps_eff = jnp.where(in_range, eps_ij, 0.0)
        lj = jnp.where(eps_eff != 0, lennard_jones(dij, sig_ij, eps_eff), 0.0)

        qij = jnp.where(in_range, pi[..., 0][:, :, None] * pj[..., 0][:, None, :], 0.0)
        es = switched_direct_space_pme(dij, qij, beta, cutoff)
        es = jnp.where(in_range, es, 0.0)

        return acc + jnp.sum(lj + es), None

    total, _ = jax.lax.scan(chunk_energy, jnp.asarray(0.0, conf.dtype), (row_chunks, col_chunks))
    return 0.5 * total, overflow


class CellListOverflow(RuntimeError):
    pass


def nonbonded_all_pairs_tiled(conf, params, box, beta, cutoff, atom_mask=None, padding=0.2, grid_dims=None, capacity=None):
    """Drop-in O(N) replacement for the dense all-pairs energy. If grid_dims/
    capacity are not given they must be derivable from a concrete box —
    configure the potential with `configure_tiled(pot, box)` before jit."""
    if grid_dims is None or capacity is None:
        box_concrete = np.asarray(jax.core.concrete_or_error(None, box, "tiled nonbonded needs static grid dims"))
        grid_dims = choose_grid(np.diagonal(box_concrete), cutoff)
        capacity = choose_capacity(conf.shape[0], grid_dims)
    energy, _overflow = nonbonded_cell_list_energy(
        conf, params, box, tuple(grid_dims), int(capacity), float(beta), float(cutoff), atom_mask
    )
    return energy
