"""Fused nonbonded tile kernel (Pallas/TPU): the production MD hot path.

TPU-native redesign of the reference's warp-per-tile CUDA kernel
(k_nonbonded.cuh:330-432 `k_nonbonded_unified` + neighborlist.cu block
bounds): atoms are spatially sorted and grouped into 128-atom blocks (the TPU
lane width); block bounding boxes cull non-interacting block pairs into a
padded per-row-block neighbor list; one Pallas program computes a full
128x128 pair tile — 4D-lifted distances with minimum image, LJ +
switched-erfc Coulomb energy, analytic forces, AND du/dp — in a single fused
pass (no separate backward sweep: jax.grad of the energy reuses the stashed
analytic gradients via custom_vjp).

Data layout: one (8, N_pad) f32 array per system snapshot —
rows [x, y, z, w, q, sig/2, sqrt_eps, valid] — so every tile is an aligned
(8, 128) f32 TPU tile. Forces/du-dp accumulate into an (8, N_pad) output
revisited across the neighbor-slot grid dimension.

The tile list is SYMMETRIC (both (A,B) and (B,A) present), so each block
accumulates its own atoms' forces with no cross-tile scatter — pair math is
evaluated twice (energy halved), trading 2x VPU flops for scatter-free
accumulation, the right trade on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
_SQRT_PI = 1.7724538509055159
SWITCH_CUTOFF = 1.2  # pinned, matching ops/nonbonded.py


def _min_image(d, box_dim):
    return d - box_dim * jnp.floor(d / box_dim + 0.5)


def _erfc_poly(x):
    """erfc for x >= 0, Abramowitz & Stegun 7.1.26 rational approximation
    (|abs err| <= 1.5e-7 — below f32 resolution of the downstream energies).
    Mosaic has no native erfc lowering."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * jnp.exp(-x * x)


def _pair_terms(r2, dw, qq, sig, eps, beta, cutoff, mask, compute_dp: bool):
    """Shared pair math on (B, B) tiles, optimized for the VPU: one exp, one
    rsqrt, no integer powers of r. Returns (e, de_dr_over_r, dp_terms) where
    dp_terms = (dU/d(qq) per-pair, dLJ/d(eps_ij), dLJ/d(sig_ij)) or None."""
    r2 = jnp.where(mask, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r
    inv_r2 = inv_r * inv_r

    # LJ (no sqrt needed: t6 from r2 directly)
    s2 = sig * sig * inv_r2
    t6 = s2 * s2 * s2
    t12 = t6 * t6
    eps4 = 4.0 * eps
    e_lj = eps4 * (t12 - t6)
    dlj_r = eps4 * inv_r2 * (6.0 * t6 - 12.0 * t12)

    # switch: u8 = (r2/c^2)^4
    inv_c2 = 1.0 / (SWITCH_CUTOFF * SWITCH_CUTOFF)
    v = r2 * inv_c2
    v2 = v * v
    u8 = v2 * v2
    half_pi_u8 = (0.5 * jnp.pi) * u8
    cosu = jnp.cos(half_pi_u8)
    cos2 = cosu * cosu
    sinu = jnp.sqrt(jnp.maximum(1.0 - cos2, 0.0))  # u in [0, pi/2] within cutoff
    in_sw = r < SWITCH_CUTOFF
    sw = jnp.where(in_sw, cos2 * cosu, 0.0)
    # dsw/dr = -12 pi (r^7/c^8) cos^2 sin = -12 pi u8 inv_r cos^2 sin
    dsw_dr = jnp.where(in_sw, -12.0 * jnp.pi * u8 * inv_r * cos2 * sinu, 0.0)

    # erfc via A&S 7.1.26 (shares the single exp with the derivative)
    x = beta * r
    gauss = jnp.exp(-x * x)
    tt = 1.0 / (1.0 + 0.3275911 * x)
    erfc_bar = gauss * tt * (
        0.254829592 + tt * (-0.284496736 + tt * (1.421413741 + tt * (-1.453152027 + tt * 1.061405429)))
    )
    s_r = erfc_bar * inv_r
    ds_dr = (-2.0 * beta / _SQRT_PI) * gauss * inv_r - erfc_bar * inv_r2
    e_es = qq * s_r * sw
    des_r = qq * (ds_dr * sw + s_r * dsw_dr) * inv_r

    e = jnp.where(mask, e_lj + e_es, 0.0)
    de_r = jnp.where(mask, dlj_r + des_r, 0.0)

    if not compute_dp:
        return e, de_r, None

    s_es = jnp.where(mask, s_r * sw, 0.0)
    d_eps_pair = jnp.where(mask, 4.0 * (t12 - t6), 0.0)
    sig_safe = jnp.where(sig > 0, sig, 1.0)
    d_sig_pair = jnp.where(mask & (eps != 0), eps4 * (12.0 * t12 - 6.0 * t6) / sig_safe, 0.0)
    return e, de_r, (s_es, d_eps_pair, d_sig_pair)


def _nb_tile_kernel(
    row_ids_ref,  # (T,) int32, scalar prefetch: row block index per tile
    col_ids_ref,  # (T,) int32, scalar prefetch
    tile_valid_ref,  # (T,) int32, scalar prefetch
    row_ref,  # (8, BLOCK)
    col_ref,  # (8, BLOCK)
    scal_ref,  # (1, 8) SMEM: box_x, box_y, box_z, beta, cutoff, n_real
    out_ref,  # (8, BLOCK): u, fx, fy, fz, dq, dsig, deps, dw
    *,
    compute_dp: bool,
):
    t = pl.program_id(0)
    i = row_ids_ref[t]
    first_of_row = jnp.logical_or(t == 0, row_ids_ref[jnp.maximum(t - 1, 0)] != i)

    @pl.when(first_of_row)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(tile_valid_ref[t] > 0)
    def _():
        c = col_ids_ref[t]
        box_x = scal_ref[0, 0]
        box_y = scal_ref[0, 1]
        box_z = scal_ref[0, 2]
        beta = scal_ref[0, 3]
        cutoff = scal_ref[0, 4]

        row = row_ref[:, :]
        col = col_ref[:, :]

        def outer(a, b):
            return a.reshape(BLOCK, 1) - b.reshape(1, BLOCK)

        dx = _min_image(outer(row[0], col[0]), box_x)
        dy = _min_image(outer(row[1], col[1]), box_y)
        dz = _min_image(outer(row[2], col[2]), box_z)
        dw = outer(row[3], col[3])
        r2 = dx * dx + dy * dy + dz * dz + dw * dw

        qq = row[4].reshape(BLOCK, 1) * col[4].reshape(1, BLOCK)
        sig = row[5].reshape(BLOCK, 1) + col[5].reshape(1, BLOCK)
        eps = row[6].reshape(BLOCK, 1) * col[6].reshape(1, BLOCK)

        row_ids = i * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
        col_ids = c * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
        pair_valid = (row[7].reshape(BLOCK, 1) > 0) & (col[7].reshape(1, BLOCK) > 0)
        mask = pair_valid & (row_ids != col_ids) & (r2 < cutoff * cutoff)

        e, de_r, dp = _pair_terms(r2, dw, qq, sig, eps, beta, cutoff, mask, compute_dp)

        if compute_dp:
            s_es, d_eps_pair, d_sig_pair = dp
            dq = jnp.sum(col[4].reshape(1, BLOCK) * s_es, axis=1)
            dsig = jnp.sum(d_sig_pair, axis=1)
            deps = jnp.sum(col[6].reshape(1, BLOCK) * d_eps_pair, axis=1)
            dwp = jnp.sum(de_r * dw, axis=1)
            zeros = jnp.zeros((BLOCK,), jnp.float32)
            contrib = jnp.stack([zeros, zeros, zeros, zeros, dq, dsig, deps, dwp], axis=0)
        else:
            u_row = 0.5 * jnp.sum(e, axis=1)
            fx = jnp.sum(de_r * dx, axis=1)
            fy = jnp.sum(de_r * dy, axis=1)
            fz = jnp.sum(de_r * dz, axis=1)
            zeros = jnp.zeros((BLOCK,), jnp.float32)
            contrib = jnp.stack([u_row, fx, fy, fz, zeros, zeros, zeros, zeros], axis=0)

        out_ref[:, :] = out_ref[:, :] + contrib


@partial(jax.jit, static_argnames=("n_tiles", "compute_dp", "interpret"))
def nb_tiles_fused(atom_data, row_ids, col_ids, tile_valid, scalars, n_tiles: int, compute_dp: bool = False, interpret: bool = False):
    """atom_data: (8, nB*BLOCK) sorted rows [x y z w q sig eps valid];
    flat tile list (row_ids, col_ids, tile_valid), sorted by row_ids with
    every block present at least once (so every output block is initialized).
    Returns (8, nB*BLOCK): [u_atom, dU/dx(3), 0...] (compute_dp=False) or
    [0..., dU/dq, dU/dsig, dU/deps, dU/dw] (compute_dp=True)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, BLOCK), lambda t, rows, cols, val: (0, rows[t])),
            pl.BlockSpec((8, BLOCK), lambda t, rows, cols, val: (0, cols[t])),
            pl.BlockSpec((1, 8), lambda t, rows, cols, val: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, BLOCK), lambda t, rows, cols, val: (0, rows[t])),
    )
    return pl.pallas_call(
        partial(_nb_tile_kernel, compute_dp=compute_dp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(atom_data.shape, jnp.float32),
        interpret=interpret,
    )(row_ids, col_ids, tile_valid, atom_data, atom_data, scalars)


@partial(jax.jit, static_argnames=("block", "max_tiles", "cell_size"))
def build_block_tiles(conf, params, box, cutoff, block: int = BLOCK, max_tiles: int = 8192, cell_size: float = 0.65):
    """Spatial sort (snake order) + block bounding boxes + FLAT compacted
    symmetric block-pair tile list (grouped by row block, every block present
    at least once via the diagonal).

    Returns (atom_data (8, Npad) f32 sorted, pad_order (Npad,) int32,
    row_ids (T,), col_ids (T,), tile_valid (T,) int32, overflow int32)."""
    n = conf.shape[0]
    n_pad = -(-n // block) * block
    n_blocks = n_pad // block

    box_diag = jnp.diagonal(box)
    # boustrophedon ("snake") cell traversal: a continuous space-filling path
    # with no long jumps, so consecutive atoms — and hence 128-atom blocks —
    # stay spatially compact (the same role as the reference's Hilbert sort,
    # hilbert_sort.cu, with a much cheaper in-XLA key)
    dims = jnp.maximum(jnp.floor(box_diag / cell_size).astype(jnp.int32), 1)
    frac = conf[:, :3] / box_diag
    frac = frac - jnp.floor(frac)
    cxyz = jnp.minimum((frac * dims).astype(jnp.int32), dims - 1)
    cx, cy, cz = cxyz[:, 0], cxyz[:, 1], cxyz[:, 2]
    ky = jnp.where(cz % 2 == 0, cy, dims[1] - 1 - cy)
    row_parity = (cz * dims[1] + ky) % 2
    kx = jnp.where(row_parity == 0, cx, dims[0] - 1 - cx)
    snake = (cz * dims[1] + ky) * dims[0] + kx
    order = jnp.argsort(snake).astype(jnp.int32)

    # sorted + padded atom data; padding rows: valid=0, coords=0, params=0
    pad_order = jnp.concatenate([order, jnp.zeros(n_pad - n, dtype=jnp.int32)])
    wrapped = conf[:, :3] - box_diag * jnp.floor(conf[:, :3] / box_diag)
    xyz = wrapped[pad_order].T  # (3, Npad)
    w = params[pad_order, 3][None, :]
    q = params[pad_order, 0][None, :]
    sig = params[pad_order, 1][None, :]
    eps = params[pad_order, 2][None, :]
    valid = jnp.concatenate([jnp.ones(n), jnp.zeros(n_pad - n)])[None, :]
    atom_data = jnp.concatenate([xyz, w, q, sig, eps, valid], axis=0).astype(jnp.float32)

    # block bounding boxes over wrapped coords
    xyz_blocks = atom_data[:3].reshape(3, n_blocks, block)
    vmask = atom_data[7].reshape(1, n_blocks, block) > 0
    big = jnp.asarray(1e9, jnp.float32)
    bb_min = jnp.min(jnp.where(vmask, xyz_blocks, big), axis=2)  # (3, nB)
    bb_max = jnp.max(jnp.where(vmask, xyz_blocks, -big), axis=2)
    centers = 0.5 * (bb_min + bb_max)
    halves = 0.5 * (bb_max - bb_min)

    # periodic interval distance between blocks, per dim
    dc = centers[:, :, None] - centers[:, None, :]
    dc = dc - box_diag[:, None, None] * jnp.floor(dc / box_diag[:, None, None] + 0.5)
    gap = jnp.maximum(jnp.abs(dc) - (halves[:, :, None] + halves[:, None, :]), 0.0)
    d2 = jnp.sum(gap * gap, axis=0)  # (nB, nB)
    has_valid = jnp.any(vmask[0], axis=1)
    interacting = (d2 < cutoff * cutoff) & has_valid[:, None] & has_valid[None, :]
    # keep the diagonal for every block so every output block gets initialized
    interacting = interacting | jnp.eye(n_blocks, dtype=bool)

    inter_flat = interacting.reshape(-1)
    n_tiles_real = jnp.sum(inter_flat)
    overflow = jnp.maximum(n_tiles_real - max_tiles, 0)

    # compact: interacting tiles first, preserving (row, col) order
    big_key = n_blocks * n_blocks
    flat_idx = jnp.arange(n_blocks * n_blocks)
    keys = jnp.where(inter_flat, flat_idx, big_key + flat_idx)
    sorted_idx = jnp.argsort(keys)[:max_tiles]
    rows = (sorted_idx // n_blocks).astype(jnp.int32)
    cols = (sorted_idx % n_blocks).astype(jnp.int32)
    tile_valid = (jnp.arange(max_tiles) < n_tiles_real).astype(jnp.int32)
    # park invalid tail tiles on the last row so they never re-init a row
    row_ids = jnp.where(tile_valid > 0, rows, n_blocks - 1)
    col_ids = jnp.where(tile_valid > 0, cols, 0)

    return atom_data, pad_order, row_ids, col_ids, tile_valid, overflow


def _prep(conf, params, box, beta, cutoff, max_tiles):
    atom_data, pad_order, row_ids, col_ids, tile_valid, overflow = build_block_tiles(
        jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32), cutoff,
        max_tiles=max_tiles,
    )
    n = conf.shape[0]
    scalars = jnp.concatenate(
        [jnp.diagonal(jnp.asarray(box, jnp.float32)), jnp.asarray([beta, cutoff, n], jnp.float32), jnp.zeros(2, jnp.float32)]
    ).reshape(1, 8)
    inv = jnp.zeros(n, dtype=jnp.int32).at[pad_order[:n]].set(jnp.arange(n, dtype=jnp.int32))
    return atom_data, row_ids, col_ids, tile_valid, scalars, inv, overflow


def _run_uf(conf, params, box, beta, cutoff, max_tiles, interpret):
    """One fused pass: total energy + dU/dx (the MD hot path)."""
    atom_data, row_ids, col_ids, tile_valid, scalars, inv, overflow = _prep(conf, params, box, beta, cutoff, max_tiles)
    out = nb_tiles_fused(atom_data, row_ids, col_ids, tile_valid, scalars, max_tiles, compute_dp=False, interpret=interpret)
    u = jnp.sum(out[0])
    # transpose-then-row-gather: lane-dimension gathers are pathologically
    # slow on TPU (~20 ms at 23k atoms); row gathers after transpose are free
    du_dx = out.T[inv, 1:4]
    return u, du_dx, overflow


def _run_dp(conf, params, box, beta, cutoff, max_tiles, interpret):
    """Separate pass for dU/dp (dead-code-eliminated by XLA when the
    parameter cotangent is unused, e.g. in the MD loop)."""
    atom_data, row_ids, col_ids, tile_valid, scalars, inv, _ = _prep(conf, params, box, beta, cutoff, max_tiles)
    out = nb_tiles_fused(atom_data, row_ids, col_ids, tile_valid, scalars, max_tiles, compute_dp=True, interpret=interpret)
    return out.T[inv, 4:8]  # (n, 4)


def make_nonbonded_pallas(beta: float, cutoff: float, max_tiles: int = 8192, interpret: bool = False):
    """Returns energy_fn(conf, params, box) with custom VJP: the forward runs
    ONE fused tile pass producing energy + analytic dU/dx (stashed as
    residuals); the backward is a trivial scale for dU/dx, and dU/dp comes
    from a second dp-only tile pass that XLA dead-code-eliminates whenever the
    parameter cotangent is unused (i.e. in the MD hot loop). Box cotangent is
    zero (the virial is not produced, matching the reference CUDA kernels
    which emit only du/dx, du/dp, u)."""

    @jax.custom_vjp
    def energy(conf, params, box):
        u, _, _ = _run_uf(conf, params, box, beta, cutoff, max_tiles, interpret)
        return u

    def fwd(conf, params, box):
        u, du_dx, _ = _run_uf(conf, params, box, beta, cutoff, max_tiles, interpret)
        return u, (du_dx, conf, params, box)

    def bwd(res, g):
        du_dx, conf, params, box = res
        du_dp = _run_dp(conf, params, box, beta, cutoff, max_tiles, interpret)
        return g * du_dx, g * du_dp, jnp.zeros_like(box)

    energy.defvjp(fwd, bwd)
    return energy


def make_nonbonded_pallas_energy_force(beta: float, cutoff: float, max_tiles: int = 8192, interpret: bool = False):
    """(conf, params, box) -> (u, force) in ONE fused tile pass — the MD hot
    path (force = -dU/dx). Use this from integrators; use
    make_nonbonded_pallas for autodiff paths."""

    def energy_and_force(conf, params, box):
        u, du_dx, _ = _run_uf(conf, params, box, beta, cutoff, max_tiles, interpret)
        return u, -du_dx

    return energy_and_force


def nonbonded_pallas_overflow(conf, params, box, beta, cutoff, max_tiles):
    """Host-side check: number of tiles beyond the static budget (rebuild
    with a larger max_tiles if > 0)."""
    _, _, _, _, _, _, overflow = _prep(conf, params, box, beta, cutoff, max_tiles)
    return int(overflow)


def suggest_max_tiles(conf, box, cutoff, block: int = BLOCK, margin: float = 1.3) -> int:
    """Host-side: measure the actual interacting-tile count and pad with
    margin (headroom for diffusion between rebuild checks)."""
    n_blocks = -(-conf.shape[0] // block)
    _, _, _, _, tile_valid, _ = build_block_tiles(
        jnp.asarray(conf, jnp.float32),
        jnp.zeros((conf.shape[0], 4), jnp.float32),
        jnp.asarray(box, jnp.float32),
        cutoff,
        max_tiles=n_blocks * n_blocks,
    )
    count = int(np.asarray(tile_valid).sum())
    cap = int(np.ceil(count * margin / 128) * 128)
    return min(max(cap, 128), n_blocks * n_blocks)
