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

_HILBERT_BITS = 7  # 128^3 grid, same resolution as ref hilbert_sort.hpp:9-37
_hilbert_lut_cache: dict = {}


def _hilbert_distance_3d(x, y, z, bits: int):
    """Skilling transpose algorithm (vectorized numpy): grid coords ->
    Hilbert curve index. Used to build the host-side LUT once per process
    (the analog of the reference's vendored hilbert.cpp LUT)."""
    X = [x.astype(np.uint64).copy(), y.astype(np.uint64).copy(), z.astype(np.uint64).copy()]
    n = 3
    M = np.uint64(1) << np.uint64(bits - 1)
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            cond = (X[i] & Q) != 0
            X[0] = np.where(cond, X[0] ^ P, X[0])
            t = np.where(cond, np.uint64(0), (X[0] ^ X[i]) & P)
            X[0] = X[0] ^ t
            X[i] = X[i] ^ t
        Q >>= np.uint64(1)
    for i in range(1, n):
        X[i] = X[i] ^ X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > np.uint64(1):
        t = np.where((X[n - 1] & Q) != 0, t ^ (Q - np.uint64(1)), t)
        Q >>= np.uint64(1)
    for i in range(n):
        X[i] = X[i] ^ t
    d = np.zeros_like(X[0])
    for b in range(bits):
        for i in range(n):
            bit = (X[i] >> np.uint64(b)) & np.uint64(1)
            d |= bit << np.uint64(b * n + (n - 1 - i))
    return d


def hilbert_lut(bits: int = _HILBERT_BITS) -> np.ndarray:
    """(2^bits)^3 LUT: linear cell index (x-major) -> Hilbert index (int32)."""
    if bits not in _hilbert_lut_cache:
        g = np.arange(1 << bits)
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        d = _hilbert_distance_3d(xx.ravel(), yy.ravel(), zz.ravel(), bits)
        _hilbert_lut_cache[bits] = d.astype(np.int32)
    return _hilbert_lut_cache[bits]


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


_es_poly_cache: dict = {}


def es_switch_poly_coeffs(beta: float, cutoff: float, deg: int = 12):
    """Chebyshev coefficients (domain u = r/cutoff in [0, 1]) of the smooth
    switched-erfc factor h(u) = erfc(beta*cutoff*u) * cos^3((pi/2) u^8) and
    its derivative h'(u). Fitted once per (beta, cutoff) on the host; max
    fit error ~2e-6 (h) / ~7e-4 abs (h'), below f32 force noise at MD scale.

    Replaces the exp+cos+sqrt+divide transcendental chain in the pair kernel
    with two Clenshaw evaluations — the VPU-friendly formulation."""
    key = (float(beta), float(cutoff), deg)
    if key not in _es_poly_cache:
        from scipy.special import erfc as _erfc

        u = np.linspace(0.0, 1.0, 4001)
        bc = beta * cutoff
        h = _erfc(bc * u) * np.cos(np.pi / 2 * u**8) ** 3
        dh = (
            -2.0 * bc / np.sqrt(np.pi) * np.exp(-((bc * u) ** 2)) * np.cos(np.pi / 2 * u**8) ** 3
            + _erfc(bc * u) * 3.0 * np.cos(np.pi / 2 * u**8) ** 2 * (-np.sin(np.pi / 2 * u**8)) * (np.pi / 2 * 8 * u**7)
        )
        ch = np.polynomial.chebyshev.Chebyshev.fit(u, h, deg, domain=[0.0, 1.0])
        chp = np.polynomial.chebyshev.Chebyshev.fit(u, dh, deg, domain=[0.0, 1.0])
        _es_poly_cache[key] = (tuple(float(x) for x in ch.coef), tuple(float(x) for x in chp.coef))
    return _es_poly_cache[key]


def _clenshaw(t2, coeffs):
    """Chebyshev series at t in [-1, 1] given t2 = 2 t; coeffs static floats
    (unrolled: ~1 FMA + 1 sub per term on the VPU)."""
    b1 = jnp.zeros_like(t2)
    b2 = jnp.zeros_like(t2)
    for ck in coeffs[:0:-1]:
        b1, b2 = t2 * b1 - b2 + ck, b1
    return 0.5 * t2 * b1 - b2 + coeffs[0]


def _pair_terms(r2, dw, qq, sig, eps, beta, cutoff, mask, compute_dp: bool, es_coeffs=None):
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

    if es_coeffs is not None:
        # polynomial switched-erfc: E_es = qq h(u)/r with u = r/cutoff and
        # h, h' as static Chebyshev series (see es_switch_poly_coeffs) —
        # no exp/cos/sqrt/divide on the hot path
        h_coeffs, hp_coeffs = es_coeffs
        inv_c = 1.0 / SWITCH_CUTOFF
        t2 = 2.0 * (2.0 * (r * inv_c) - 1.0)  # Clenshaw takes 2t
        h_val = _clenshaw(t2, h_coeffs)
        hp_val = _clenshaw(t2, hp_coeffs)
        # no in-switch select needed: the final `mask` (r < cutoff) zeroes
        # out-of-range pairs, and cutoff == SWITCH_CUTOFF is asserted
        s_es_base = h_val * inv_r  # = erfc(beta r) sw / r
        e_es = qq * s_es_base
        des_r = qq * inv_r2 * (hp_val * inv_c - h_val * inv_r)
        s_r_sw = s_es_base  # for du/dq
    else:
        # exact path: switch cos^3((pi/2)(r/c)^8) and erfc via A&S 7.1.26
        inv_c2 = 1.0 / (SWITCH_CUTOFF * SWITCH_CUTOFF)
        v = r2 * inv_c2
        v2 = v * v
        u8 = v2 * v2
        half_pi_u8 = (0.5 * jnp.pi) * u8
        cosu = jnp.cos(half_pi_u8)
        cos2 = cosu * cosu
        sinu = jnp.sqrt(jnp.maximum(1.0 - cos2, 0.0))  # u in [0, pi/2] within cutoff
        # no in-switch select: the final `mask` (r < cutoff) zeroes
        # out-of-range pairs (cutoff == SWITCH_CUTOFF pinned)
        sw = cos2 * cosu
        # dsw/dr = -12 pi (r^7/c^8) cos^2 sin = -12 pi u8 inv_r cos^2 sin
        dsw_dr = -12.0 * jnp.pi * u8 * inv_r * cos2 * sinu

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
        s_r_sw = s_r * sw

    e = jnp.where(mask, e_lj + e_es, 0.0)
    de_r = jnp.where(mask, dlj_r + des_r, 0.0)

    if not compute_dp:
        return e, de_r, None

    s_es = jnp.where(mask, s_r_sw, 0.0)
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
    es_coeffs=None,
    cb: int = 1,
    compute_u: bool = True,
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
        CBT = BLOCK * cb  # column-tile width

        def outer(a, b):
            return a.reshape(BLOCK, 1) - b.reshape(1, CBT)

        dx = _min_image(outer(row[0], col[0]), box_x)
        dy = _min_image(outer(row[1], col[1]), box_y)
        dz = _min_image(outer(row[2], col[2]), box_z)
        dw = outer(row[3], col[3])
        r2 = dx * dx + dy * dy + dz * dz + dw * dw

        qq = row[4].reshape(BLOCK, 1) * col[4].reshape(1, CBT)
        sig = row[5].reshape(BLOCK, 1) + col[5].reshape(1, CBT)
        eps = row[6].reshape(BLOCK, 1) * col[6].reshape(1, CBT)

        row_ids = i * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, CBT), 0)
        col_ids = c * CBT + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, CBT), 1)
        pair_valid = (row[7].reshape(BLOCK, 1) > 0) & (col[7].reshape(1, CBT) > 0)
        mask = pair_valid & (row_ids != col_ids) & (r2 < cutoff * cutoff)

        e, de_r, dp = _pair_terms(r2, dw, qq, sig, eps, beta, cutoff, mask, compute_dp, es_coeffs)

        if compute_dp:
            s_es, d_eps_pair, d_sig_pair = dp
            dq = jnp.sum(col[4].reshape(1, CBT) * s_es, axis=1)
            dsig = jnp.sum(d_sig_pair, axis=1)
            deps = jnp.sum(col[6].reshape(1, CBT) * d_eps_pair, axis=1)
            dwp = jnp.sum(de_r * dw, axis=1)
            zeros = jnp.zeros((BLOCK,), jnp.float32)
            contrib = jnp.stack([zeros, zeros, zeros, zeros, dq, dsig, deps, dwp], axis=0)
        else:
            zeros = jnp.zeros((BLOCK,), jnp.float32)
            u_row = 0.5 * jnp.sum(e, axis=1) if compute_u else zeros
            fx = jnp.sum(de_r * dx, axis=1)
            fy = jnp.sum(de_r * dy, axis=1)
            fz = jnp.sum(de_r * dz, axis=1)
            contrib = jnp.stack([u_row, fx, fy, fz, zeros, zeros, zeros, zeros], axis=0)

        out_ref[:, :] = out_ref[:, :] + contrib


@partial(jax.jit, static_argnames=("n_tiles", "compute_dp", "interpret", "es_coeffs", "cb", "compute_u"))
def nb_tiles_fused(atom_data, row_ids, col_ids, tile_valid, scalars, n_tiles: int, compute_dp: bool = False, interpret: bool = False, es_coeffs=None, cb: int = 1, compute_u: bool = True):
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
            pl.BlockSpec((8, BLOCK * cb), lambda t, rows, cols, val: (0, cols[t])),
            pl.BlockSpec((1, 8), lambda t, rows, cols, val: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, BLOCK), lambda t, rows, cols, val: (0, rows[t])),
    )
    return pl.pallas_call(
        partial(_nb_tile_kernel, compute_dp=compute_dp, es_coeffs=es_coeffs, cb=cb, compute_u=compute_u),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(atom_data.shape, jnp.float32),
        interpret=interpret,
    )(row_ids, col_ids, tile_valid, atom_data, atom_data, scalars)


def _nb_tile_kernel_vmem(
    row_ids_ref,  # (T,) int32, scalar prefetch
    col_ids_ref,  # (T,) int32, scalar prefetch
    tile_valid_ref,  # (T,) int32, scalar prefetch
    atom_ref,  # (8, Npad) — whole sorted atom array, resident in VMEM
    scal_ref,  # (1, 8) SMEM
    out_ref,  # (8, Npad) — whole output, resident in VMEM
    *,
    compute_dp: bool,
    es_coeffs=None,
    cb: int = 1,
    compute_u: bool = True,
):
    """VMEM-resident variant: atom data and outputs live in VMEM for the
    whole grid; row/col tiles are dynamic 128-aligned in-register slices.
    Removes the per-grid-step HBM block DMAs that bound the blocked variant
    (~8 KB/step x ~8k steps serialized at DMA latency)."""
    t = pl.program_id(0)
    i = row_ids_ref[t]

    @pl.when(t == 0)
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
        CBT = BLOCK * cb

        row = atom_ref[:, pl.ds(i * BLOCK, BLOCK)]
        col = atom_ref[:, pl.ds(c * CBT, CBT)]

        def outer(a, b):
            return a.reshape(BLOCK, 1) - b.reshape(1, CBT)

        dx = _min_image(outer(row[0], col[0]), box_x)
        dy = _min_image(outer(row[1], col[1]), box_y)
        dz = _min_image(outer(row[2], col[2]), box_z)
        dw = outer(row[3], col[3])
        r2 = dx * dx + dy * dy + dz * dz + dw * dw

        qq = row[4].reshape(BLOCK, 1) * col[4].reshape(1, CBT)
        sig = row[5].reshape(BLOCK, 1) + col[5].reshape(1, CBT)
        eps = row[6].reshape(BLOCK, 1) * col[6].reshape(1, CBT)

        row_ids = i * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, CBT), 0)
        col_ids = c * CBT + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, CBT), 1)
        pair_valid = (row[7].reshape(BLOCK, 1) > 0) & (col[7].reshape(1, CBT) > 0)
        mask = pair_valid & (row_ids != col_ids) & (r2 < cutoff * cutoff)

        e, de_r, dp = _pair_terms(r2, dw, qq, sig, eps, beta, cutoff, mask, compute_dp, es_coeffs)

        if compute_dp:
            s_es, d_eps_pair, d_sig_pair = dp
            dq = jnp.sum(col[4].reshape(1, CBT) * s_es, axis=1)
            dsig = jnp.sum(d_sig_pair, axis=1)
            deps = jnp.sum(col[6].reshape(1, CBT) * d_eps_pair, axis=1)
            dwp = jnp.sum(de_r * dw, axis=1)
            zeros = jnp.zeros((BLOCK,), jnp.float32)
            contrib = jnp.stack([zeros, zeros, zeros, zeros, dq, dsig, deps, dwp], axis=0)
        else:
            zeros = jnp.zeros((BLOCK,), jnp.float32)
            u_row = 0.5 * jnp.sum(e, axis=1) if compute_u else zeros
            fx = jnp.sum(de_r * dx, axis=1)
            fy = jnp.sum(de_r * dy, axis=1)
            fz = jnp.sum(de_r * dz, axis=1)
            contrib = jnp.stack([u_row, fx, fy, fz, zeros, zeros, zeros, zeros], axis=0)

        cur = out_ref[:, pl.ds(i * BLOCK, BLOCK)]
        out_ref[:, pl.ds(i * BLOCK, BLOCK)] = cur + contrib


@partial(jax.jit, static_argnames=("n_tiles", "compute_dp", "interpret", "es_coeffs", "cb", "compute_u"))
def nb_tiles_fused_vmem(atom_data, row_ids, col_ids, tile_valid, scalars, n_tiles: int, compute_dp: bool = False, interpret: bool = False, es_coeffs=None, cb: int = 1, compute_u: bool = True):
    """VMEM-resident tile sweep (see _nb_tile_kernel_vmem). Fits systems up
    to ~1M atoms (atom_data + out = 64 B/atom of VMEM)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(atom_data.shape, lambda t, rows, cols, val: (0, 0)),
            pl.BlockSpec((1, 8), lambda t, rows, cols, val: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(atom_data.shape, lambda t, rows, cols, val: (0, 0)),
    )
    return pl.pallas_call(
        partial(_nb_tile_kernel_vmem, compute_dp=compute_dp, es_coeffs=es_coeffs, cb=cb, compute_u=compute_u),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(atom_data.shape, jnp.float32),
        interpret=interpret,
    )(row_ids, col_ids, tile_valid, atom_data, scalars)


@partial(jax.jit, static_argnames=("block", "max_tiles", "cell_size", "cb"))
def build_block_tiles(conf, params, box, cutoff, block: int = BLOCK, max_tiles: int = 8192, cell_size: float = 0.65, cb: int = 1, atom_mask=None):
    """Spatial sort (snake order) + block bounding boxes + FLAT compacted
    symmetric block-pair tile list (grouped by row block, every block present
    at least once via the diagonal).

    Returns (atom_data (8, Npad) f32 sorted, pad_order (Npad,) int32,
    row_ids (T,), col_ids (T,), tile_valid (T,) int32, overflow int32)."""
    n = conf.shape[0]
    n_pad = -(-n // (block * cb)) * (block * cb)
    n_blocks = n_pad // block  # row blocks
    n_cols = n_pad // (block * cb)  # column super-blocks (cb x wider)

    box_diag = jnp.diagonal(box)
    # boustrophedon ("snake") cell traversal: a continuous space-filling path
    # with no long jumps, so consecutive atoms — and hence 128-atom blocks —
    # stay spatially compact (the same role as the reference's Hilbert sort,
    # hilbert_sort.cu, with a much cheaper in-XLA key).
    #
    # Measured counter-intuitive result (23k-atom water, cutoff 1.2): a true
    # Hilbert order (hilbert_lut above) makes blocks compact CUBES
    # (1.2^3 nm) yet produces MORE interacting tiles (14356) than the snake
    # slabs (2.6 x 0.9 x 0.7 nm -> 11590): at BLOCK=128 the box is only a
    # few block-plus-cutoff units wide and anisotropic slabs have a smaller
    # Minkowski cross-section per block. The Hilbert LUT is kept for smaller
    # block sizes, where compactness wins.
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
    if atom_mask is None:
        valid_atoms = jnp.ones(n)
    else:
        # static atom subset (ref nonbonded_all_pairs.hpp:27): excluded atoms
        # are invalid rows/cols — they join no tiles and no pairs
        valid_atoms = jnp.asarray(atom_mask, jnp.float32)
    valid = jnp.concatenate([valid_atoms[pad_order[:n]], jnp.zeros(n_pad - n)])[None, :]
    atom_data = jnp.concatenate([xyz, w, q, sig, eps, valid], axis=0).astype(jnp.float32)

    # block bounding boxes over wrapped coords
    xyz_blocks = atom_data[:3].reshape(3, n_blocks, block)
    vmask = atom_data[7].reshape(1, n_blocks, block) > 0
    big = jnp.asarray(1e9, jnp.float32)
    bb_min = jnp.min(jnp.where(vmask, xyz_blocks, big), axis=2)  # (3, nB)
    bb_max = jnp.max(jnp.where(vmask, xyz_blocks, -big), axis=2)
    centers = 0.5 * (bb_min + bb_max)
    halves = 0.5 * (bb_max - bb_min)

    # column super-block bounding boxes (cb row-blocks wide)
    if cb == 1:
        cmin, cmax = bb_min, bb_max
    else:
        cmin = jnp.min(bb_min.reshape(3, n_cols, cb), axis=2)
        cmax = jnp.max(bb_max.reshape(3, n_cols, cb), axis=2)
    ccenters = 0.5 * (cmin + cmax)
    chalves = 0.5 * (cmax - cmin)

    # periodic interval distance row-block x col-super-block
    dc = centers[:, :, None] - ccenters[:, None, :]
    dc = dc - box_diag[:, None, None] * jnp.floor(dc / box_diag[:, None, None] + 0.5)
    gap = jnp.maximum(jnp.abs(dc) - (halves[:, :, None] + chalves[:, None, :]), 0.0)
    d2 = jnp.sum(gap * gap, axis=0)  # (nB, nC)
    has_valid = jnp.any(vmask[0], axis=1)
    col_has_valid = jnp.any(has_valid.reshape(n_cols, cb), axis=1)
    interacting = (d2 < cutoff * cutoff) & has_valid[:, None] & col_has_valid[None, :]
    # keep each row's own column super-block so every output block inits
    own_col = jnp.arange(n_blocks) // cb
    interacting = interacting | (jnp.arange(n_cols)[None, :] == own_col[:, None])

    inter_flat = interacting.reshape(-1)
    n_tiles_real = jnp.sum(inter_flat)
    overflow = jnp.maximum(n_tiles_real - max_tiles, 0)

    # compact: interacting tiles first, preserving (row, col) order
    big_key = n_blocks * n_cols
    flat_idx = jnp.arange(n_blocks * n_cols)
    keys = jnp.where(inter_flat, flat_idx, big_key + flat_idx)
    take = min(max_tiles, n_blocks * n_cols)
    sorted_idx = jnp.argsort(keys)[:take]
    rows = (sorted_idx // n_cols).astype(jnp.int32)
    cols = (sorted_idx % n_cols).astype(jnp.int32)
    if take < max_tiles:  # budget exceeds the total tile count: pad the tail
        rows = jnp.concatenate([rows, jnp.zeros(max_tiles - take, jnp.int32)])
        cols = jnp.concatenate([cols, jnp.zeros(max_tiles - take, jnp.int32)])
    tile_valid = (jnp.arange(max_tiles) < n_tiles_real).astype(jnp.int32)
    # park invalid tail tiles on the last row so they never re-init a row
    row_ids = jnp.where(tile_valid > 0, rows, n_blocks - 1)
    col_ids = jnp.where(tile_valid > 0, cols, 0)

    return atom_data, pad_order, row_ids, col_ids, tile_valid, overflow


def _prep(conf, params, box, beta, cutoff, max_tiles, cb=1, atom_mask=None):
    atom_data, pad_order, row_ids, col_ids, tile_valid, overflow = build_block_tiles(
        jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32), cutoff,
        max_tiles=max_tiles, cb=cb, atom_mask=atom_mask,
    )
    n = conf.shape[0]
    scalars = jnp.concatenate(
        [jnp.diagonal(jnp.asarray(box, jnp.float32)), jnp.asarray([beta, cutoff, n], jnp.float32), jnp.zeros(2, jnp.float32)]
    ).reshape(1, 8)
    inv = jnp.zeros(n, dtype=jnp.int32).at[pad_order[:n]].set(jnp.arange(n, dtype=jnp.int32))
    return atom_data, row_ids, col_ids, tile_valid, scalars, inv, overflow


def _run_uf(conf, params, box, beta, cutoff, max_tiles, interpret, es_coeffs=None, cb=1, atom_mask=None):
    """One fused pass: total energy + dU/dx (the MD hot path)."""
    atom_data, row_ids, col_ids, tile_valid, scalars, inv, overflow = _prep(conf, params, box, beta, cutoff, max_tiles, cb=cb, atom_mask=atom_mask)
    out = nb_tiles_fused(atom_data, row_ids, col_ids, tile_valid, scalars, max_tiles, compute_dp=False, interpret=interpret, es_coeffs=es_coeffs, cb=cb)
    u = jnp.sum(out[0])
    # transpose-then-row-gather: lane-dimension gathers are pathologically
    # slow on TPU (~20 ms at 23k atoms); row gathers after transpose are free
    du_dx = out.T[inv, 1:4]
    return u, du_dx, overflow


def _run_dp(conf, params, box, beta, cutoff, max_tiles, interpret, cb=1, atom_mask=None):
    """Separate pass for dU/dp (dead-code-eliminated by XLA when the
    parameter cotangent is unused, e.g. in the MD loop)."""
    atom_data, row_ids, col_ids, tile_valid, scalars, inv, _ = _prep(conf, params, box, beta, cutoff, max_tiles, cb=cb, atom_mask=atom_mask)
    out = nb_tiles_fused(atom_data, row_ids, col_ids, tile_valid, scalars, max_tiles, compute_dp=True, interpret=interpret, cb=cb)
    return out.T[inv, 4:8]  # (n, 4)


def make_nonbonded_pallas(beta: float, cutoff: float, max_tiles: int = 8192, interpret: bool = False, cb: int = 1, atom_mask=None):
    """Returns energy_fn(conf, params, box) with custom VJP: the forward runs
    ONE fused tile pass producing energy + analytic dU/dx (stashed as
    residuals); the backward is a trivial scale for dU/dx, and dU/dp comes
    from a second dp-only tile pass that XLA dead-code-eliminates whenever the
    parameter cotangent is unused (i.e. in the MD hot loop). Box cotangent is
    zero (the virial is not produced, matching the reference CUDA kernels
    which emit only du/dx, du/dp, u)."""

    @jax.custom_vjp
    def energy(conf, params, box):
        u, _, _ = _run_uf(conf, params, box, beta, cutoff, max_tiles, interpret, cb=cb, atom_mask=atom_mask)
        return u

    def fwd(conf, params, box):
        u, du_dx, _ = _run_uf(conf, params, box, beta, cutoff, max_tiles, interpret, cb=cb, atom_mask=atom_mask)
        return u, (du_dx, conf, params, box)

    def bwd(res, g):
        du_dx, conf, params, box = res
        du_dp = _run_dp(conf, params, box, beta, cutoff, max_tiles, interpret, cb=cb, atom_mask=atom_mask)
        return g * du_dx, g * du_dp, jnp.zeros_like(box)

    energy.defvjp(fwd, bwd)
    return energy


def make_nonbonded_pallas_energy_force(
    beta: float, cutoff: float, max_tiles: int = 8192, interpret: bool = False, es: str = "exact", cb: int = 1,
    atom_mask=None,
):
    """(conf, params, box) -> (u, force) in ONE fused tile pass — the MD hot
    path (force = -dU/dx). Use this from integrators; use
    make_nonbonded_pallas for autodiff paths.

    es="poly" (default) evaluates the switched-erfc electrostatics as static
    Chebyshev series (es_switch_poly_coeffs; ~2e-6 energy / ~7e-4 abs force
    deviation from exact — below f32 noise at MD force scales) instead of the
    exp+cos transcendental chain; es="exact" keeps the analytic form."""
    es_coeffs = None
    if es == "poly":
        assert cutoff == SWITCH_CUTOFF, "poly electrostatics pins cutoff == SWITCH_CUTOFF"
        es_coeffs = es_switch_poly_coeffs(beta, cutoff)

    def energy_and_force(conf, params, box):
        u, du_dx, _ = _run_uf(conf, params, box, beta, cutoff, max_tiles, interpret, es_coeffs=es_coeffs, cb=cb, atom_mask=atom_mask)
        return u, -du_dx

    return energy_and_force


def _assemble_atom_data(conf, params, box, pad_order, n, atom_mask=None):
    """Sorted (8, Npad) atom data from current coords with a CACHED sort
    order — the cheap per-step part of the tile build."""
    box_diag = jnp.diagonal(box)
    n_pad = pad_order.shape[0]
    wrapped = conf[:, :3] - box_diag * jnp.floor(conf[:, :3] / box_diag)
    xyz = wrapped[pad_order].T
    w = params[pad_order, 3][None, :]
    q = params[pad_order, 0][None, :]
    sig = params[pad_order, 1][None, :]
    eps = params[pad_order, 2][None, :]
    valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
    if atom_mask is not None:
        pad_mask = jnp.concatenate([jnp.asarray(atom_mask, jnp.float32), jnp.zeros(n_pad - n)])
        valid = valid * pad_mask[pad_order]
    return jnp.concatenate([xyz, w, q, sig, eps, valid[None, :]], axis=0).astype(jnp.float32)


def make_nonbonded_pallas_md(
    beta: float,
    cutoff: float,
    max_tiles: int = 8192,
    skin: float = 0.1,
    rebuild_interval: int = 20,
    interpret: bool = False,
    cb: int = 1,
    atom_mask=None,
):
    """Stateful MD force provider with an amortized tile rebuild.

    The tile list is culled at cutoff + skin and reused for rebuild_interval
    steps (the kernel's per-pair mask still applies the exact cutoff, so a
    stale list is correct as long as no atom moves more than skin/2 between
    rebuilds — at 2.5 fs steps water atoms move ~0.01 nm per 20 steps,
    far under the 0.05 nm budget). This removes the per-step sort/bbox/
    compaction cost (~3 ms at 23k atoms), the analog of the reference's
    displacement-triggered neighborlist rebuild (k_nonbonded.cuh:12-56).

    Returns (init_fn, apply_fn):
      init_fn(conf, params, box) -> state
      apply_fn(state, conf, params, box, t) -> (u, force, state')
    """

    def _build_state(conf, params, box):
        atom_data, pad_order, row_ids, col_ids, tile_valid, overflow = build_block_tiles(
            jnp.asarray(conf, jnp.float32),
            jnp.asarray(params, jnp.float32),
            jnp.asarray(box, jnp.float32),
            cutoff + skin,
            max_tiles=max_tiles,
            cb=cb,
            atom_mask=atom_mask,
        )
        n = conf.shape[0]
        inv = jnp.zeros(n, dtype=jnp.int32).at[pad_order[:n]].set(jnp.arange(n, dtype=jnp.int32))
        return (pad_order, inv, row_ids, col_ids, tile_valid, overflow)

    def init_fn(conf, params, box):
        return _build_state(conf, params, box)

    def apply_fn(state, conf, params, box, t):
        state = jax.lax.cond(
            (t % rebuild_interval) == 0,
            lambda: _build_state(conf, params, box),
            lambda: state,
        )
        pad_order, inv, row_ids, col_ids, tile_valid, overflow = state
        n = conf.shape[0]
        atom_data = _assemble_atom_data(
            jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32), pad_order, n,
            atom_mask=atom_mask,
        )
        scalars = jnp.concatenate(
            [
                jnp.diagonal(jnp.asarray(box, jnp.float32)),
                jnp.asarray([beta, cutoff, n], jnp.float32),
                jnp.zeros(2, jnp.float32),
            ]
        ).reshape(1, 8)
        # force-only: the Context discards u on integrator steps; energy
        # comes from __call__/custom_vjp when movers need it
        out = nb_tiles_fused(
            atom_data, row_ids, col_ids, tile_valid, scalars, max_tiles, compute_dp=False, interpret=interpret,
            cb=cb, compute_u=False,
        )
        u = jnp.sum(out[0])  # zero by construction
        force = -out.T[inv, 1:4]
        return u, force, state

    return init_fn, apply_fn


def nonbonded_pallas_overflow(conf, params, box, beta, cutoff, max_tiles):
    """Host-side check: number of tiles beyond the static budget (rebuild
    with a larger max_tiles if > 0)."""
    _, _, _, _, _, _, overflow = _prep(conf, params, box, beta, cutoff, max_tiles)
    return int(overflow)


def suggest_max_tiles(conf, box, cutoff, block: int = BLOCK, margin: float = 1.3, cb: int = 1, atom_mask=None) -> int:
    """Host-side: measure the actual interacting-tile count and pad with
    margin (headroom for diffusion between rebuild checks)."""
    n_blocks = -(-conf.shape[0] // (block * cb)) * cb
    n_cols = n_blocks // cb
    _, _, _, _, tile_valid, _ = build_block_tiles(
        jnp.asarray(conf, jnp.float32),
        jnp.zeros((conf.shape[0], 4), jnp.float32),
        jnp.asarray(box, jnp.float32),
        cutoff,
        max_tiles=n_blocks * n_cols,
        cb=cb,
        atom_mask=atom_mask,
    )
    count = int(np.asarray(tile_valid).sum())
    cap = int(np.ceil(count * margin / 128) * 128)
    return min(max(cap, 128), n_blocks * n_cols)
