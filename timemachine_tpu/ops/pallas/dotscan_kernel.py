"""Dotscan nonbonded kernel (Pallas/TPU) — MXU-assisted rowscan variant, v5.

Same (32-row x 128-col) Newton-triangular tile decomposition, snake sort and
tile builder as rowscan_kernel.py, but the per-slot VPU work is restructured
so the three densest pieces of the pair math ride the (otherwise idle) MXU:

* image shifts relative to the row-chunk center: each ROW atom is mapped to
  its image nearest the (periodic, largest-gap) chunk center once per grid
  step, and each COLUMN atom once per tile (3 rounds on (1, 128) vectors,
  amortized over the 32 rows) — after which displacements subtract directly,
  and the 9-op/slot per-pair minimum-image rounding disappears. Soundness
  needs only the ROW-side bound max periodic row half-extent + cutoff <
  box/2 per axis (`dotscan_valid`, rechecked every rebuild by
  build_dotscan_tiles; out-of-image pairs always measure >= box/2 >= cutoff,
  so they can only be excluded, never wrongly included). Column-chunk
  extents don't enter — unlike a tile-constant shift, which 128-atom chunks
  can't support — so the tighter-culling snake sort stays usable.
* squared distances via the dot identity  r^2 = |xi|^2 + |xj'|^2 - 2 xi.xj'
  with the cross term as ONE (32, 8) @ (8, 128) MXU matmul per tile over the
  [x y z w] rows (the 4D lifted coordinate rides along for free). Both sides
  are expressed in the row-center frame (center quantized to 1e-4 nm and
  scalar-prefetched so rows and columns subtract the IDENTICAL value),
  bounding |x_local| by ~(cutoff + extents), so the f32 cancellation error
  in r^2 stays ~1e-6 absolute — forces agree with the direct-difference
  rowscan kernel to ~1e-5 relative. The MD force path tolerates this; ENERGY
  paths (barostat / MC movers / HREX U_kl) stay on the rowscan kernel, whose
  polynomial ES cancels exclusion corrections bitwise-consistently (see
  potentials.Nonbonded.configure_pallas).
* force accumulation without per-slot multiply-adds: with G = de_r the
  (32, 128) force-factor tile,
      row side:  F_i = xi' * sum_j G - sum_j G xj'    (G contracted with
                 [xj', 1] over lanes — one MXU op per tile, accumulated)
      col side:  F_j = xj' * sum_i G - sum_i G xi'    ([xi', 1] contracted
                 with G over sublanes — one MXU op per tile)
  the rank-1 corrections are amortized (32,)/(1, 128) vector work; the
  3x 32-sublane reductions the rowscan kernel pays per tile disappear.

Reference parity: identical physics to rowscan_kernel.py (LJ with
Lorentz-Berthelot on [q, sigma/2, sqrt(eps), w] rows, 4D lifted distance,
switched-erfc Coulomb as the same Chebyshev pair h/P — coefficients shared
via es_energy_force_series). The CUDA analog is k_nonbonded.cuh:330-432;
there the warp shuffle plays the role the MXU contraction plays here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timemachine_tpu.ops.pallas.rowscan_kernel import (
    _horner,
    build_rowscan_tiles,
    es_energy_force_series,
)
from timemachine_tpu.ops.pallas.rowscan_kernel import (
    suggest_max_pairs as _suggest_max_pairs_sorted,
)


def suggest_max_pairs(conf, box, cutoff, margin: float = 1.3, atom_mask=None, triangular: bool = False, sort: str = "snake") -> int:
    """Tile census sizing for dotscan. Snake by default, matching
    build_dotscan_tiles: with periodic (largest-gap) row centers the image
    bound holds for snake row chunks too, and the snake census is measured
    12-17% tighter than Hilbert's on production systems (ARCHITECTURE.md)."""
    return _suggest_max_pairs_sorted(
        conf, box, cutoff, margin=margin, atom_mask=atom_mask, triangular=triangular, sort=sort
    )

ROW = 32
UNROLL = 4
COL = 128
CEN_SCALE = 1e-4  # row-center quantization (nm per int unit)

DOT_PREC = jax.lax.Precision.HIGHEST  # f32-accurate MXU passes


def _dotscan_kernel(
    row_base_ref,  # (1,) int32 scalar prefetch: global row-chunk offset
    row_start_ref,  # (nR,) int32 scalar prefetch: offset into col_ids
    row_count_ref,  # (nR,) int32 scalar prefetch: neighbor chunk count
    col_ids_ref,  # (T,) int32 scalar prefetch: flat column chunk ids
    rcen_ref,  # (nR*4,) int32 scalar prefetch: row centers, 1e-4 nm units
    rowT_ref,  # (ROW, 8) block: this row chunk, transposed atom data
    atoms_ref,  # (nC, 8, COL) whole array, VMEM resident (chunk-major)
    scal_ref,  # (1, 8) SMEM: box_x, box_y, box_z, cutoff, 0...
    out_ref,  # (ROW, 8) block: [u, fx, fy, fz, 0, 0, 0, 0]
    out_cols_ref=None,  # triangular only: (8, Npad) whole, RMW across grid
    *,
    h_coeffs,
    p_coeffs,
    compute_u: bool,
    triangular: bool = False,
    dot_r2: bool = True,
):
    i = pl.program_id(0)
    start = row_start_ref[i]
    count = row_count_ref[i]

    if triangular:
        @pl.when(i == 0)
        def _():
            out_cols_ref[:, :] = jnp.zeros_like(out_cols_ref)

    box_x = scal_ref[0, 0]
    box_y = scal_ref[0, 1]
    box_z = scal_ref[0, 2]
    cutoff = scal_ref[0, 3]
    cut2 = cutoff * cutoff
    inv_bx = 1.0 / box_x
    inv_by = 1.0 / box_y
    inv_bz = 1.0 / box_z
    inv_c = 1.0 / 1.2  # SWITCH_CUTOFF pinned, matching rowscan
    k1 = 2.0 * inv_c  # t = 2u - 1 = k1*r + k0
    k0 = -1.0

    # row-chunk center (scalars; columns shift to the image nearest it)
    cx = rcen_ref[4 * i].astype(jnp.float32) * CEN_SCALE
    cy = rcen_ref[4 * i + 1].astype(jnp.float32) * CEN_SCALE
    cz = rcen_ref[4 * i + 2].astype(jnp.float32) * CEN_SCALE
    cxb = cx * inv_bx
    cyb = cy * inv_by
    czb = cz * inv_bz

    rowT = rowT_ref[:, :]  # (ROW, 8) [x y z w q s e 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    ex = (lane == 0).astype(jnp.float32)
    ey = (lane == 1).astype(jnp.float32)
    ez = (lane == 2).astype(jnp.float32)
    e_one = (lane == 4).astype(jnp.float32)
    dmask = (lane < 4).astype(jnp.float32)
    cvec = cx * ex + cy * ey + cz * ez  # (1, 8)
    # map each ROW atom to its image nearest the chunk center too: chunks
    # that straddle a periodic boundary (any real fluid at production box
    # sizes) would otherwise put |x_local| ~ box and break both the r^2
    # cancellation bound and the image-soundness argument. One round per
    # row atom per grid step — amortized over the whole column loop.
    bvec = box_x * ex + box_y * ey + box_z * ez  # (1, 8); zero in w lane
    ivec = inv_bx * ex + inv_by * ey + inv_bz * ez
    raw = (rowT - cvec) * dmask
    rowD = raw - bvec * jax.lax.round(raw * ivec)  # (ROW, 8) [xl yl zl w 0...]
    rowD1 = rowD + e_one  # ones in slot 4: contracting it gives sum_i G
    rn2 = jnp.sum(rowD * rowD, axis=1, keepdims=True)  # (ROW, 1) incl. w^2

    q_i = rowT[:, 4:5]
    s_i = rowT[:, 5:6]
    e_i = rowT[:, 6:7]

    if triangular:
        # Newton gate pieces hoisted out of the tile loop: per tile only the
        # scalar column base shifts the row ids (gate = row_gid' < col_iota)
        row_gid = jnp.float32((row_base_ref[0] + i) * ROW) + jax.lax.broadcasted_iota(
            jnp.int32, (ROW, 1), 0
        ).astype(jnp.float32)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, COL), 1).astype(jnp.float32)

    ones_c = jnp.ones((1, COL), jnp.float32)
    zeros3_c = jnp.zeros((3, COL), jnp.float32)

    def one_col(cid, acc):
        accG, acc_u = acc
        col = atoms_ref[cid]  # (8, COL) [x y z w q s e 0]
        # image of each column atom nearest the row center, in the
        # row-center frame: xj' = xj - c + box * round((c - xj) / box)
        xs = (col[0:1] - cx) + box_x * jax.lax.round(cxb - col[0:1] * inv_bx)
        ys = (col[1:2] - cy) + box_y * jax.lax.round(cyb - col[1:2] * inv_by)
        zs = (col[2:3] - cz) + box_z * jax.lax.round(czb - col[2:3] * inv_bz)
        colD = jnp.concatenate([xs, ys, zs, col[3:4], ones_c, zeros3_c], axis=0)
        if compute_u or not dot_r2:
            # ENERGY mode (and the dot_r2=False probe variant): direct
            # differences on the shifted columns (exact f32 subtraction — the
            # per-atom image shift already did the minimum-image work), so
            # the polynomial ES cancels exclusion corrections to f32 rounding
            # like the rowscan kernel. The dot_r2 force path instead trades
            # these 11 ops/slot for one MXU matmul, accepting ~1e-6 absolute
            # r^2 cancellation error.
            dx = rowD[:, 0:1] - xs
            dy = rowD[:, 1:2] - ys
            dz = rowD[:, 2:3] - zs
            dw = rowD[:, 3:4] - col[3:4]
            r2 = dx * dx + dy * dy + dz * dz + dw * dw
        else:
            csq = colD * colD
            cn2 = (csq[0:1] + csq[1:2]) + (csq[2:3] + csq[3:4])  # (1, COL) incl. w^2
            cross = jax.lax.dot_general(
                rowD, colD, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=DOT_PREC,
            )  # (ROW, COL) = xi'.xj' (slot-4 row of rowD is zero: ones row drops)
            r2 = (rn2 - 2.0 * cross) + cn2

        r2s = jnp.maximum(r2, 1e-8)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r

        qq = q_i * col[4].reshape(1, COL)
        sg = s_i + col[5].reshape(1, COL)
        e4 = e_i * col[6].reshape(1, COL)

        s2 = sg * sg * inv_r2
        t6 = s2 * s2 * s2
        t12 = t6 * t6
        flj = e4 * inv_r2 * (6.0 * t6 - 12.0 * t12)

        r = r2s * inv_r
        t = k1 * r + k0
        p = _horner(t, p_coeffs)
        inv_r3 = inv_r * inv_r2
        fes = qq * p * inv_r3

        # self-pair gate: the dot-identity r^2 carries ~1e-6 absolute f32
        # cancellation error, so a self-pair's "zero" can land above 1e-7 and
        # leak inf/NaN forces — use a 1e-5 floor there (no physical pair sits
        # below r = 0.0032 nm); the exact-difference branches keep 1e-7.
        self_eps = 1e-7 if (compute_u or not dot_r2) else 1e-5
        gate = (r2 < cut2) & (r2 > self_eps)
        if triangular:
            gate = gate & ((row_gid - jnp.float32(cid * COL)) < col_iota)
        g_tile = jnp.where(gate, flj + fes, 0.0)  # (ROW, COL)

        # row-side force pieces: accG += G contracted with [xj' 1] over lanes
        accG = accG + jax.lax.dot_general(
            g_tile, colD, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=DOT_PREC,
        )  # (ROW, 8): [sumG.xs, sumG.ys, sumG.zs, sumG.w, sumG, 0, 0, 0]

        if triangular:
            # col-side reaction: cf = [xi' 1] contracted with G over sublanes
            cf = jax.lax.dot_general(
                rowD1, g_tile, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=DOT_PREC,
            )  # (8, COL): [sumG.xl, sumG.yl, sumG.zl, sumG.w, sumG, 0, 0, 0]
            react = colD * cf[4:5] - cf  # rows 0..2: -sum_i G (xi'-xj')
            cur = out_cols_ref[:, pl.ds(cid * COL, COL)]
            out_cols_ref[:, pl.ds(cid * COL, COL)] = cur + react

        if compute_u:
            h = _horner(t, h_coeffs)
            e_pair = e4 * (t12 - t6) + qq * h * inv_r
            acc_u = acc_u + jnp.where(gate, e_pair, 0.0)
        return accG, acc_u

    def body(jj, acc):
        j = UNROLL * jj
        for k in range(UNROLL):
            acc = one_col(col_ids_ref[start + j + k], acc)
        return acc

    if compute_u:
        init_u = jnp.zeros((ROW, COL), jnp.float32)
    else:
        init_u = jnp.zeros((ROW, 1), jnp.float32)
    init = (jnp.zeros((ROW, 8), jnp.float32), init_u)
    if triangular:
        # build_rowscan_tiles no longer lists the covering (diagonal) tile in
        # triangular mode — process it unconditionally, like the rowscan peel
        # (clamped for fake rows past the real chunks; q = eps = 0 there)
        init = one_col(jnp.minimum((row_base_ref[0] + i) * ROW // COL, atoms_ref.shape[0] - 1), init)
    accG, acc_u = jax.lax.fori_loop(
        0, (count + UNROLL - 1) // UNROLL, body, init
    )

    # F_i = xi' * sumG - sumG.xj'   (per-dim; (ROW,) rank-1 assembly)
    sumG = accG[:, 4]
    fx = rowD[:, 0] * sumG - accG[:, 0]
    fy = rowD[:, 1] * sumG - accG[:, 1]
    fz = rowD[:, 2] * sumG - accG[:, 2]
    if compute_u:
        u = jnp.sum(acc_u, axis=1)
        if not triangular:
            u = 0.5 * u
    else:
        u = jnp.zeros((ROW,), jnp.float32)
    z = jnp.zeros((ROW,), jnp.float32)
    out_ref[:, :] = jnp.stack([u, fx, fy, fz, z, z, z, z], axis=1)


def _dotscan_call(
    atomsT,
    atoms_cm,
    row_start,
    row_count,
    col_ids,
    rcen_q,
    scalars,
    n_rows: int,
    *,
    row_base=None,
    h_coeffs,
    p_coeffs,
    compute_u: bool,
    interpret: bool,
    triangular: bool,
    dot_r2: bool = True,
):
    n_chunks = atoms_cm.shape[0]
    n_pad = n_chunks * COL
    n_row_atoms = n_rows * ROW
    if row_base is None:
        row_base = jnp.zeros((1,), jnp.int32)
    in_specs = [
        pl.BlockSpec((ROW, 8), lambda i, rb, rs, rc, ci, ce: (i, 0)),
        pl.BlockSpec((n_chunks, 8, COL), lambda i, rb, rs, rc, ci, ce: (0, 0, 0)),
        pl.BlockSpec((1, 8), lambda i, rb, rs, rc, ci, ce: (0, 0), memory_space=pltpu.SMEM),
    ]
    if not triangular:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_rows,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ROW, 8), lambda i, rb, rs, rc, ci, ce: (i, 0)),
        )
        out_rows = pl.pallas_call(
            partial(_dotscan_kernel, h_coeffs=h_coeffs, p_coeffs=p_coeffs, compute_u=compute_u, dot_r2=dot_r2),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_row_atoms, 8), jnp.float32),
            interpret=interpret,
        )(row_base, row_start, row_count, col_ids, rcen_q, atomsT, atoms_cm, scalars)
        return out_rows, None
    grid_spec_tri = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_rows,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ROW, 8), lambda i, rb, rs, rc, ci, ce: (i, 0)),
            pl.BlockSpec((8, n_pad), lambda i, rb, rs, rc, ci, ce: (0, 0)),
        ],
    )
    out_rows, out_cols = pl.pallas_call(
        partial(_dotscan_kernel, h_coeffs=h_coeffs, p_coeffs=p_coeffs, compute_u=compute_u, triangular=True, dot_r2=dot_r2),
        grid_spec=grid_spec_tri,
        out_shape=[
            jax.ShapeDtypeStruct((n_row_atoms, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(row_base, row_start, row_count, col_ids, rcen_q, atomsT, atoms_cm, scalars)
    return out_rows, out_cols


@partial(jax.jit, static_argnames=("n_rows", "max_pairs", "h_coeffs", "p_coeffs", "compute_u", "interpret", "triangular", "dot_r2"))
def dotscan_sweep(
    atoms8,
    atomsT,
    row_start,
    row_count,
    col_ids,
    rcen_q,
    scalars,
    n_rows: int,
    max_pairs: int,
    h_coeffs,
    p_coeffs,
    compute_u: bool = False,
    interpret: bool = False,
    triangular: bool = False,
    dot_r2: bool = True,
):
    """Returns (Npad, 8) f32: [u_atom, du/dx(3), 0...] in sorted order. In
    triangular mode both Newton-pair sides are included."""
    n_pad = atoms8.shape[1]
    n_chunks = n_pad // COL
    atoms_cm = atoms8.reshape(8, n_chunks, COL).transpose(1, 0, 2)
    out_rows, out_cols = _dotscan_call(
        atomsT, atoms_cm, row_start, row_count, col_ids, rcen_q, scalars, n_rows,
        h_coeffs=h_coeffs, p_coeffs=p_coeffs, compute_u=compute_u,
        interpret=interpret, triangular=triangular, dot_r2=dot_r2,
    )
    if out_cols is None:
        return out_rows
    return out_rows.at[:, 1:4].add(out_cols[0:3].T)


def _periodic_center_halfextent(xs, box_diag):
    """Per-chunk periodic center and half-extent, per axis.

    xs: (nR, ROW) wrapped positions along one axis; box_diag: scalar.
    The tight covering interval of a periodic point set is the complement
    of the LARGEST gap between circularly-sorted positions — a naive
    min/max reads ~box for any chunk that straddles the boundary (which
    real fluids always have), wrongly failing the image bound. Returns
    (center (nR,), half_extent (nR,)); center may exceed box (the kernel
    maps atoms to its nearest image, so only its residue matters)."""
    s = jnp.sort(xs, axis=1)  # (nR, ROW)
    inner = s[:, 1:] - s[:, :-1]  # (nR, ROW-1)
    wrap = (s[:, 0] + box_diag - s[:, -1])[:, None]
    gaps = jnp.concatenate([inner, wrap], axis=1)  # gap i follows s[i]
    gi = jnp.argmax(gaps, axis=1)  # (nR,)
    extent = box_diag - jnp.take_along_axis(gaps, gi[:, None], axis=1)[:, 0]
    # the covering interval starts at the element AFTER the largest gap —
    # s[(gi+1) % ROW] in both the wrap-gap (gi == ROW-1 -> s[0]) and
    # inner-gap cases — and spans `extent` (possibly past box; the kernel
    # only uses the center's residue)
    start = jnp.take_along_axis(s, ((gi + 1) % s.shape[1])[:, None], axis=1)[:, 0]
    return start + 0.5 * extent, 0.5 * extent


@partial(jax.jit, static_argnames=("max_pairs", "cell_size", "triangular", "sort", "with_ranks"))
def build_dotscan_tiles(conf, params, box, cutoff, max_pairs: int, cell_size: float = 0.65, atom_mask=None, triangular: bool = False, sort: str = "snake", with_ranks: bool = False):
    """Rowscan tile build (snake sort by default — its census is measured
    12-17% tighter than Hilbert's) + PERIODIC quantized row-chunk centers:
    each chunk's center/extent comes from the largest circular gap per
    axis, so chunks straddling the box boundary are handled exactly (both
    row and column atoms are mapped to the center's nearest image — the
    rows at kernel entry, the columns per tile).

    Returns (pad_order (Npad,) int32, row_start (nR,), row_count (nR,),
    col_ids (max_pairs,) int32, rcen_q (nR*4,) int32, invalid int32).
    `invalid` is nonzero when the tile list overflowed max_pairs OR the
    row-center image bound (max periodic row half-extent + cutoff < box/2)
    does not hold for this conf/box — either way the sweep would silently
    drop interactions, so callers must treat nonzero as a hard failure (the
    MD provider poisons forces with NaN, which the Context guard surfaces)."""
    built = build_rowscan_tiles(
        conf, params, box, cutoff, max_pairs=max_pairs, cell_size=cell_size, atom_mask=atom_mask,
        triangular=triangular, sort=sort, with_ranks=with_ranks,
    )
    pad_order, row_start, row_count, col_ids = built[:4]
    overflow = built[-1]
    n = conf.shape[0]
    n_pad = pad_order.shape[0]
    n_rows = n_pad // ROW
    box_diag = jnp.diagonal(box)
    wrapped = conf[:, :3] - box_diag * jnp.floor(conf[:, :3] / box_diag)
    xs = wrapped[pad_order].reshape(n_rows, ROW, 3)
    # padding entries duplicate real atoms (zero-width gaps) and masked
    # atoms only widen extents — both conservative for the bound
    cen_parts, hal_parts = [], []
    for ax in range(3):
        c, h = _periodic_center_halfextent(xs[:, :, ax], box_diag[ax])
        cen_parts.append(c)
        hal_parts.append(h)
    rcen = jnp.stack(cen_parts, axis=1)  # (nR, 3)
    rhal = jnp.stack(hal_parts, axis=1)
    rcen_q = jnp.round(rcen / CEN_SCALE).astype(jnp.int32)
    rcen_q = jnp.concatenate([rcen_q, jnp.zeros((n_rows, 1), jnp.int32)], axis=1).reshape(-1)
    # rebuild-time recheck of the image-mapping soundness bound: `cutoff`
    # here is the BUILD radius (bare cutoff + skin at the provider), so the
    # skin margin also covers diffusion between rebuilds of sweeps gated at
    # the bare cutoff. NPT box shrinkage or row-chunk stretching must fail
    # loudly, not silently exclude in-cutoff pairs.
    bound_bad = jnp.any(jnp.max(rhal, axis=0) + cutoff >= 0.5 * box_diag)
    invalid = overflow + bound_bad.astype(overflow.dtype)
    if with_ranks:
        return pad_order, row_start, row_count, col_ids, built[4], rcen_q, invalid
    return pad_order, row_start, row_count, col_ids, rcen_q, invalid


def dotscan_valid(conf, box, cutoff, headroom: float = 0.1, sort: str = "snake", cell_size: float = 0.65) -> bool:
    """Host-side soundness check of the row-center image mapping: an
    in-cutoff pair's true image equals its column atom's row-center image
    whenever max PERIODIC row half-extent + cutoff < box/2 per axis
    (out-of-image pairs then always measure >= box/2 >= cutoff and can only
    be excluded; the periodic extent — box minus the largest circular gap —
    handles chunks straddling the box boundary, which a naive min/max reads
    as ~box). Pass cutoff+skin when gating the MD provider (it builds tiles
    at that radius); `headroom` covers row-extent growth from diffusion
    between rebuilds (~skin). This is only the configure-time estimate on
    the initial conf; build_dotscan_tiles rechecks the bound at every
    rebuild and flags `invalid` when it fails."""
    conf = np.asarray(conf)
    n = conf.shape[0]
    box_diag = np.diagonal(np.asarray(box))
    if np.any(box_diag < 2.0 * cutoff):
        return False
    pad_order, *_ = build_rowscan_tiles(
        jnp.asarray(conf, jnp.float32),
        jnp.zeros((n, 4), jnp.float32),
        jnp.asarray(box, jnp.float32),
        cutoff,
        max_pairs=32,  # only pad_order is needed; overflow is irrelevant here
        cell_size=cell_size,  # the sort grid sets row-chunk extents — must match the provider's
        triangular=True,
        sort=sort,
    )
    wrapped = conf[:, :3] - box_diag * np.floor(conf[:, :3] / box_diag)
    xs = np.asarray(wrapped, np.float32)[np.asarray(pad_order)].reshape(-1, ROW, 3)
    ok = True
    for ax in range(3):
        _, rhal = _periodic_center_halfextent(jnp.asarray(xs[:, :, ax]), box_diag[ax])
        ok = ok and bool(np.max(np.asarray(rhal)) + cutoff + headroom < 0.5 * box_diag[ax])
    return ok


def _scalars(box, cutoff):
    return jnp.concatenate(
        [jnp.diagonal(jnp.asarray(box, jnp.float32)), jnp.asarray([cutoff], jnp.float32), jnp.zeros(4, jnp.float32)]
    ).reshape(1, 8)


def make_nonbonded_dotscan_md(
    beta: float,
    cutoff: float,
    max_pairs: int,
    skin: float = 0.1,
    rebuild_interval: int = 20,
    interpret: bool = False,
    atom_mask=None,
    triangular: bool = True,
    dot_r2: bool = True,
    sort: str = "snake",
):
    """Stateful MD force provider on the dotscan kernel (same contract as
    rowscan_kernel.make_nonbonded_rowscan_md; size max_pairs with THIS
    module's suggest_max_pairs at cutoff+skin and the SAME `sort` — snake
    culls 12-17% tighter, Hilbert keeps row chunks compact when the system
    is too sparse for snake's image bound; configure_pallas picks
    per-system via dotscan_valid). Tile overflow
    or an image-bound violation at rebuild time poisons forces with NaN
    (caught by the Context guard) instead of silently dropping pairs.
    Energy evaluations reuse
    the cached tiles exactly like the rowscan provider; note the dot-form
    r^2 carries ~1e-6 absolute f32 error, so callers that need the
    polynomial ES to cancel exclusion corrections bitwise (dense-path
    consistency) should keep energy paths on the rowscan kernel
    (potentials.py does)."""
    from timemachine_tpu.ops.pallas.rowscan_kernel import make_param_rows_fn, make_tile_md_provider

    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)

    def build_fn(conf, params, box):
        return build_dotscan_tiles(
            jnp.asarray(conf, jnp.float32),
            jnp.asarray(params, jnp.float32),
            jnp.asarray(box, jnp.float32),
            cutoff + skin,
            max_pairs=max_pairs,
            atom_mask=atom_mask,
            triangular=triangular,
            sort=sort,
        )

    def sweep_fn(tiles, atoms8, atomsT, box, compute_u):
        # compute_u is tri-valued at the provider layer (False / True /
        # "u_only" — rowscan_kernel's energy-only sweep). This kernel has no
        # energy-only fast path, so normalize to bool: "u_only" computes
        # (and discards) forces but still returns correct energies.
        compute_u = bool(compute_u)
        pad_order, row_start, row_count, col_ids, rcen_q, _ = tiles
        return dotscan_sweep(
            atoms8,
            atomsT,
            row_start,
            row_count,
            col_ids,
            rcen_q,
            _scalars(box, cutoff),
            n_rows=pad_order.shape[0] // ROW,
            max_pairs=max_pairs,
            h_coeffs=h_coeffs,
            p_coeffs=p_coeffs,
            compute_u=compute_u,
            interpret=interpret,
            triangular=triangular,
            dot_r2=dot_r2,
        )

    return make_tile_md_provider(build_fn, sweep_fn, make_param_rows_fn(atom_mask), rebuild_interval)
