"""Rowscan nonbonded kernel (Pallas/TPU) — production MD hot path, v2.

TPU-native replacement for the reference's warp-per-tile CUDA kernel
(k_nonbonded.cuh:330-432) with a different decomposition than
nonbonded_kernel.py (v1, kept for the exact/du-dp paths):

* grid = 32-atom row chunks (snake-sorted), one grid step per chunk;
* each grid step loops (lax.fori_loop, variable trip count from a
  scalar-prefetched per-row neighbor count) over that row's bbox-culled
  128-atom column chunks, sliced from a VMEM-resident (8, Npad) atom array —
  no per-tile HBM DMA, and the ~0.7 us/grid-step floor is amortized over
  ~50 column iterations;
* forces accumulate in registers as (32, 128) partial sums, reduced across
  lanes once per row chunk (not per tile);
* pair math is force-lean: the switched-erfc electrostatic force factor is a
  single polynomial P(u) = u h'(u) - h(u) derived EXACTLY (coefficient
  algebra, not a second fit) from the fitted energy series h(u) =
  erfc(beta c u) switch(u), so kernel force == exact gradient of kernel
  energy, and exclusion corrections computed with the same h cancel
  bitwise-consistently; both evaluate as monomial Horner in t = 2u - 1
  (1 fma/degree — half of Clenshaw — at the same f32 accuracy, see
  es_energy_force_series);
* no validity masks: padding atoms carry zero charge/epsilon so their
  contributions vanish arithmetically; the only select is the
  (r2 < cutoff^2) & (r2 > tiny) gate on the accumulated force factor.

The (32, 128) tile geometry measures ~25% fewer padded pair slots than v1's
(128, 256) at 23k atoms (row chunks of 32 snake-sorted atoms are compact
~cell-sized boxes instead of 2.6 nm slabs).

Reference parity: LJ with Lorentz-Berthelot on [q, sigma/2, sqrt(eps), w]
rows, 4D lifted distance, reaction-field switched-erfc Coulomb
(timemachine/potentials/nonbonded.py:221-339); tile culling mirrors
neighborlist.cu block bounds.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW = int(os.environ.get("TM_ROWSCAN_ROW", "32"))  # atoms per row chunk (culling granularity)
# column chunks per inner-loop iteration (builder pads to match); env knob is
# a probe surface only — builder and kernel read the same module constant
UNROLL = int(os.environ.get("TM_ROWSCAN_UNROLL", "4"))
COL = 128  # atoms per column chunk (inner loop iteration) == lane width
# row chunks processed per grid step: amortizes the fixed per-grid-step cost
# (block DMA + control) over RPB row chunks without changing the tile census.
# env knob is a probe surface only — builder and kernel read the same constant.
# Default 4: measured -2.8% sweep on DHFR vs 1, forces bitwise-identical
# (round-3 TPU session, ARCHITECTURE.md kernel A/B table).
RPB = int(os.environ.get("TM_ROWSCAN_RPB", "8"))  # r5 A/B: sweep 2.008->1.982 ms, apply -2.1% vs 4; 16/23 regress
SWITCH_CUTOFF = 1.2  # pinned, matching ops/nonbonded.py
CEN_SCALE = 1e-4  # row-center quantization (nm per int unit; preshift mode)

_poly_cache: dict = {}


def es_energy_force_series(beta: float, cutoff: float, deg: int = 10):
    """Monomial series in t = 2(r/cutoff) - 1 on [-1, 1] for

        h(u) = erfc(beta c u) * cos^3((pi/2) u^8)     [energy:  E = qq h(u)/r]
        P(u) = u h'(u) - h(u)                         [force:   dE/dr / r = qq P(u)/r^3]

    h is FIT (Chebyshev least squares in f64); P is derived from the fitted h
    by exact Chebyshev coefficient algebra (derivative + multiply-by-u), so
    the force is the exact analytic gradient of the polynomial energy. Both
    are then converted (exactly, in f64) to the MONOMIAL basis in t = 2u - 1:
    on that symmetric domain max|coef| < 1, so f32 Horner evaluates to
    ~1.6e-7 max abs error (measured vs the f64 Chebyshev reference — at or
    below Clenshaw's error) at HALF the op count (1 fma/degree vs 2)."""
    key = (float(beta), float(cutoff), deg)
    if key not in _poly_cache:
        from scipy.special import erfc as _erfc

        u = np.linspace(0.0, 1.0, 8001)
        bc = beta * cutoff
        h = _erfc(bc * u) * np.cos(np.pi / 2 * u**8) ** 3
        ch = np.polynomial.chebyshev.Chebyshev.fit(u, h, deg, domain=[0.0, 1.0])
        # work on [-1, 1] coefficients: u = (t + 1) / 2  =>  d/du = 2 d/dt
        c = ch.coef
        dc = np.polynomial.chebyshev.chebder(c) * 2.0  # h'(u) in t-basis
        # u * h'(u) = ((t + 1)/2) * h'(u): multiply by t via T-recurrence then average
        tc = np.polynomial.chebyshev.chebmulx(dc)  # t * h'
        n = max(len(c), len(tc) + 0)
        P = np.zeros(n)
        P[: len(tc)] += 0.5 * tc
        P[: len(dc)] += 0.5 * dc
        P[: len(c)] -= c
        mono_h = np.polynomial.chebyshev.cheb2poly(c)
        mono_P = np.polynomial.chebyshev.cheb2poly(P)
        _poly_cache[key] = (tuple(float(v) for v in mono_h), tuple(float(v) for v in mono_P))
    return _poly_cache[key]


def _horner(t, coeffs):
    """Monomial series at t in [-1, 1]; coeffs static floats, low->high."""
    acc = jnp.full_like(t, coeffs[-1])
    for ck in coeffs[-2::-1]:
        acc = acc * t + ck
    return acc


def _rowscan_kernel(
    *refs,
    # ref order: row_base (1,), row_start (nR,), row_count (nR,), col_ids (T,)
    # [, rcen (nR*4,) when preshift] — int32 scalar prefetch (row_base is the
    # global row-chunk offset of this shard: 0 single-device, d*nR_local when
    # the row axis shards over a mesh — the Newton gate needs GLOBAL ids;
    # rcen = quantized periodic row-chunk centers, 1e-4 nm units);
    # then rowT (ROW, 8) block, atoms (nC, 8, COL) whole VMEM-resident,
    # scal (1, 8) SMEM [box_x box_y box_z cutoff 0...],
    # out (ROW, 8) block [u fx fy fz 0...]
    # [, out_cols (8, Npad) whole, accumulated across the grid — triangular].
    h_coeffs,
    p_coeffs,
    compute_u: bool,
    triangular: bool = False,
    has_w: bool = True,
    preshift: bool = False,
    rpb: int = 1,
    u_only: bool = False,
):
    if preshift:
        row_base_ref, row_start_ref, row_count_ref, col_ids_ref, rcen_ref = refs[:5]
        rest = refs[5:]
    else:
        row_base_ref, row_start_ref, row_count_ref, col_ids_ref = refs[:4]
        rcen_ref = None
        rest = refs[4:]
    if triangular and not u_only:
        rowT_ref, atoms_ref, scal_ref, out_ref, out_cols_ref = rest
    else:
        rowT_ref, atoms_ref, scal_ref, out_ref = rest
        out_cols_ref = None

    gi = pl.program_id(0)

    if triangular and not u_only:
        # sequential grid on one TensorCore: zero the shared column-force
        # accumulator once, then read-modify-write it every tile
        @pl.when(gi == 0)
        def _():
            out_cols_ref[:, :] = jnp.zeros_like(out_cols_ref)

    box_x = scal_ref[0, 0]
    box_y = scal_ref[0, 1]
    box_z = scal_ref[0, 2]
    cutoff = scal_ref[0, 3]
    inv_bx = 1.0 / box_x
    inv_by = 1.0 / box_y
    inv_bz = 1.0 / box_z
    cut2 = cutoff * cutoff
    inv_c = 1.0 / SWITCH_CUTOFF
    k1 = 2.0 * inv_c  # t = 2u - 1 = k1*r + k0
    k0 = -1.0

    # rpb row chunks per grid step (unrolled): same tile census, 1/rpb the
    # per-grid-step fixed cost
    for p in range(rpb):
        _rowscan_row_chunk(
            gi * rpb + p,
            p,
            row_base_ref,
            row_start_ref,
            row_count_ref,
            col_ids_ref,
            rcen_ref,
            rowT_ref,
            atoms_ref,
            out_ref,
            out_cols_ref,
            box_x, box_y, box_z, inv_bx, inv_by, inv_bz, cut2, k1, k0,
            h_coeffs=h_coeffs,
            p_coeffs=p_coeffs,
            compute_u=compute_u,
            triangular=triangular,
            has_w=has_w,
            preshift=preshift,
            u_only=u_only,
        )


def _rowscan_row_chunk(
    i,  # global-within-shard row chunk index (traced)
    p,  # block-local chunk slot (python int)
    row_base_ref,
    row_start_ref,
    row_count_ref,
    col_ids_ref,
    rcen_ref,
    rowT_ref,
    atoms_ref,
    out_ref,
    out_cols_ref,
    box_x, box_y, box_z, inv_bx, inv_by, inv_bz, cut2, k1, k0,
    *,
    h_coeffs,
    p_coeffs,
    compute_u: bool,
    triangular: bool,
    has_w: bool,
    preshift: bool,
    u_only: bool = False,
):
    # u_only: energy-only sweep for MC-mover evaluations (barostat trial
    # volumes, exchange insertions, HREX U_kl rows) — skips the force
    # polynomial, the 3 force accumulators and, in triangular mode, the
    # (8, Npad) column-reaction read-modify-write, which together are
    # ~half the per-slot work of a full force+energy sweep.
    start = row_start_ref[i]
    count = row_count_ref[i]

    rowT = rowT_ref[p * ROW : (p + 1) * ROW, :]  # (ROW, 8)
    if preshift:
        # map each ROW atom to its image nearest the (periodic) chunk center
        # once per grid step; columns are imaged per tile on (1, COL) vectors
        # — the 9-op/slot per-pair minimum-image rounding disappears.
        # Soundness bound (rechecked every rebuild by build_dotscan_tiles):
        # max periodic row half-extent + cutoff < box/2 per axis.
        cx = rcen_ref[4 * i].astype(jnp.float32) * CEN_SCALE
        cy = rcen_ref[4 * i + 1].astype(jnp.float32) * CEN_SCALE
        cz = rcen_ref[4 * i + 2].astype(jnp.float32) * CEN_SCALE
        cxb = cx * inv_bx
        cyb = cy * inv_by
        czb = cz * inv_bz
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        ex = (lane == 0).astype(jnp.float32)
        ey = (lane == 1).astype(jnp.float32)
        ez = (lane == 2).astype(jnp.float32)
        cvec = cx * ex + cy * ey + cz * ez
        bvec = box_x * ex + box_y * ey + box_z * ez
        ivec = inv_bx * ex + inv_by * ey + inv_bz * ez
        rowT = rowT + bvec * jax.lax.round((cvec - rowT) * ivec)
    x_i = rowT[:, 0:1]
    y_i = rowT[:, 1:2]
    z_i = rowT[:, 2:3]
    w_i = rowT[:, 3:4]
    q_i = rowT[:, 4:5]
    s_i = rowT[:, 5:6]
    e_i = rowT[:, 6:7]

    zeros = jnp.zeros((ROW, COL), jnp.float32)

    if triangular:
        row_gid = jnp.float32((row_base_ref[0] + i) * ROW) + jax.lax.broadcasted_iota(jnp.int32, (ROW, 1), 0).astype(jnp.float32)

    def one_col(cid, acc, diag=False):
        # diag=True: the single tile whose column chunk CONTAINS this row
        # chunk (triangular mode) — the only tile needing the per-pair
        # Newton ordering gate. The builder excludes it from the per-row
        # lists; the kernel processes it once, peeled out of the loop, so
        # loop tiles run a bare r2 < cutoff^2 gate.
        acc_fx, acc_fy, acc_fz, acc_u = acc
        col = atoms_ref[cid]  # (8, COL), tile-aligned dynamic index

        if preshift:
            # image each column atom to the row center once per tile
            # ((1, COL) work, amortized over ROW) — differences are then
            # direct and exact, no per-pair rounding
            xj = col[0].reshape(1, COL)
            yj = col[1].reshape(1, COL)
            zj = col[2].reshape(1, COL)
            xj = xj + box_x * jax.lax.round((cxb - xj * inv_bx))
            yj = yj + box_y * jax.lax.round((cyb - yj * inv_by))
            zj = zj + box_z * jax.lax.round((czb - zj * inv_bz))
            dx = x_i - xj
            dy = y_i - yj
            dz = z_i - zj
        else:
            dx = x_i - col[0].reshape(1, COL)
            dy = y_i - col[1].reshape(1, COL)
            dz = z_i - col[2].reshape(1, COL)
            dx = dx - box_x * jax.lax.round(dx * inv_bx)
            dy = dy - box_y * jax.lax.round(dy * inv_by)
            dz = dz - box_z * jax.lax.round(dz * inv_bz)
        r2 = dx * dx + dy * dy + dz * dz
        if has_w:
            dw = w_i - col[3].reshape(1, COL)
            r2 = r2 + dw * dw

        r2s = jnp.maximum(r2, 1e-8)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r

        qq = q_i * col[4].reshape(1, COL)
        sg = s_i + col[5].reshape(1, COL)
        e4 = e_i * col[6].reshape(1, COL)  # rows store 2*sqrt(eps) => e4 = 4 eps_ij

        s2 = sg * sg * inv_r2
        t6 = s2 * s2 * s2
        # (e4 * t6) FIRST: padding-vs-padding pairs sit at r2 = 0 (clamped to
        # 1e-8) where t6^2 would overflow f32 — e4 = 0 zeroes the product
        # while every intermediate stays finite, so off-diagonal tiles need
        # no r2 > tiny gate
        et6 = e4 * t6
        r = r2s * inv_r
        t = k1 * r + k0
        if not u_only:
            # factored: de_r = (flj' + fes') * inv_r2 with
            #   flj' = et6 * (6 - 12 t6)        [LJ: dU/dr / r * r2]
            #   fes' = qq * P(t) * inv_r        [ES: qq P / r   * r2/r2 ...]
            # saves two multiplies per slot vs scaling each term by inv_r2/inv_r3
            flj = et6 * (6.0 - 12.0 * t6)
            p = _horner(t, p_coeffs)
            fes = qq * p * inv_r

        if triangular:
            gate = r2 < cut2
            if diag:
                # Newton's third law on the covering tile: order by sorted
                # global atom index (floats exact up to 2^24 atoms); also
                # excludes self pairs (r2 = 0)
                col_gid = jnp.float32(cid * COL) + jax.lax.broadcasted_iota(jnp.int32, (1, COL), 1).astype(jnp.float32)
                gate = gate & (row_gid < col_gid)
        else:
            # symmetric lists visit self pairs: the r2 > tiny gate kills them
            gate = (r2 < cut2) & (r2 > 1e-7)
        if not u_only:
            de_r = jnp.where(gate, (flj + fes) * inv_r2, 0.0)

            tx = de_r * dx
            ty = de_r * dy
            tz = de_r * dz
            acc_fx = acc_fx + tx
            acc_fy = acc_fy + ty
            acc_fz = acc_fz + tz
            if triangular:
                # column-side reaction forces, accumulated into the shared buffer
                zc = jnp.zeros((1, COL), jnp.float32)
                neg = jnp.concatenate(
                    [zc, -jnp.sum(tx, axis=0, keepdims=True), -jnp.sum(ty, axis=0, keepdims=True),
                     -jnp.sum(tz, axis=0, keepdims=True), zc, zc, zc, zc], axis=0)
                cur = out_cols_ref[:, pl.ds(cid * COL, COL)]
                out_cols_ref[:, pl.ds(cid * COL, COL)] = cur + neg
        if compute_u:
            h = _horner(t, h_coeffs)
            e_pair = et6 * (t6 - 1.0) + qq * h * inv_r
            acc_u = acc_u + jnp.where(gate, e_pair, 0.0)
        return acc_fx, acc_fy, acc_fz, acc_u

    # UNROLL-x loop over this row's column chunks; the tile builder pads
    # every row's list to a multiple of UNROLL with the guaranteed all-zero
    # chunk (q = eps = 0 => zero contribution), so no per-iteration masking
    def body(jj, acc):
        j = UNROLL * jj
        for k in range(UNROLL):
            acc = one_col(col_ids_ref[start + j + k], acc)
        return acc

    if u_only:
        z1 = zeros[:, :1]  # dead 1-lane force accumulators
        init = (z1, z1, z1, zeros)
    elif compute_u:
        init = (zeros, zeros, zeros, zeros)
    else:
        init = (zeros, zeros, zeros, zeros[:, :1])  # dead 1-lane accumulator
    if triangular:
        # peeled covering tile (builder excludes it from the per-row lists):
        # global row chunk id * ROW // COL = covering column chunk id (col
        # ids are global in sharded callers too — atoms_cm is replicated
        # there). Clamp for FAKE rows past the real chunks (spatial_md pads
        # the row axis): their atoms carry q = eps = 0, so the clamped tile
        # contributes exact zeros.
        cid_diag = jnp.minimum((row_base_ref[0] + i) * ROW // COL, atoms_ref.shape[0] - 1)
        init = one_col(cid_diag, init, diag=True)
    acc_fx, acc_fy, acc_fz, acc_u = jax.lax.fori_loop(
        0, (count + UNROLL - 1) // UNROLL, body, init
    )

    if u_only:
        fx = fy = fz = jnp.zeros((ROW,), jnp.float32)
    else:
        fx = jnp.sum(acc_fx, axis=1)
        fy = jnp.sum(acc_fy, axis=1)
        fz = jnp.sum(acc_fz, axis=1)
    if compute_u:
        u = jnp.sum(acc_u, axis=1)
        if not triangular:
            u = 0.5 * u  # symmetric tile list: halve
    else:
        u = jnp.zeros((ROW,), jnp.float32)
    z = jnp.zeros((ROW,), jnp.float32)
    out_ref[p * ROW : (p + 1) * ROW, :] = jnp.stack([u, fx, fy, fz, z, z, z, z], axis=1)


def _rowscan_call(
    atomsT,  # (n_row_atoms, 8) f32 — row-side atoms (may be a shard)
    atoms_cm,  # (nC, 8, COL) f32 — ALL column chunks, chunk-major
    row_start,
    row_count,
    col_ids,
    scalars,
    n_rows: int,
    *,
    row_base=None,  # (1,) int32 global row-chunk offset (sharded callers)
    rcen_q=None,  # (nR*4,) int32 quantized row centers (preshift mode)
    h_coeffs,
    p_coeffs,
    compute_u: bool,
    interpret: bool,
    triangular: bool,
    has_w: bool = True,
    u_only: bool = False,
):
    """Raw pallas invocation. Returns (out_rows (n_row_atoms, 8), out_cols
    (8, Npad) | None). Row blocks index atomsT locally, so a caller may pass
    a row SHARD with matching row_start/row_count (col data stays whole).
    u_only (requires compute_u): energy-only sweep — no force math and, in
    triangular mode, no column-reaction output (per-pair energies are
    counted once on the row side)."""
    n_chunks = atoms_cm.shape[0]
    n_pad = n_chunks * COL
    n_row_atoms = n_rows * ROW
    if row_base is None:
        row_base = jnp.zeros((1,), jnp.int32)
    preshift = rcen_q is not None
    n_prefetch = 5 if preshift else 4
    prefetch = (row_base, row_start, row_count, col_ids) + ((rcen_q,) if preshift else ())

    rpb = RPB if n_rows % RPB == 0 else 1
    row_map = lambda i, *_: (i, 0)
    whole3 = lambda i, *_: (0, 0, 0)
    whole2 = lambda i, *_: (0, 0)
    in_specs = [
        pl.BlockSpec((ROW * rpb, 8), row_map),
        pl.BlockSpec((n_chunks, 8, COL), whole3),
        pl.BlockSpec((1, 8), whole2, memory_space=pltpu.SMEM),
    ]
    kern = partial(
        _rowscan_kernel,
        h_coeffs=h_coeffs,
        p_coeffs=p_coeffs,
        compute_u=compute_u,
        has_w=has_w,
        preshift=preshift,
        rpb=rpb,
        u_only=u_only,
    )
    if u_only:
        assert compute_u, "u_only requires compute_u"
        grid_spec_u = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(n_rows // rpb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ROW * rpb, 8), row_map),
        )
        out_rows = pl.pallas_call(
            partial(kern, triangular=triangular),
            grid_spec=grid_spec_u,
            out_shape=jax.ShapeDtypeStruct((n_row_atoms, 8), jnp.float32),
            interpret=interpret,
        )(*prefetch, atomsT, atoms_cm, scalars)
        return out_rows, None
    if not triangular:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(n_rows // rpb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ROW * rpb, 8), row_map),
        )
        out_rows = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_row_atoms, 8), jnp.float32),
            interpret=interpret,
        )(*prefetch, atomsT, atoms_cm, scalars)
        return out_rows, None
    grid_spec_tri = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_rows // rpb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ROW * rpb, 8), row_map),
            pl.BlockSpec((8, n_pad), whole2),
        ],
    )
    out_rows, out_cols = pl.pallas_call(
        partial(kern, triangular=True),
        grid_spec=grid_spec_tri,
        out_shape=[
            jax.ShapeDtypeStruct((n_row_atoms, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*prefetch, atomsT, atoms_cm, scalars)
    return out_rows, out_cols


@partial(jax.jit, static_argnames=("n_rows", "max_pairs", "h_coeffs", "p_coeffs", "compute_u", "interpret", "triangular", "has_w"))
def rowscan_sweep(
    atoms8,  # (8, Npad) f32
    atomsT,  # (Npad, 8) f32
    row_start,  # (nR,) int32
    row_count,  # (nR,) int32
    col_ids,  # (max_pairs,) int32
    scalars,  # (1, 8) f32
    n_rows: int,
    max_pairs: int,
    h_coeffs,
    p_coeffs,
    compute_u: bool = False,
    interpret: bool = False,
    triangular: bool = False,
    has_w: bool = True,
    rcen_q=None,  # (nR*4,) int32 quantized periodic row centers => preshift
):
    """Returns (Npad, 8) f32: columns [u_atom, du/dx(3), 0...] in sorted
    order; sum of column 0 = total energy (if compute_u). In triangular mode
    the result already includes both Newton-pair sides. Passing rcen_q
    selects the PRESHIFT variant: per-atom image mapping to the periodic
    row-chunk center (rows once per grid step, columns once per tile)
    replaces the 9-op/slot per-pair minimum-image rounding; sound iff
    max periodic row half-extent + cutoff < box/2 per axis (the dotscan
    image bound — build_dotscan_tiles rechecks it every rebuild).

    compute_u is tri-valued: False (forces only), True (forces + energy),
    "u_only" (energy only — ~half the per-slot work; force columns zero)."""
    n_pad = atoms8.shape[1]
    n_chunks = n_pad // COL
    atoms_cm = atoms8.reshape(8, n_chunks, COL).transpose(1, 0, 2)  # chunk-major
    out_rows, out_cols = _rowscan_call(
        atomsT, atoms_cm, row_start, row_count, col_ids, scalars, n_rows,
        rcen_q=rcen_q,
        h_coeffs=h_coeffs, p_coeffs=p_coeffs, compute_u=bool(compute_u),
        u_only=compute_u == "u_only",
        interpret=interpret, triangular=triangular, has_w=has_w,
    )
    if out_cols is None:
        return out_rows
    return out_rows.at[:, 1:4].add(out_cols[1:4].T)


@partial(jax.jit, static_argnames=("n_rows", "max_pairs", "h_coeffs", "p_coeffs", "compute_u", "interpret", "triangular", "has_w"))
def rowscan_sweep_cm(
    atoms_cm,  # (nC, 8, COL) f32 chunk-major — built WITHOUT a lane<->sublane transpose
    atomsT,  # (Npad, 8) f32
    row_start,
    row_count,
    col_ids,
    scalars,
    n_rows: int,
    max_pairs: int,
    h_coeffs,
    p_coeffs,
    compute_u: bool = False,
    interpret: bool = False,
    triangular: bool = False,
    has_w: bool = True,
    rcen_q=None,
):
    """rowscan_sweep taking the column data already in chunk-major layout.

    The per-step (3, Npad) lane<->sublane transpose inside rowscan_sweep is
    the dominant non-sweep cost of the MD provider (XLA lowers it at far
    below HBM bandwidth); the provider builds atoms_cm directly from three
    1-D coordinate gathers instead (see make_tile_md_provider's cm assemble).

    compute_u is tri-valued like rowscan_sweep's ("u_only" = energy-only)."""
    out_rows, out_cols = _rowscan_call(
        atomsT, atoms_cm, row_start, row_count, col_ids, scalars, n_rows,
        rcen_q=rcen_q,
        h_coeffs=h_coeffs, p_coeffs=p_coeffs, compute_u=bool(compute_u),
        u_only=compute_u == "u_only",
        interpret=interpret, triangular=triangular, has_w=has_w,
    )
    if out_cols is None:
        return out_rows
    return out_rows.at[:, 1:4].add(out_cols[1:4].T)


def rowscan_sweep_sharded(
    atoms8,
    atomsT,
    row_start,
    row_count,
    col_ids,
    scalars,
    n_rows: int,
    h_coeffs,
    p_coeffs,
    mesh,
    axis_name: str = "rows",
    compute_u: bool = False,
    interpret: bool = False,
    triangular: bool = False,
):
    """Spatially-decomposed sweep over a device mesh: the snake-sorted row
    chunks are block-partitioned across devices (each device integrates the
    pair interactions of its contiguous spatial slab); column atom data is
    replicated (at ~1 MB per 23k atoms this is far below the ICI budget —
    true halo exchange becomes worthwhile only at millions of atoms). In
    triangular (Newton) mode the column-side reaction forces are reduced
    with one psum over the mesh.

    Requires n_rows % n_devices == 0 (builder pads rows; pick Npad so the
    row-chunk count divides the mesh).
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n_dev = int(np.prod(mesh.devices.shape))
    assert n_rows % n_dev == 0, f"{n_rows} row chunks not divisible over {n_dev} devices"
    n_rows_local = n_rows // n_dev
    n_pad = atoms8.shape[1]
    n_chunks = n_pad // COL
    atoms_cm = atoms8.reshape(8, n_chunks, COL).transpose(1, 0, 2)

    def local_sweep(row_base_shard, atomsT_shard, atoms_cm_all, row_start_shard, row_count_shard, col_ids_all, scalars_all):
        out_rows, out_cols = _rowscan_call(
            atomsT_shard,
            atoms_cm_all,
            row_start_shard,
            row_count_shard,
            col_ids_all,
            scalars_all,
            n_rows_local,
            row_base=row_base_shard,
            h_coeffs=h_coeffs,
            p_coeffs=p_coeffs,
            compute_u=compute_u,
            interpret=interpret,
            triangular=triangular,
        )
        if out_cols is not None:
            out_cols = jax.lax.psum(out_cols, axis_name)
        else:
            out_cols = jnp.zeros((8, n_pad), jnp.float32)
        return out_rows, out_cols

    row_base = jnp.arange(n_dev, dtype=jnp.int32) * n_rows_local
    sharded = shard_map(
        local_sweep,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(axis_name), P(axis_name), P(), P()),
        out_specs=(P(axis_name), P()),
        check_rep=False,
    )
    out_rows, out_cols = sharded(row_base, atomsT, atoms_cm, row_start, row_count, col_ids, scalars)
    if triangular:
        return out_rows.at[:, 1:4].add(out_cols[1:4].T)
    return out_rows


@partial(jax.jit, static_argnames=("max_pairs", "cell_size", "triangular", "sort", "with_ranks"))
def build_rowscan_tiles(conf, params, box, cutoff, max_pairs: int, cell_size: float = 0.65, atom_mask=None, triangular: bool = False, sort: str = "snake", with_ranks: bool = False):
    """Spatial sort (snake cells by default; "hilbert" gives compact chunks
    for kernels whose image handling needs bounded row extents — dotscan) +
    per-32-atom-row-chunk culled column-chunk lists, each row's list ordered
    by build-time bbox gap ASCENDING (so the skin shell sits at the tail and
    the per-step count chop — chop_row_counts — can truncate it).

    Returns (pad_order (Npad,) int32, row_start (nR,), row_count (nR,),
    col_ids (max_pairs,) int32[, rank_mat (nR, nC) int32 when with_ranks —
    the rank of chunk c in row r's list, -1 if unlisted], overflow int32)."""
    n = conf.shape[0]
    # one extra all-padding column chunk (id n_cols-1): the unrolled kernel
    # pads odd per-row neighbor lists with it (zero q/eps => zero contribution)
    n_pad = (-(-n // COL) + 1) * COL
    n_rows = n_pad // ROW
    n_cols = n_pad // COL

    box_diag = jnp.diagonal(box)
    dims = jnp.maximum(jnp.floor(box_diag / cell_size).astype(jnp.int32), 1)
    wrapped = conf[:, :3] - box_diag * jnp.floor(conf[:, :3] / box_diag)
    frac = wrapped / box_diag
    frac = frac - jnp.floor(frac)
    if sort == "hilbert":
        from timemachine_tpu.ops.pallas.quadscan_kernel import _hilbert_keys

        keys = _hilbert_keys(frac)
    else:
        cxyz = jnp.minimum((frac * dims).astype(jnp.int32), dims - 1)
        cx, cy, cz = cxyz[:, 0], cxyz[:, 1], cxyz[:, 2]
        ky = jnp.where(cz % 2 == 0, cy, dims[1] - 1 - cy)
        row_parity = (cz * dims[1] + ky) % 2
        kx = jnp.where(row_parity == 0, cx, dims[0] - 1 - cx)
        keys = (cz * dims[1] + ky) * dims[0] + kx
    order = jnp.argsort(keys).astype(jnp.int32)
    pad_order = jnp.concatenate([order, jnp.zeros(n_pad - n, dtype=jnp.int32)])

    xs = wrapped[pad_order]  # (Npad, 3)
    if atom_mask is None:
        valid = jnp.concatenate([jnp.ones(n), jnp.zeros(n_pad - n)])
    else:
        valid = jnp.concatenate([jnp.asarray(atom_mask, jnp.float32), jnp.zeros(n_pad - n)])
        valid = valid[pad_order]
    vmask = valid.reshape(n_rows, ROW, 1) > 0
    big = jnp.asarray(1e9, jnp.float32)
    xr = xs.reshape(n_rows, ROW, 3)
    rmin = jnp.min(jnp.where(vmask, xr, big), axis=1)
    rmax = jnp.max(jnp.where(vmask, xr, -big), axis=1)
    vc = valid.reshape(n_cols, COL, 1) > 0
    xc = xs.reshape(n_cols, COL, 3)
    cmin = jnp.min(jnp.where(vc, xc, big), axis=1)
    cmax = jnp.max(jnp.where(vc, xc, -big), axis=1)

    rcen = 0.5 * (rmin + rmax)
    rhal = 0.5 * (rmax - rmin)
    ccen = 0.5 * (cmin + cmax)
    chal = 0.5 * (cmax - cmin)
    dc = rcen[:, None, :] - ccen[None, :, :]
    dc = dc - box_diag * jnp.floor(dc / box_diag + 0.5)
    gap = jnp.maximum(jnp.abs(dc) - (rhal[:, None, :] + chal[None, :, :]), 0.0)
    d2 = jnp.sum(gap * gap, axis=2)
    r_has = jnp.any(vmask[:, :, 0], axis=1)
    c_has = jnp.any(vc[:, :, 0], axis=1)
    inter = (d2 < cutoff * cutoff) & r_has[:, None] & c_has[None, :]
    if triangular:
        # Newton (upper-triangular) tile list: row chunk r only visits column
        # windows STRICTLY after its own covering window — those tiles are
        # fully ordered (every col gid > every row gid), so the kernel runs
        # them with no per-pair ordering gate. The covering window itself is
        # NOT listed: the kernel peels it unconditionally (one_col(diag=True))
        # with the per-pair row_gid < col_gid gate.
        r_win = (jnp.arange(n_rows) * ROW) // COL
        inter = inter & (jnp.arange(n_cols)[None, :] > r_win[:, None])

    counts = jnp.sum(inter, axis=1).astype(jnp.int32)
    # per-row layout padded to a multiple of UNROLL (unrolled kernel loop)
    padded = (-(-counts // UNROLL) * UNROLL).astype(jnp.int32)
    row_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    start_real = jnp.cumsum(counts) - counts
    total = jnp.sum(padded)
    overflow = jnp.maximum(total - max_pairs, 0)

    flat = inter.reshape(-1)
    idx = jnp.arange(n_rows * n_cols)
    # entries grouped by row (spacing 8 > any in-cutoff gap), gap-ascending
    # within each row; non-entries tie at 1e18 (stable argsort keeps them
    # deterministic). f32 key resolution (~5e-4 nm at row 736) only affects
    # chop efficiency, never correctness — the kernel gate is per-pair.
    gkey = (idx // n_cols).astype(jnp.float32) * 8.0 + jnp.sqrt(d2).reshape(-1).astype(jnp.float32)
    keys = jnp.where(flat, gkey, 1e18)
    take = min(max_pairs, n_rows * n_cols)
    sorted_idx = jnp.argsort(keys, stable=True)[:take]
    entry_row = sorted_idx // n_cols
    entry_col = (sorted_idx % n_cols).astype(jnp.int32)
    seq = jnp.arange(take)
    rank = seq - start_real[entry_row]
    target = row_start[entry_row] + rank
    ok = (seq < jnp.sum(counts)) & (target < max_pairs)
    zero_chunk = jnp.int32(n_cols - 1)
    cols = jnp.full((max_pairs,), zero_chunk, jnp.int32)
    cols = cols.at[jnp.where(ok, target, max_pairs)].set(entry_col, mode="drop")
    # clamp counts so an overflowing tail never reads out of bounds
    allowed = jnp.maximum(max_pairs - row_start, 0) // UNROLL * UNROLL
    row_count = jnp.minimum(counts, allowed).astype(jnp.int32)
    row_start = jnp.minimum(row_start, max_pairs - UNROLL).astype(jnp.int32)

    if with_ranks:
        rank_flat = jnp.full((n_rows * n_cols,), -1, jnp.int32)
        rank_flat = rank_flat.at[jnp.where(ok, sorted_idx, n_rows * n_cols)].set(
            rank.astype(jnp.int32), mode="drop"
        )
        return pad_order, row_start, row_count, cols, rank_flat.reshape(n_rows, n_cols), overflow
    return pad_order, row_start, row_count, cols, overflow


def chop_row_counts(atoms_cm, rank_mat, row_count, box, cutoff):
    """Per-step tile-count truncation: recompute chunk bboxes from the
    CURRENT coordinates (chunk-major atom array — no gathers) and drop every
    tile past the last one whose bbox gap is within the BARE cutoff. Build
    lists are gap-ordered, so the cutoff..cutoff+skin shell sits at the tail
    and stops costing sweep slots the moment it is out of range. Exact: a
    tile with current bbox gap > cutoff contains no in-cutoff pair; listed
    tiles that survive keep the per-pair r2 < cutoff^2 gate regardless."""
    n_chunks = atoms_cm.shape[0]
    sub = COL // ROW
    box_diag = jnp.diagonal(jnp.asarray(box, jnp.float32))
    xyz = atoms_cm[:, 0:3, :]  # (nC, 3, COL); padding atoms duplicate atom 0
    # (conservative: only widens extents)
    xr = xyz.reshape(n_chunks, 3, sub, ROW)
    rmin = jnp.min(xr, axis=3).transpose(0, 2, 1).reshape(n_chunks * sub, 3)
    rmax = jnp.max(xr, axis=3).transpose(0, 2, 1).reshape(n_chunks * sub, 3)
    cmin = jnp.min(xyz, axis=2)  # (nC, 3)
    cmax = jnp.max(xyz, axis=2)
    rcen = 0.5 * (rmin + rmax)
    rhal = 0.5 * (rmax - rmin)
    ccen = 0.5 * (cmin + cmax)
    chal = 0.5 * (cmax - cmin)
    dc = rcen[:, None, :] - ccen[None, :, :]
    dc = dc - box_diag * jnp.floor(dc / box_diag + 0.5)
    gap = jnp.maximum(jnp.abs(dc) - (rhal[:, None, :] + chal[None, :, :]), 0.0)
    d2 = jnp.sum(gap * gap, axis=2)
    keep_rank = jnp.where(d2 < cutoff * cutoff, rank_mat, -1)
    return jnp.minimum(row_count, jnp.max(keep_rank, axis=1) + 1)


def _assemble(conf, params, box, pad_order, n, atom_mask=None):
    """(8, Npad) sorted atom rows [x y z w q sig/2 2*sqrt(eps) 0] with
    padding (and masked) atoms carrying zero charge/eps so they vanish
    arithmetically."""
    box_diag = jnp.diagonal(box)
    n_pad = pad_order.shape[0]
    wrapped = conf[:, :3] - box_diag * jnp.floor(conf[:, :3] / box_diag)
    xyz = wrapped[pad_order].T
    w = params[pad_order, 3][None, :]
    valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
    if atom_mask is not None:
        pm = jnp.concatenate([jnp.asarray(atom_mask, jnp.float32), jnp.zeros(n_pad - n)])
        valid = valid * pm[pad_order]
    q = (params[pad_order, 0] * valid)[None, :]
    sig = params[pad_order, 1][None, :]
    eps = (2.0 * params[pad_order, 2] * valid)[None, :]
    z = jnp.zeros((1, n_pad), jnp.float32)
    return jnp.concatenate([xyz, w, q, sig, eps, z], axis=0).astype(jnp.float32)


def _scalars(box, cutoff):
    return jnp.concatenate(
        [jnp.diagonal(jnp.asarray(box, jnp.float32)), jnp.asarray([cutoff], jnp.float32), jnp.zeros(4, jnp.float32)]
    ).reshape(1, 8)


def suggest_max_pairs(conf, box, cutoff, margin: float = 1.3, atom_mask=None, triangular: bool = False, sort: str = "snake", cell_size: float = 0.65) -> int:
    """Host-side: measure the interacting (32-row x 128-col) chunk-pair count
    and pad with margin (diffusion headroom between rebuilds)."""
    n = conf.shape[0]
    n_pad = (-(-n // COL) + 1) * COL
    # worst case: every row visits every column chunk, each row's list padded
    # up to a multiple of UNROLL
    cap = (n_pad // ROW) * (-(-(n_pad // COL) // UNROLL) * UNROLL)
    _, _, counts, _, _ = build_rowscan_tiles(
        jnp.asarray(conf, jnp.float32),
        jnp.zeros((n, 4), jnp.float32),
        jnp.asarray(box, jnp.float32),
        cutoff,
        max_pairs=cap,
        cell_size=cell_size,
        atom_mask=atom_mask,
        triangular=triangular,
        sort=sort,
    )
    c = np.asarray(counts)
    total = int((-(-c // UNROLL) * UNROLL).sum())  # per-row UNROLL padding
    want = int(np.ceil(total * margin / 128) * 128)
    return min(max(want, 128), cap)


def census_swept_slots(conf, box, cutoff, skin: float, cell_size: float, triangular: bool = True) -> int:
    """Host-side per-MD-step swept-slot census at one candidate sort-grid
    cell size: tiles built at cutoff+skin (as the MD provider does at each
    rebuild), per-row counts chopped at the bare cutoff (as every step does),
    trips rounded up to UNROLL, plus the peeled diagonal covering tile per
    row chunk. The cell size only changes the spatial sort that groups atoms
    into row/column chunks, so any choice is correct — this census is purely
    a performance decision (sweep time tracks swept slots ~1:1 on v5e)."""
    n = conf.shape[0]
    n_pad = (-(-n // COL) + 1) * COL
    cap = (n_pad // ROW) * (-(-(n_pad // COL) // UNROLL) * UNROLL)
    pad_order, _, row_count, _, rank_mat, _ = build_rowscan_tiles(
        jnp.asarray(conf, jnp.float32),
        jnp.zeros((n, 4), jnp.float32),
        jnp.asarray(box, jnp.float32),
        cutoff + skin,
        max_pairs=cap,
        cell_size=cell_size,
        triangular=triangular,
        with_ranks=True,
    )
    box_diag = jnp.diagonal(jnp.asarray(box, jnp.float32))
    xyz = jnp.asarray(conf[:, :3], jnp.float32)
    wrapped = xyz - box_diag * jnp.floor(xyz / box_diag)
    xs = wrapped[pad_order]  # out-of-range padding indices clamp to atom n-1
    n_chunks = n_pad // COL
    atoms_cm = jnp.tile(xs.T.reshape(3, n_chunks, COL).transpose(1, 0, 2), (1, 3, 1))[:, :8]
    chopped = np.asarray(chop_row_counts(atoms_cm, rank_mat, row_count, box, cutoff))
    trips = int((-(-chopped // UNROLL) * UNROLL).sum())
    n_rows = n_pad // ROW
    return (trips + n_rows) * ROW * COL


def suggest_cell_size(
    conf, box, cutoff, skin: float = 0.1, candidates=(0.65, 0.9, 1.15, 1.4), triangular: bool = True
) -> float:
    """Pick the sort-grid cell size that minimizes the measured per-step
    swept slots on this system (configure-time tile census over a small
    candidate set). On solvated DHFR (23,558 atoms, box ~6.2 nm) the census
    moves 93M swept slots at 0.65 to 76M at 1.15, and the TPU sweep follows
    slots ~1:1 (2.07 -> 1.84 ms/step measured on v5e; force parity at f32
    noise). Candidates larger than box_min/3 are skipped (too few sort cells
    per axis for the snake order to localize anything)."""
    box_diag = np.diagonal(np.asarray(box))
    best, best_slots = candidates[0], None
    for cell in candidates:
        if cell > float(box_diag.min()) / 3.0 and best_slots is not None:
            continue
        slots = census_swept_slots(conf, box, cutoff, skin, cell, triangular=triangular)
        if best_slots is None or slots < best_slots:
            best, best_slots = cell, slots
    return best


def make_param_rows_fn(atom_mask):
    """Sorted parameter-row cache builder shared by the tile MD providers:
    (params, pad_order, n) -> ((4, Npad) [w q sig/2 2*sqrt(eps)] lane-major,
    (Npad, 4) row-major mirror); padding/masked atoms carry q = eps = 0."""

    def _param_rows(params, pad_order, n):
        n_pad = pad_order.shape[0]
        params = jnp.asarray(params, jnp.float32)
        valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
        if atom_mask is not None:
            pm = jnp.concatenate([jnp.asarray(atom_mask, jnp.float32), jnp.zeros(n_pad - n, jnp.float32)])
            valid = valid * pm[pad_order]
        pr = params[pad_order]  # (Npad, 4) [q sig eps w]
        rowsT = jnp.stack([pr[:, 3], pr[:, 0] * valid, pr[:, 1], 2.0 * pr[:, 2] * valid], axis=1)
        return rowsT.T, rowsT

    return _param_rows


class SortedSweepProtocol(NamedTuple):
    """Sorted-state sweep surface attached as element [5] of the tile MD
    provider tuple (see make_tile_md_provider). `sweep(state, x_sorted, box)`
    evaluates the kernel directly on pad_order-space coordinates;
    `pad_order(state)` / `inv(state)` expose the state's permutation so the
    Context can own the sorted<->canonical round-trips and rebuild-time
    re-sorts; `rebuild_interval` mirrors apply_fn's internal schedule."""

    sweep: object
    pad_order: object
    inv: object
    rebuild_interval: int


def make_tile_md_provider(build_fn, sweep_fn, param_rows_fn, rebuild_interval: int = 20, sweep_cm_fn=None):
    """Shared stateful-provider state machine for the tile-sweep kernels
    (rowscan / quadscan / dotscan), so the rebuild/cache/poison logic exists
    once:

      build_fn(conf, params, box) -> tiles tuple with pad_order FIRST and an
        invalid/overflow flag LAST (nonzero => the sweep would silently drop
        interactions, so forces/energies are poisoned with NaN and the
        failure surfaces at the Context NaN guard / as +inf in MBAR).
      sweep_fn(tiles, atoms8, atomsT, box, compute_u) -> (Npad, 8) output
        [u_atom, du/dx(3), ...] in sorted order.
      param_rows_fn: from make_param_rows_fn (params cached at rebuild time
        in both layouts so the per-step assemble touches only coordinates).

    State = (*tiles, inv, prows, prowsT) — opaque to callers. Invariant:
    params must not change between rebuilds (the Context re-initializes
    provider state at every `multiple_steps` call; set_params only happens
    between calls).

    Returns (init_fn, apply_fn, energy_fn, energy_fn, energy_with_params_fn,
    sorted_protocol) — the md/context.py energy_with_states tuple contract:
    [2] energy through cached tiles+params; [3] the rigid-move energy variant
    (same here — the nonbonded term is never rigid-invariant); [4]
    tile-reusing energy under DIFFERENT params (HREX banded-U_kl path,
    parallel/replica_exchange.py), valid for any conf within skin/2 of the
    tiles' build conf; [5] a SortedSweepProtocol (cm providers only, else
    None) for the Context's sorted-state MD fast path.

    sweep_cm_fn(tiles, atoms_cm, atomsT, box, compute_u), if given, switches
    the per-step assemble to CHUNK-MAJOR: the (nC, 8, COL) column array is
    built from three 1-D coordinate gathers + a concat with the cached
    chunk-major parameter rows — no (3, Npad) lane<->sublane transpose in the
    hot loop (XLA lowers that transpose at far below HBM bandwidth; the
    chunk-major param cache pays it once per rebuild instead)."""

    def _prows_cm(prows):
        # (4, Npad) [w q sig/2 2sqrt(eps)] -> (nC, 5, COL) chunk-major with a
        # trailing zero row, matching atoms8 rows 3..7
        n_pad = prows.shape[1]
        nc = n_pad // COL
        pm = prows.reshape(4, nc, COL).transpose(1, 0, 2)
        return jnp.concatenate([pm, jnp.zeros((nc, 1, COL), jnp.float32)], axis=1)

    def _build(conf, params, box):
        tiles = build_fn(conf, params, box)
        pad_order = tiles[0]
        n = conf.shape[0]
        inv = jnp.zeros(n, dtype=jnp.int32).at[pad_order[:n]].set(jnp.arange(n, dtype=jnp.int32))
        prows, prowsT = param_rows_fn(params, pad_order, n)
        if sweep_cm_fn is not None:
            prows = _prows_cm(prows)
        return (*tiles, inv, prows, prowsT)

    def init_fn(conf, params, box):
        return _build(conf, params, box)

    def _sweep_from_state(state, conf, box, compute_u):
        tiles = state[:-3]
        pad_order = tiles[0]
        prows, prowsT = state[-2], state[-1]
        n_pad = pad_order.shape[0]
        conf = jnp.asarray(conf, jnp.float32)
        box32 = jnp.asarray(box, jnp.float32)
        box_diag = jnp.diagonal(box32)
        wrapped = conf[:, :3] - box_diag * jnp.floor(conf[:, :3] / box_diag)
        xyzN = wrapped[pad_order]  # (Npad, 3) row gather
        z1 = jnp.zeros((1, n_pad), jnp.float32)
        atomsT = jnp.concatenate([xyzN, prowsT, z1.T], axis=1)  # (Npad, 8)
        if sweep_cm_fn is not None:
            nc = n_pad // COL
            xyz_cm = [wrapped[:, k][pad_order].reshape(nc, 1, COL) for k in range(3)]
            atoms_cm = jnp.concatenate(xyz_cm + [prows], axis=1)  # (nC, 8, COL)
            return sweep_cm_fn(tiles, atoms_cm, atomsT, box, compute_u)
        atoms8 = jnp.concatenate([xyzN.T, prows, z1], axis=0)  # (8, Npad)
        return sweep_fn(tiles, atoms8, atomsT, box, compute_u)

    def _poison(state, val):
        # state[-4] is the build's invalid flag (tiles tuple's last element)
        return jnp.where(state[-4] > 0, jnp.float32(jnp.nan), val)

    def apply_fn(state, conf, params, box, t):
        state = jax.lax.cond(
            (t % rebuild_interval) == 0,
            lambda: _build(conf, params, box),
            lambda: state,
        )
        out = _sweep_from_state(state, conf, box, compute_u=False)
        # slice to (Npad, 3) BEFORE the un-sort gather: measured 6 ns/idx for
        # 3-lane-row gathers vs 11.5 ns/idx for 8-lane rows on v5e — XLA as
        # written would gather the full (Npad, 8) rows and slice after
        f_sorted = out[:, 1:4]
        force = -f_sorted[state[-3]]
        return jnp.zeros((), jnp.float32), _poison(state, force), state

    def energy_fn(state, conf, params, box):
        # "u_only": energy-only sweep (rowscan skips force math + the column
        # reaction writeback; other kernels treat it as truthy compute_u)
        out = _sweep_from_state(state, conf, box, compute_u="u_only")
        return _poison(state, jnp.sum(out[:, 0]))

    def energy_with_params_fn(state, conf, params, box):
        pad_order = state[0]
        prows, prowsT = param_rows_fn(params, pad_order, conf.shape[0])
        if sweep_cm_fn is not None:
            prows = _prows_cm(prows)
        refreshed = (*state[:-2], prows, prowsT)
        out = _sweep_from_state(refreshed, conf, box, compute_u="u_only")
        return _poison(state, jnp.sum(out[:, 0]))

    sorted_protocol = None
    if sweep_cm_fn is not None:
        # Sorted-state MD protocol (md/context.py sorted fast path): the
        # Context carries coordinates in the provider's pad_order space, so
        # the per-step (N,3) row gather, the three 1-D chunk-major column
        # gathers and the un-sort force epilogue all disappear — the column
        # array is built by strided slices of the sorted carry instead.
        # Measured on the 23k water box (scripts/probe_sorted.py, v5e):
        # 1.167 -> 0.688 ms/step INCLUDING the canonical round-trip the
        # Context pays for bonded terms (the round-trip overlaps with the
        # sweep). Force parity vs the canonical apply is bitwise (rel err 0).
        def sweep_sorted(state, x_sorted, box, compute_u=False):
            """(Npad, 3) sorted raw coords -> (Npad, 8) kernel output
            [u_atom, du/dx(3), ...] in sorted order, NaN-poisoned when the
            state's build overflowed. Rows at pad slots (the static tail,
            pad_order[i]==0 duplicates of atom 0) carry zero q/eps so their
            contributions vanish; callers mask the tail before integrating."""
            tiles = state[:-3]
            prows, prowsT = state[-2], state[-1]
            n_pad = tiles[0].shape[0]
            box32 = jnp.asarray(box, jnp.float32)
            box_diag = jnp.diagonal(box32)
            x32 = jnp.asarray(x_sorted, jnp.float32)
            wrapped = x32 - box_diag * jnp.floor(x32 / box_diag)
            z1 = jnp.zeros((n_pad, 1), jnp.float32)
            atomsT = jnp.concatenate([wrapped, prowsT, z1], axis=1)  # (Npad, 8)
            nc = n_pad // COL
            xyz_cm = [wrapped[:, k].reshape(nc, 1, COL) for k in range(3)]
            atoms_cm = jnp.concatenate(xyz_cm + [prows], axis=1)  # (nC, 8, COL)
            out = sweep_cm_fn(tiles, atoms_cm, atomsT, box, compute_u)
            return _poison(state, out)

        sorted_protocol = SortedSweepProtocol(
            sweep=sweep_sorted,
            pad_order=lambda state: state[0],
            inv=lambda state: state[-3],
            rebuild_interval=rebuild_interval,
        )

    return init_fn, apply_fn, energy_fn, energy_fn, energy_with_params_fn, sorted_protocol


def make_nonbonded_rowscan_md(
    beta: float,
    cutoff: float,
    max_pairs: int,
    skin: float = 0.1,
    rebuild_interval: int = 20,
    interpret: bool = False,
    atom_mask=None,
    triangular: bool = True,
    has_w: bool = True,
    preshift: bool = False,
    cell_size: float = 0.65,
):
    """Stateful MD force provider on the rowscan kernel (API-compatible with
    nonbonded_kernel.make_nonbonded_pallas_md): tile lists culled at
    cutoff + skin, rebuilt every rebuild_interval steps; per-step work is one
    coords gather + one small transpose + one rowscan sweep.

    The sorted PARAMETER rows [w, q, sig/2, 2*sqrt(eps)] are cached in the
    provider state at rebuild time (in both lane-major and row-major layouts)
    so the per-step assemble touches only coordinates — measured ~1.3 ms/step
    saved at 23k atoms vs re-gathering and transposing all 8 atom rows.
    Invariant: params must not change between rebuilds. The Context upholds
    this by re-initializing provider state at every `multiple_steps` call
    (set_params only happens between calls).

    Returns the 5-tuple documented on make_tile_md_provider (init, apply,
    energy through cached tiles, rigid-move energy, energy under different
    params); energies reuse the state's tile lists (valid for any conf
    within skin/2 of the tiles' build conf — the barostat's ~1e-3 nm trial
    displacements qualify), so MC movers pay one sweep instead of
    sweep + tile rebuild per energy evaluation.
    """
    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)

    def _guard_w(build):
        # has_w=False is caller-asserted (all w offsets zero); make the
        # assertion self-checking: any nonzero w at rebuild poisons the state
        # exactly like a tile overflow, so wrong usage can't be silent
        if has_w:
            return build

        def checked(conf, params, box):
            tiles = build(conf, params, box)
            bad = jnp.any(jnp.asarray(params, jnp.float32)[:, 3] != 0.0).astype(jnp.int32)
            return (*tiles[:-1], tiles[-1] + bad)

        return checked

    if preshift:
        # periodic row-chunk centers + the image-bound recheck live in the
        # dotscan tile builder (lazy import: dotscan imports from this module)
        from timemachine_tpu.ops.pallas.dotscan_kernel import build_dotscan_tiles

        def build_fn(conf, params, box):
            return build_dotscan_tiles(
                jnp.asarray(conf, jnp.float32),
                jnp.asarray(params, jnp.float32),
                jnp.asarray(box, jnp.float32),
                cutoff + skin,
                max_pairs=max_pairs,
                cell_size=cell_size,
                atom_mask=atom_mask,
                triangular=triangular,
                with_ranks=True,
            )

        def sweep_cm_fn(tiles, atoms_cm, atomsT, box, compute_u):
            pad_order, row_start, row_count, col_ids, rank_mat, rcen_q, _ = tiles
            row_count = chop_row_counts(atoms_cm, rank_mat, row_count, box, cutoff)
            return rowscan_sweep_cm(
                atoms_cm,
                atomsT,
                row_start,
                row_count,
                col_ids,
                _scalars(box, cutoff),
                n_rows=pad_order.shape[0] // ROW,
                max_pairs=max_pairs,
                h_coeffs=h_coeffs,
                p_coeffs=p_coeffs,
                compute_u=compute_u,
                interpret=interpret,
                triangular=triangular,
                has_w=has_w,
                rcen_q=rcen_q,
            )

        return make_tile_md_provider(
            _guard_w(build_fn), None, make_param_rows_fn(atom_mask), rebuild_interval, sweep_cm_fn=sweep_cm_fn
        )

    def build_fn(conf, params, box):
        return build_rowscan_tiles(
            jnp.asarray(conf, jnp.float32),
            jnp.asarray(params, jnp.float32),
            jnp.asarray(box, jnp.float32),
            cutoff + skin,
            max_pairs=max_pairs,
            cell_size=cell_size,
            atom_mask=atom_mask,
            triangular=triangular,
            with_ranks=True,
        )

    def sweep_cm_fn(tiles, atoms_cm, atomsT, box, compute_u):
        pad_order, row_start, row_count, col_ids, rank_mat, _ = tiles
        row_count = chop_row_counts(atoms_cm, rank_mat, row_count, box, cutoff)
        return rowscan_sweep_cm(
            atoms_cm,
            atomsT,
            row_start,
            row_count,
            col_ids,
            _scalars(box, cutoff),
            n_rows=pad_order.shape[0] // ROW,
            max_pairs=max_pairs,
            h_coeffs=h_coeffs,
            p_coeffs=p_coeffs,
            compute_u=compute_u,
            interpret=interpret,
            triangular=triangular,
            has_w=has_w,
        )

    return make_tile_md_provider(
        _guard_w(build_fn), None, make_param_rows_fn(atom_mask), rebuild_interval, sweep_cm_fn=sweep_cm_fn
    )


def make_nonbonded_rowscan_energy_force(
    beta: float, cutoff: float, max_pairs: int, interpret: bool = False, atom_mask=None, triangular: bool = True
):
    """(conf, params, box) -> (u, force) in one rowscan sweep (tile build
    included — use the MD provider for hot loops)."""
    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)

    def energy_and_force(conf, params, box):
        conf = jnp.asarray(conf, jnp.float32)
        params = jnp.asarray(params, jnp.float32)
        box = jnp.asarray(box, jnp.float32)
        pad_order, row_start, row_count, col_ids, _ = build_rowscan_tiles(
            conf, params, box, cutoff, max_pairs=max_pairs, atom_mask=atom_mask, triangular=triangular
        )
        n = conf.shape[0]
        inv = jnp.zeros(n, dtype=jnp.int32).at[pad_order[:n]].set(jnp.arange(n, dtype=jnp.int32))
        atoms8 = _assemble(conf, params, box, pad_order, n, atom_mask=atom_mask)
        out = rowscan_sweep(
            atoms8,
            atoms8.T,
            row_start,
            row_count,
            col_ids,
            _scalars(box, cutoff),
            n_rows=atoms8.shape[1] // ROW,
            max_pairs=max_pairs,
            h_coeffs=h_coeffs,
            p_coeffs=p_coeffs,
            compute_u=True,
            interpret=interpret,
            triangular=triangular,
        )
        u = jnp.sum(out[:, 0])
        force = -out[inv, 1:4]
        return u, force

    return energy_and_force


def make_nonbonded_rowscan(beta: float, cutoff: float, max_pairs: int, interpret: bool = False, atom_mask=None,
                           dp_max_tiles: int = None, dp_cb: int = 2):
    """Differentiable energy(conf, params, box) with custom VJP: the forward
    runs ONE rowscan sweep producing energy + analytic dU/dx (stashed); dU/dp
    comes from the v1 tile kernel's dp-only pass (dead-code-eliminated by XLA
    whenever the parameter cotangent is unused). Box cotangent is zero (no
    virial, matching the reference CUDA kernels)."""
    from timemachine_tpu.ops.pallas.nonbonded_kernel import _run_dp, suggest_max_tiles

    ef = make_nonbonded_rowscan_energy_force(beta, cutoff, max_pairs, interpret=interpret, atom_mask=atom_mask)

    @jax.custom_vjp
    def energy(conf, params, box):
        u, _ = ef(conf, params, box)
        return u

    def fwd(conf, params, box):
        u, force = ef(conf, params, box)
        return u, (-force, conf, params, box)

    def bwd(res, g):
        du_dx, conf, params, box = res
        mt = dp_max_tiles
        if mt is None:
            raise ValueError("dp_max_tiles required for parameter gradients")
        du_dp = _run_dp(conf, params, box, beta, cutoff, mt, interpret, cb=dp_cb, atom_mask=atom_mask)
        return g * du_dx, g * du_dp, jnp.zeros_like(box)

    energy.defvjp(fwd, bwd)
    return energy
