"""Gather-compacted nonbonded kernel (Pallas/TPU) — production MD hot path, v3.

TPU-native replacement for the reference's warp-per-tile CUDA kernel
(k_nonbonded.cuh:330-432). Successor to rowscan_kernel.py (v2), designed
around three facts measured on v5e:

* XLA gather from a VMEM-sized operand moves ~20 M elements in ~25 us;
* XLA scatter-add runs ~9 ns/update (serialized read-modify-write) — any
  per-step or per-rebuild scatter with millions of updates is unusable;
* top_k over a (719, 23232) array takes ~30 us.

Decomposition:

* rebuild (every `rebuild_interval` steps): snake spatial sort, then for each
  32-atom row chunk the FULL list of candidate neighbor atoms — every sorted
  atom whose distance to the row chunk's bounding box is < cutoff+skin (exact
  atom-vs-bbox culling). In snake order that candidate set is a union of
  ~15-25 contiguous index intervals, so the build is scatter-free: detect
  interval edges elementwise, extract them with top_k, and expand intervals
  to explicit indices with batched-small-operand searchsorted/gathers.
* step: one XLA gather pulls each row's neighbor atoms into a dense
  (n_rows, 8, max_nbrs) array (the vmap form — batch dim leading — is the
  fast layout); the Pallas kernel is a plain dense sweep, columns streamed by
  BlockSpec, (32, 128) register tiles, 4x-unrolled inner loop. Full lists
  mean every pair is computed twice (once from each side), which makes row
  forces complete with NO reaction scatter; energy is halved once at the end.

Net at 23k atoms (water density): ~60M pair slots vs v2's 84.5M Newton-halved
ones, with a leaner kernel (no column-force read-modify-write) and a ~100x
cheaper rebuild than a scatter-based compaction.

Pair math is identical to v2 (shared helpers): LJ with Lorentz-Berthelot on
[q, sigma/2, 2*sqrt(eps), w] rows, 4D lifted distance, reaction-field
switched-erfc Coulomb as a Chebyshev series h(u) whose force series P is the
exact polynomial gradient (rowscan_kernel.es_energy_force_series).

Reference parity: timemachine/potentials/nonbonded.py:221-339 (math),
nonbonded_all_pairs.cu + neighborlist.cu (structure).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timemachine_tpu.ops.pallas.rowscan_kernel import _horner, es_energy_force_series

ROW = 32  # atoms per row chunk (grid step)
COL = 128  # column register-tile width == lane width
UNROLL = 4  # column tiles per inner-loop iteration
SWITCH_CUTOFF = 1.2  # pinned, matching ops/nonbonded.py
MAX_INTERVALS = 512  # snake-order candidate runs per row chunk. Runs appear
# wherever the candidate-ball boundary slices a cell (atoms within a cell are
# NOT spatially ordered, so a boundary cell contributes several short runs):
# measured ~290 mean / ~400 max at 23k atoms. top_k(512) over (719, 23232)
# costs the same ~30 us as top_k(64).


def _gather_kernel(
    count_ref,  # (nR,) int32 scalar prefetch: valid neighbor slots per row
    rowT_ref,  # (ROW, 8) block: row chunk atom data [x y z w q s e 0]
    cols_ref,  # (8, max_nbrs) block: this row's gathered neighbor atoms
    scal_ref,  # (1, 8) SMEM: box_x, box_y, box_z, cutoff, ...
    out_ref,  # (ROW, 8) block: [u, fx, fy, fz, 0...]
    *,
    h_coeffs,
    p_coeffs,
    compute_u: bool,
):
    i = pl.program_id(0)
    count = count_ref[i]

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

    rowT = rowT_ref[:, :]  # (ROW, 8)
    x_i = rowT[:, 0:1]
    y_i = rowT[:, 1:2]
    z_i = rowT[:, 2:3]
    w_i = rowT[:, 3:4]
    q_i = rowT[:, 4:5]
    s_i = rowT[:, 5:6]
    e_i = rowT[:, 6:7]

    zeros = jnp.zeros((ROW, COL), jnp.float32)

    def one_col(k, acc):
        acc_fx, acc_fy, acc_fz, acc_u = acc
        sl = pl.ds(k * COL, COL)
        col = cols_ref[:, sl]  # (8, COL)

        dx = x_i - col[0].reshape(1, COL)
        dy = y_i - col[1].reshape(1, COL)
        dz = z_i - col[2].reshape(1, COL)
        dx = dx - box_x * jax.lax.round(dx * inv_bx)
        dy = dy - box_y * jax.lax.round(dy * inv_by)
        dz = dz - box_z * jax.lax.round(dz * inv_bz)
        dw = w_i - col[3].reshape(1, COL)
        r2 = dx * dx + dy * dy + dz * dz + dw * dw

        r2s = jnp.maximum(r2, 1e-8)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r

        qq = q_i * col[4].reshape(1, COL)
        sg = s_i + col[5].reshape(1, COL)
        e4 = e_i * col[6].reshape(1, COL)  # rows store 2*sqrt(eps) => e4 = 4 eps_ij

        s2 = sg * sg * inv_r2
        t6 = s2 * s2 * s2
        t12 = t6 * t6
        flj = e4 * inv_r2 * (6.0 * t6 - 12.0 * t12)

        r = r2s * inv_r
        t = k1 * r + k0
        p = _horner(t, p_coeffs)
        inv_r3 = inv_r * inv_r2
        fes = qq * p * inv_r3

        # full lists: both (i,j) and (j,i) are computed from their own row
        # side, so row forces are complete; the r2 > tiny gate kills self
        # pairs and coincident padding atoms
        gate = (r2 < cut2) & (r2 > 1e-7)
        de_r = jnp.where(gate, flj + fes, 0.0)

        acc_fx = acc_fx + de_r * dx
        acc_fy = acc_fy + de_r * dy
        acc_fz = acc_fz + de_r * dz
        if compute_u:
            h = _horner(t, h_coeffs)
            e_pair = e4 * (t12 - t6) + qq * h * inv_r
            acc_u = acc_u + jnp.where(gate, e_pair, 0.0)
        return acc_fx, acc_fy, acc_fz, acc_u

    # UNROLL tiles per iteration; slots beyond count hold the zero-atom pad
    # slot (q = eps = 0) so over-iteration contributes exact zeros
    def body(jj, acc):
        j = UNROLL * jj
        for k in range(UNROLL):
            acc = one_col(j + k, acc)
        return acc

    if compute_u:
        init = (zeros, zeros, zeros, zeros)
    else:
        init = (zeros, zeros, zeros, zeros[:, :1])  # dead 1-lane accumulator
    n_iter = (count + UNROLL * COL - 1) // (UNROLL * COL)
    acc_fx, acc_fy, acc_fz, acc_u = jax.lax.fori_loop(0, n_iter, body, init)

    fx = jnp.sum(acc_fx, axis=1)
    fy = jnp.sum(acc_fy, axis=1)
    fz = jnp.sum(acc_fz, axis=1)
    if compute_u:
        u = 0.5 * jnp.sum(acc_u, axis=1)  # every pair visited from both sides
    else:
        u = jnp.zeros((ROW,), jnp.float32)
    z = jnp.zeros((ROW,), jnp.float32)
    out_ref[:, :] = jnp.stack([u, fx, fy, fz, z, z, z, z], axis=1)


@partial(jax.jit, static_argnames=("max_nbrs", "h_coeffs", "p_coeffs", "compute_u", "interpret"))
def gather_sweep(
    atoms8,  # (8, Npad) f32
    atomsT,  # (Npad, 8) f32
    counts,  # (nR,) int32
    nbr,  # (nR, max_nbrs) int32: sorted-order atom indices, padded with Npad-1
    scalars,  # (1, 8) f32
    max_nbrs: int,
    h_coeffs,
    p_coeffs,
    compute_u: bool = False,
    interpret: bool = False,
):
    """One compacted full-list sweep. Returns (u_atoms (Npad,), du_dx
    (Npad, 3)) f32 in sorted order; sum of u_atoms is the total energy (if
    compute_u)."""
    n_pad = atoms8.shape[1]
    n_rows = n_pad // ROW
    # vmap over rows puts the batch dim FIRST in the gather output —
    # (nR, 8, max_nbrs) natively, no lane-dim transpose (a lane<->sublane
    # transpose of this array measured ~seconds on v5e); flattened to 2D so
    # the Pallas block is a plain (8, max_nbrs) tile (measured slightly
    # faster than the (1, 8, max_nbrs) 3D block)
    cols = jax.vmap(lambda i: atoms8[:, i])(nbr).reshape(n_rows * 8, max_nbrs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec((ROW, 8), lambda i, c: (i, 0)),
            pl.BlockSpec((8, max_nbrs), lambda i, c: (i, 0)),
            pl.BlockSpec((1, 8), lambda i, c: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROW, 8), lambda i, c: (i, 0)),
    )
    out_rows = pl.pallas_call(
        partial(_gather_kernel, h_coeffs=h_coeffs, p_coeffs=p_coeffs, compute_u=compute_u),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=interpret,
    )(counts, atomsT, cols, scalars)
    return out_rows[:, 0], out_rows[:, 1:4]


@partial(jax.jit, static_argnames=("max_nbrs", "max_intervals"))
def build_gather_neighbors(conf, box, cutoff, max_nbrs: int, cell_size: float = 0.65, atom_mask=None,
                           max_intervals: int = MAX_INTERVALS):
    """Snake spatial sort + per-32-atom-row-chunk FULL neighbor lists via
    interval extraction (scatter-free; see module docstring).

    Returns (pad_order (Npad,) int32, counts (nR,) int32,
    nbr (nR, max_nbrs) int32 indices into the SORTED atom order padded with
    Npad-1, overflow int32 — positive when max_nbrs or max_intervals was
    exceeded)."""
    n = conf.shape[0]
    # at least one padding slot: list padding points at slot Npad-1, which must
    # never alias a real atom (pad slots carry q = eps = 0)
    n_pad = (n // ROW + 1) * ROW
    n_rows = n_pad // ROW

    box_diag = jnp.diagonal(box)
    dims = jnp.maximum(jnp.floor(box_diag / cell_size).astype(jnp.int32), 1)
    wrapped = conf[:, :3] - box_diag * jnp.floor(conf[:, :3] / box_diag)
    frac = wrapped / box_diag
    frac = frac - jnp.floor(frac)
    cxyz = jnp.minimum((frac * dims).astype(jnp.int32), dims - 1)
    cx, cy, cz = cxyz[:, 0], cxyz[:, 1], cxyz[:, 2]
    ky = jnp.where(cz % 2 == 0, cy, dims[1] - 1 - cy)
    row_parity = (cz * dims[1] + ky) % 2
    kx = jnp.where(row_parity == 0, cx, dims[0] - 1 - cx)
    snake = (cz * dims[1] + ky) * dims[0] + kx
    order = jnp.argsort(snake).astype(jnp.int32)
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
    rcen = 0.5 * (rmin + rmax)
    rhal = jnp.maximum(0.5 * (rmax - rmin), 0.0)
    r_has = jnp.any(vmask[:, :, 0], axis=1)

    # atom-vs-bbox distance per (row, atom): minimum-image gap per axis.
    # Masked atoms stay IN the lists (their q = eps = 0 rows contribute zero
    # arithmetically) so masks can't fragment the interval structure.
    dcl = rcen[:, None, :] - xs[None, :, :]  # (nR, Npad, 3)
    dcl = dcl - box_diag * jnp.floor(dcl / box_diag + 0.5)
    gap = jnp.maximum(jnp.abs(dcl) - rhal[:, None, :], 0.0)
    d2 = jnp.sum(gap * gap, axis=2)  # (nR, Npad)
    inside = (d2 < cutoff * cutoff) & r_has[:, None]

    # candidate runs in sorted order: rising/falling edges -> top_k extraction
    # (top_k of -position returns the smallest positions first)
    prev = jnp.concatenate([jnp.zeros((n_rows, 1), bool), inside[:, :-1]], axis=1)
    nxt = jnp.concatenate([inside[:, 1:], jnp.zeros((n_rows, 1), bool)], axis=1)
    rise = inside & ~prev
    fall = inside & ~nxt  # position of the LAST atom of a run
    pos = jnp.arange(n_pad, dtype=jnp.float32)[None, :]
    neg_inf = jnp.float32(-3e38)
    ni = min(max_intervals, n_pad)  # small systems: can't have more runs than atoms
    starts = -jax.lax.top_k(jnp.where(rise, -pos, neg_inf), ni)[0]  # ascending
    lasts = -jax.lax.top_k(jnp.where(fall, -pos, neg_inf), ni)[0]
    n_runs = jnp.sum(rise, axis=1).astype(jnp.int32)  # (nR,)
    run_valid = jnp.arange(ni)[None, :] < n_runs[:, None]
    lengths = jnp.where(run_valid, (lasts - starts + 1.0), 0.0).astype(jnp.int32)
    starts_i = jnp.where(run_valid, starts, 0.0).astype(jnp.int32)

    cum = jnp.cumsum(lengths, axis=1)  # (nR, NI)
    totals = cum[:, -1]
    overflow = jnp.maximum(jnp.max(totals) - max_nbrs, 0) + jnp.maximum(jnp.max(n_runs) - ni, 0)
    counts = jnp.minimum(totals, max_nbrs)

    # expand intervals to explicit indices: slot k of row r lives in run
    # iid = searchsorted(cum_r, k, right), at offset k - cum_r[iid-1]
    ks = jnp.arange(max_nbrs, dtype=jnp.int32)[None, :]
    iid = jax.vmap(lambda c: jnp.searchsorted(c, ks[0], side="right"))(cum)  # (nR, max_nbrs)
    iid_c = jnp.minimum(iid, ni - 1)
    cum_prev = jnp.concatenate([jnp.zeros((n_rows, 1), jnp.int32), cum[:, :-1]], axis=1)
    base = jax.vmap(lambda c, i: c[i])(cum_prev, iid_c)
    st = jax.vmap(lambda s, i: s[i])(starts_i, iid_c)
    idx = st + (ks - base)
    nbr = jnp.where(ks < counts[:, None], idx, n_pad - 1).astype(jnp.int32)

    return pad_order, counts, nbr, overflow


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


def suggest_max_nbrs(conf, box, cutoff, margin: float = 1.25, atom_mask=None) -> int:
    """Host-side: measure the largest per-row full neighbor count and pad with
    margin (diffusion headroom between rebuilds), rounded up to the kernel's
    UNROLL*COL slab width."""
    n = conf.shape[0]
    n_pad = (n // ROW + 1) * ROW
    _, counts, _, _ = build_gather_neighbors(
        jnp.asarray(conf, jnp.float32),
        jnp.asarray(box, jnp.float32),
        cutoff,
        max_nbrs=((n_pad + UNROLL * COL - 1) // (UNROLL * COL)) * UNROLL * COL,
        atom_mask=atom_mask,
    )
    peak = int(np.max(np.asarray(counts)))
    slab = UNROLL * COL
    return max(int(np.ceil(peak * margin / slab) * slab), slab)


def make_nonbonded_gather_md(
    beta: float,
    cutoff: float,
    max_nbrs: int,
    skin: float = 0.1,
    rebuild_interval: int = 20,
    interpret: bool = False,
    atom_mask=None,
):
    """Stateful MD force provider (API-compatible with
    make_nonbonded_rowscan_md): full lists culled at cutoff + skin, rebuilt
    every rebuild_interval steps; per-step work is one fused assemble+gather +
    one dense sweep.

    Returns (init_fn, apply_fn):
      init_fn(conf, params, box) -> state
      apply_fn(state, conf, params, box, t) -> (u, force, state')  [u == 0]
    """
    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)

    def _build(conf, params, box):
        pad_order, counts, nbr, overflow = build_gather_neighbors(
            jnp.asarray(conf, jnp.float32),
            jnp.asarray(box, jnp.float32),
            cutoff + skin,
            max_nbrs=max_nbrs,
            atom_mask=atom_mask,
        )
        n = conf.shape[0]
        inv = jnp.zeros(n, dtype=jnp.int32).at[pad_order[:n]].set(jnp.arange(n, dtype=jnp.int32))
        return (pad_order, inv, counts, nbr, overflow)

    def init_fn(conf, params, box):
        return _build(conf, params, box)

    def apply_fn(state, conf, params, box, t):
        state = jax.lax.cond(
            (t % rebuild_interval) == 0,
            lambda: _build(conf, params, box),
            lambda: state,
        )
        pad_order, inv, counts, nbr, _ = state
        n = conf.shape[0]
        atoms8 = _assemble(
            jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32),
            pad_order, n, atom_mask=atom_mask,
        )
        _, du_dx = gather_sweep(
            atoms8, atoms8.T, counts, nbr, _scalars(box, cutoff),
            max_nbrs=max_nbrs, h_coeffs=h_coeffs, p_coeffs=p_coeffs,
            compute_u=False, interpret=interpret,
        )
        force = -du_dx[inv]
        return jnp.zeros((), jnp.float32), force, state

    return init_fn, apply_fn


def make_nonbonded_gather_energy_force(
    beta: float, cutoff: float, max_nbrs: int, interpret: bool = False, atom_mask=None
):
    """(conf, params, box) -> (u, force) in one sweep (neighbor build
    included — use the MD provider for hot loops)."""
    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)

    def energy_and_force(conf, params, box):
        conf = jnp.asarray(conf, jnp.float32)
        params = jnp.asarray(params, jnp.float32)
        box = jnp.asarray(box, jnp.float32)
        pad_order, counts, nbr, _ = build_gather_neighbors(
            conf, box, cutoff, max_nbrs=max_nbrs, atom_mask=atom_mask
        )
        n = conf.shape[0]
        inv = jnp.zeros(n, dtype=jnp.int32).at[pad_order[:n]].set(jnp.arange(n, dtype=jnp.int32))
        atoms8 = _assemble(conf, params, box, pad_order, n, atom_mask=atom_mask)
        u_atoms, du_dx = gather_sweep(
            atoms8, atoms8.T, counts, nbr, _scalars(box, cutoff),
            max_nbrs=max_nbrs, h_coeffs=h_coeffs, p_coeffs=p_coeffs,
            compute_u=True, interpret=interpret,
        )
        u = jnp.sum(u_atoms)
        force = -du_dx[inv]
        return u, force

    return energy_and_force


def make_nonbonded_gather(beta: float, cutoff: float, max_nbrs: int, interpret: bool = False, atom_mask=None,
                          dp_max_tiles: int = None, dp_cb: int = 2):
    """Differentiable energy(conf, params, box) with custom VJP: the forward
    runs ONE sweep producing energy + analytic dU/dx (stashed); dU/dp comes
    from the v1 tile kernel's dp-only pass (dead-code-eliminated by XLA
    whenever the parameter cotangent is unused). Box cotangent is zero (no
    virial, matching the reference CUDA kernels)."""
    from timemachine_tpu.ops.pallas.nonbonded_kernel import _run_dp

    ef = make_nonbonded_gather_energy_force(beta, cutoff, max_nbrs, interpret=interpret, atom_mask=atom_mask)

    @jax.custom_vjp
    def energy(conf, params, box):
        u, _ = ef(conf, params, box)
        return u

    def fwd(conf, params, box):
        u, force = ef(conf, params, box)
        return u, (-force, conf, params, box)

    def bwd(res, g):
        du_dx, conf, params, box = res
        if dp_max_tiles is None:
            raise ValueError("dp_max_tiles required for parameter gradients")
        du_dp = _run_dp(conf, params, box, beta, cutoff, dp_max_tiles, interpret, cb=dp_cb, atom_mask=atom_mask)
        return g * du_dx, g * du_dp, jnp.zeros_like(box)

    energy.defvjp(fwd, bwd)
    return energy
