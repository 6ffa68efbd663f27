"""Measured verdict on the half-precision (bf16) distance prefilter
(named in ARCHITECTURE round-1 priorities; VERDICT r3 Next #5 asks for a
measurement). Two independent questions decide whether the idea can pay:

  A. --rate (TPU): does the VPU actually run the per-slot distance+gate
     sequence (3 sub, 3 mul, 2 add, 1 cmp) faster in bf16 than f32?
     Times a pallas kernel sweeping the identical op sequence in both
     dtypes over VMEM-resident data. If the ratio is ~1x, a bf16
     prefilter pass only ADDS work.

  B. --census (CPU, offline): on the real solvated-DHFR tile state
     (32x128 tiles, bbox-gap cull + per-step bare-cutoff chop — the
     production pipeline), what fraction of swept tiles contain ZERO
     in-cutoff pairs? That fraction is the HARD CEILING on work a
     tile-granular prefilter skip (`@pl.when(any_hit)`) could remove;
     lane-granular skipping does not exist on SIMD.

Reference analog: the prefilter idea mirrors GPU neighbor-list kernels'
half-precision distance checks (e.g. ref timemachine/cpp/src/kernels/
k_nonbonded.cuh's __half trick); on TPU the economics differ and are
measured here rather than assumed.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe_rate():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    SUB, LANE, T = 256, 1024, 64  # (256,1024) block, 64 sweep iterations

    def kern(a_ref, b_ref, o_ref, *, dtype):
        a = a_ref[:].astype(dtype)
        b = b_ref[:].astype(dtype)
        cut2 = jnp.asarray(1.44, dtype)
        acc = jnp.zeros(a.shape, dtype)

        def body(t, acc):
            # the per-slot distance+gate sequence, shifted each iter so the
            # compiler cannot hoist it (scalar math in f32: Mosaic cannot
            # legalize scalar bf16 arith; vector bf16 is the thing measured)
            sh = (1.0 + t.astype(jnp.float32) * 1e-3).astype(dtype)
            dx = a - b * sh
            dy = a * sh - b
            dz = a - b
            r2 = dx * dx + dy * dy + dz * dz
            # Mosaic (this toolchain) cannot legalize bf16 vector compares
            # ('arith.cmpf' fails); gate in f32 — the bf16 thing measured is
            # the distance arithmetic itself
            hit = (r2.astype(jnp.float32) < 1.44).astype(dtype)
            return acc + hit

        acc = jax.lax.fori_loop(0, T, body, acc)
        o_ref[:] = acc.astype(jnp.float32)

    a = np.random.default_rng(0).uniform(0.2, 2.0, (SUB, LANE)).astype(np.float32)
    b = np.random.default_rng(1).uniform(0.2, 2.0, (SUB, LANE)).astype(np.float32)
    out = {}
    for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        import functools

        f = pl.pallas_call(
            functools.partial(kern, dtype=dtype),
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        )
        f = jax.jit(f)
        r = f(a, b)
        r.block_until_ready()
        n_rep = 200
        t0 = time.perf_counter()
        for _ in range(n_rep):
            r = f(a, b)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / n_rep
        slots = SUB * LANE * T
        out[name] = dt
        print(f"{name}: {dt*1e6:8.1f} us/call  {dt/slots*1e12:6.2f} ps/slot-iter")
    print(f"bf16 speedup over f32: {out['f32']/out['bf16']:.2f}x")


def probe_census():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from probe_slots import chunk_bboxes, gap2, hilbert_order

    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    ROW, COL = 32, 128
    CUTOFF, SKIN = 1.2, 0.1

    cfg = setup_dhfr_native(waters_first=True)
    conf = np.asarray(cfg.conf, np.float64)[:, :3]
    box = np.asarray(cfg.box, np.float64)
    box_diag = np.diagonal(box)
    n = conf.shape[0]

    order, wrapped = hilbert_order(conf, box)
    xs = wrapped[order]
    n_pad = -(-n // COL) * COL
    # pad with far-away ghosts so padding never lands in-cutoff
    ghost = box_diag / 2.0 + 100.0
    xs_pad = np.concatenate([xs, np.tile(ghost, (n_pad - n, 1))])

    n_row = n_pad // ROW
    n_col = n_pad // COL
    rmin, rmax = chunk_bboxes(xs_pad, ROW)
    cmin, cmax = chunk_bboxes(xs_pad, COL)

    # build-time cull at cutoff+skin, triangular (col chunk <= row chunk's)
    g2 = gap2(rmin, rmax, cmin, cmax, box_diag)  # (n_row, n_col)
    row_of_col = (np.arange(n_col) * COL) // ROW  # first row chunk of col c
    tri = np.arange(n_row)[:, None] >= ((np.arange(n_col) + 1) * (COL // ROW))[None, :] - 1
    # include: row chunk strictly after the col chunk's own rows, plus the
    # diagonal tile handled by the peel — count loop tiles only, like the
    # kernel's per-row lists
    loop = (np.arange(n_row)[:, None] * ROW >= (np.arange(n_col)[None, :] + 1) * COL)
    built = loop & (g2 <= (CUTOFF + SKIN) ** 2)
    # per-step chop at bare cutoff
    chopped = built & (g2 <= CUTOFF**2)

    n_built = int(built.sum())
    n_chop = int(chopped.sum())

    # exact any-hit per surviving tile
    empty = 0
    hits_total = 0
    rows_idx, cols_idx = np.nonzero(chopped)
    for ri, ci in zip(rows_idx, cols_idx):
        xr = xs_pad[ri * ROW : (ri + 1) * ROW]
        xc = xs_pad[ci * COL : (ci + 1) * COL]
        d = xr[:, None, :] - xc[None, :, :]
        d -= box_diag * np.round(d / box_diag)
        r2 = np.sum(d * d, axis=2)
        k = int((r2 < CUTOFF**2).sum())
        hits_total += k
        if k == 0:
            empty += 1

    slots = n_chop * ROW * COL
    print(f"n_atoms {n}  row_chunks {n_row}  col_chunks {n_col}")
    print(f"tiles built {n_built}  after chop {n_chop}")
    print(f"all-empty tiles after chop: {empty} ({empty/max(n_chop,1)*100:.2f}%)")
    print(f"swept slots {slots/1e6:.1f}M  in-cutoff {hits_total/1e6:.1f}M "
          f"(occupancy {hits_total/max(slots,1)*100:.1f}%)")
    print(f"prefilter skip ceiling: {empty/max(n_chop,1)*100:.2f}% of sweep time")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--rate", action="store_true")
    p.add_argument("--census", action="store_true")
    args = p.parse_args()
    if args.rate:
        probe_rate()
    if args.census:
        probe_census()
