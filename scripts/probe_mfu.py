"""MFU / roofline accounting for the rowscan hot path (VERDICT r4 item 5).

Produces the numbers for the ARCHITECTURE.md "single-chip MFU verdict":
  1. measured VPU f32 peak via a pure-FMA Pallas kernel (the pair sweep is
     elementwise VPU work — the MXU plays no role in it);
  2. the DHFR sweep's slot census and measured slot rate;
  3. static FLOPs/slot of the force-only inner body (counted from
     ops/pallas/rowscan_kernel.py, FMA = 2);
  4. the exact ideal in-cutoff pair count (periodic cKDTree);
  => achieved FLOP/s, occupancy, and VPU utilization — plus the same
     accounting applied to the reference CUDA kernel on its assumed GPU.

Run on the TPU: python scripts/probe_mfu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# static per-slot FLOP count of the force-only (MD) preshift inner body,
# counted from _rowscan_kernel/one_col (FMA=2, select/cmp=1, rsqrt=1):
#   dx/dy/dz (3) + r2 (5) + max (1) + rsqrt (1) + inv_r2 (1)
#   + qq/sg/e4 (3) + s2 (2) + t6 (2) + et6 (1) + r (1) + t (2)
#   + flj (3) + ES force Horner deg-7 (14) + fes (2) + gate (1)
#   + de_r (3) + tx/ty/tz (3) + row acc (3) + col reaction (amortized 3+1)
FLOPS_PER_SLOT_FORCE = 52 + 4  # loop tiles, has_w=False (apo DHFR)

A100_F32_TFLOPS = 19.5  # CUDA-core f32 peak of the assumed reference GPU
ASSUMED_CUDA_NS_DAY = 500.0  # BASELINE.md assumption
CUDA_NB_FRACTION = 0.7  # fraction of the CUDA step spent in the nb kernel (typical)
CUDA_FLOPS_PER_PAIR = 2 * FLOPS_PER_SLOT_FORCE  # erfc + fixed-point; same order


def measure_vpu_peak():
    """UNRELIABLE — kept for the record. Every variant tried (serial FMA
    chains, cross-coupled chains, grid-blocked IO) is collapsed by
    Mosaic/LLVM: measured time is INNER-invariant (~0.03 ms/call whether
    INNER=64 or 512), so the 'peak' it reports (100-300+ TF) is fictitious.
    The roofline instead anchors on the real kernel's measured issue rate
    (see main: ~1 vector-op/lane/cycle)."""
    from jax.experimental import pallas as pl

    BLK = (8, 1024)
    INNER = 512
    GRID = 256

    def kernel(x_ref, o_ref):
        # cross-coupled chains: no affine closed form, nothing to collapse
        a0 = x_ref[...]
        a1 = a0 * 1.0000001
        a2 = a0 * 1.0000002
        a3 = a0 * 1.0000003
        for _ in range(INNER):
            t0 = a0 * a1 + 1e-7
            t1 = a1 * a2 + 1e-7
            t2 = a2 * a3 + 1e-7
            t3 = a3 * a0 + 1e-7
            a0, a1, a2, a3 = t0, t1, t2, t3
        o_ref[...] = a0 + a1 + a2 + a3

    x = jnp.ones((GRID * BLK[0], BLK[1]), jnp.float32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(GRID,),
        in_specs=[pl.BlockSpec(BLK, lambda i: (i, 0))],
        out_specs=pl.BlockSpec(BLK, lambda i: (i, 0)),
    )
    run = jax.jit(lambda x: fn(x))
    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    for _ in range(10):
        out = run(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    flops = GRID * 4 * INNER * BLK[0] * BLK[1] * 2  # FMA = 2
    return flops / dt


def ideal_pair_count(conf, box, cutoff):
    from scipy.spatial import cKDTree

    box_diag = np.diagonal(np.asarray(box))
    wrapped = np.asarray(conf) - box_diag * np.floor(np.asarray(conf) / box_diag)
    wrapped = np.clip(wrapped, 0.0, np.nextafter(box_diag, 0.0))
    tree = cKDTree(wrapped, boxsize=box_diag)
    return tree.count_neighbors(tree, cutoff) // 2 - 0  # i<j pairs (self incl. once)


def main():
    from timemachine_tpu.ops.pallas.rowscan_kernel import (
        COL,
        ROW,
        chop_row_counts,
        es_energy_force_series,
        make_nonbonded_rowscan_md,
        rowscan_sweep_cm,
        suggest_max_pairs,
        _scalars,
    )
    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    # NOTE: a DIY 'VPU peak' FMA micro-kernel is compiler-collapsed on this
    # toolchain (see measure_vpu_peak docstring) — the roofline below anchors
    # on the measured issue rate of the real kernel instead.
    vpu_peak = 2 * 1024 * 4 * 1.67e9  # nominal upper bound: 4-issue FMA/lane

    cfg = setup_dhfr_native(waters_first=True)
    conf = jnp.asarray(cfg.conf[:, :3], jnp.float32)
    box = jnp.asarray(cfg.box, jnp.float32)
    nb = cfg.host_system.nonbonded_all_pairs
    params = jnp.asarray(nb.params, jnp.float32)
    beta, cutoff = float(nb.potential.beta), float(nb.potential.cutoff)
    n = conf.shape[0]

    n_ideal = ideal_pair_count(conf, box, cutoff)
    print(f"ideal in-cutoff pairs (N={n}): {n_ideal / 1e6:.2f} M", flush=True)

    cell = 0.65
    mp = suggest_max_pairs(np.asarray(conf), np.asarray(box), cutoff + 0.1, margin=1.4,
                           triangular=True, cell_size=cell)
    init_fn, apply_fn, *_ = make_nonbonded_rowscan_md(
        beta, cutoff, mp, skin=0.1, triangular=True, preshift=True, cell_size=cell, has_w=False
    )
    state0 = jax.block_until_ready(init_fn(conf, params, box))
    pad_order, row_start, row_count, col_ids, rank_mat, rcen_q, inval = state0[:7]
    n_pad = pad_order.shape[0]
    chopped = chop_row_counts(
        jnp.concatenate(
            [np.asarray(conf)[np.asarray(pad_order)][:, k].reshape(n_pad // COL, 1, COL) for k in range(3)]
            + [state0[-2]],
            axis=1,
        ),
        rank_mat, row_count, box, cutoff,
    )
    slots = (int(np.asarray(chopped).sum()) + n_pad // ROW) * ROW * COL
    print(f"swept slots/step (chopped + diag): {slots / 1e6:.1f} M "
          f"(occupancy {n_ideal / slots:.3f} of Newton-pair slots)", flush=True)

    # sweep-only timing (fixed tiles, evolving scan — probe_residual method)
    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)
    box_diag = jnp.diagonal(box)
    wrapped = conf - box_diag * jnp.floor(conf / box_diag)
    xyzN = wrapped[pad_order]
    prows_cm, prowsT = state0[-2], state0[-1]
    atomsT0 = jnp.concatenate([xyzN, prowsT, jnp.zeros((n_pad, 1), jnp.float32)], axis=1)
    nc = n_pad // COL
    atoms_cm0 = jnp.concatenate(
        [wrapped[:, k][pad_order].reshape(nc, 1, COL) for k in range(3)] + [prows_cm], axis=1
    )
    scal = _scalars(box, cutoff)
    n_rows = n_pad // ROW

    def step_sweep(carry):
        atoms_cm, atomsT = carry
        out = rowscan_sweep_cm(
            atoms_cm, atomsT, row_start, chopped, col_ids, scal,
            n_rows=n_rows, max_pairs=mp, h_coeffs=h_coeffs, p_coeffs=p_coeffs,
            compute_u=False, triangular=True, rcen_q=rcen_q, has_w=False,
        )
        d = 1e-9 * jnp.clip(out[0, 1], -1.0, 1.0)
        return atoms_cm + d, atomsT + d

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step_sweep(c), None), c, None, length=100)[0]

    c0 = (atoms_cm0, atomsT0)
    jax.block_until_ready(run(c0))
    t0 = time.perf_counter()
    jax.block_until_ready(run(c0))
    dt_sweep = (time.perf_counter() - t0) / 100

    slot_rate = slots / dt_sweep
    achieved = slot_rate * FLOPS_PER_SLOT_FORCE
    useful = n_ideal * FLOPS_PER_SLOT_FORCE / dt_sweep
    print(f"sweep: {dt_sweep * 1e3:.3f} ms/step -> {slot_rate / 1e9:.1f} Gslot/s", flush=True)
    print(f"achieved swept-slot rate: {achieved / 1e12:.2f} TFLOP/s "
          f"({achieved / vpu_peak:.1%} of the nominal 4-issue VPU bound)", flush=True)
    print(f"useful-pair rate: {useful / 1e12:.2f} TFLOP/s "
          f"({useful / vpu_peak:.1%} of nominal bound)", flush=True)
    # clock-normalized issue anchor: VPU has 1024 lanes; static count ~40
    # issued vector ops/slot (FMAs fused). ops/lane/cycle ≈ 1 ⇒ the sweep is
    # ALU-issue-bound, not memory- or bandwidth-bound.
    CLOCK = 1.67e9  # v5e TensorCore clock (public spec ballpark)
    issues_per_slot = 40.0
    print(f"issue anchor: {slot_rate * issues_per_slot / (1024 * CLOCK):.2f} "
          f"vector-ops/lane/cycle at {CLOCK / 1e9:.2f} GHz assumed clock", flush=True)

    # the same accounting for the assumed CUDA reference
    step_s = 2.5e-6 / ASSUMED_CUDA_NS_DAY * 86400  # s/step at dt=2.5fs
    cuda_useful = n_ideal * CUDA_FLOPS_PER_PAIR / (step_s * CUDA_NB_FRACTION)
    print(
        f"reference CUDA accounting (assumed {ASSUMED_CUDA_NS_DAY} ns/day, "
        f"{CUDA_NB_FRACTION:.0%} in nb kernel, ~{CUDA_FLOPS_PER_PAIR} FLOP/pair): "
        f"{cuda_useful / 1e12:.2f} TFLOP/s useful = "
        f"{cuda_useful / (A100_F32_TFLOPS * 1e12):.1%} of A100 f32 peak",
        flush=True,
    )


if __name__ == "__main__":
    main()
