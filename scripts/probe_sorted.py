"""Measure the sorted-state-MD assemble options (TPU, 23k water dump).

Today the Context carries x in CANONICAL order and the rowscan provider
pays, per step: one (N,3) row gather (atomsT rows), three 1-D permutation
gathers (chunk-major columns) and one (Npad,3) un-sort gather of the
force epilogue. If the Context instead carried x in SORTED (pad_order)
space, those gathers disappear — but the (nC,1,COL) column layout must
then be built from the sorted row-major carry by slice+reshape, which is
the lane<->sublane transpose the cm design originally avoided. This probe
prices every variant inside an evolving scan so the winner is measured,
not assumed:

  a. current: canonical carry, gather-based cm assemble + un-sort epilogue
  b. sorted row-major carry, atoms_cm via x[:,k] slice -> reshape
  c. sorted row-major carry, atoms_cm via one (3,Npad) transpose -> reshape
  d. b + bonded round-trip (x[inv] row gather + f[pad_order] row gather),
     i.e. the TRUE sorted-mode step cost with canonical bonded terms
  e. isolated costs: un-sort epilogue alone, round-trip alone

    nohup timeout 1800 python scripts/probe_sorted.py > /tmp/probe_sorted.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 200


def timed_scan(name, step_fn, carry0, n_steps=N_STEPS):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), carry, None, length=n_steps)[0]

    out = jax.block_until_ready(run(carry0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(carry0))
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{name:52s} {dt * 1e3:8.3f} ms/step", flush=True)
    return dt


def main():
    from timemachine_tpu.ops.pallas.rowscan_kernel import (
        COL,
        es_energy_force_series,
        make_nonbonded_rowscan_md,
        suggest_max_pairs,
    )

    d = np.load("/tmp/water23k.npz")
    conf = jnp.asarray(d["x0"][:, :3], jnp.float32)
    box = jnp.asarray(d["box"], jnp.float32)
    params = jnp.asarray(d["params"], jnp.float32)
    beta, cutoff = float(d["beta"]), float(d["cutoff"])
    n = conf.shape[0]
    print("system:", conf.shape, flush=True)

    mp = suggest_max_pairs(np.asarray(conf), np.asarray(box), cutoff + 0.1, margin=1.4, triangular=True)
    prov = make_nonbonded_rowscan_md(beta, cutoff, mp, skin=0.1, triangular=True, preshift=True)
    init_fn, apply_fn = prov[0], prov[1]

    state0 = jax.block_until_ready(init_fn(conf, params, box))
    pad_order = state0[0]
    inv = state0[-3]
    prows_cm, prowsT = state0[-2], state0[-1]
    n_pad = pad_order.shape[0]
    nc = n_pad // COL
    print(f"n_pad {n_pad} chunks {nc}", flush=True)

    # (a) current full apply (canonical carry), no rebuild (t=1 fixed)
    def step_a(carry):
        x, st = carry
        _, f, st = apply_fn(st, x, params, box, 1)
        return (x + 1e-6 * f, st)

    timed_scan("a. canonical apply (gather cm + unsort epi)", step_a, (conf, state0))

    # shared pieces for sorted variants
    from timemachine_tpu.ops.pallas.rowscan_kernel import ROW, _scalars, chop_row_counts, rowscan_sweep_cm

    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)
    tiles = state0[:-3]
    row_start, row_count, col_ids = tiles[1], tiles[2], tiles[3]
    rank_mat, rcen_q = tiles[4], tiles[5]
    x_s0 = conf[pad_order]  # (Npad, 3) sorted carry

    def sorted_sweep(x_s, atoms_cm_builder):
        box_diag = jnp.diagonal(box)
        wrapped = x_s - box_diag * jnp.floor(x_s / box_diag)
        z1 = jnp.zeros((n_pad, 1), jnp.float32)
        atomsT = jnp.concatenate([wrapped, prowsT, z1], axis=1)  # (Npad, 8)
        atoms_cm = atoms_cm_builder(wrapped)
        rc = chop_row_counts(atoms_cm, rank_mat, row_count, box, cutoff)
        out = rowscan_sweep_cm(
            atoms_cm, atomsT, row_start, rc, col_ids, _scalars(box, cutoff),
            n_pad // ROW, mp, h_coeffs, p_coeffs, compute_u=False, triangular=True,
            rcen_q=rcen_q,
        )
        return out[:, 1:4]

    def cm_via_slices(wrapped):
        xyz_cm = [wrapped[:, k].reshape(nc, 1, COL) for k in range(3)]
        return jnp.concatenate(xyz_cm + [prows_cm], axis=1)

    def cm_via_transpose(wrapped):
        x3 = wrapped.T.reshape(3, nc, COL).transpose(1, 0, 2)
        return jnp.concatenate([x3, prows_cm], axis=1)

    def step_b(carry):
        (x_s,) = carry
        f_s = sorted_sweep(x_s, cm_via_slices)
        return (x_s - 1e-6 * f_s,)

    timed_scan("b. sorted carry, cm via slice+reshape", step_b, (x_s0,))

    def step_c(carry):
        (x_s,) = carry
        f_s = sorted_sweep(x_s, cm_via_transpose)
        return (x_s - 1e-6 * f_s,)

    timed_scan("c. sorted carry, cm via (3,Npad) transpose", step_c, (x_s0,))

    def step_d(carry):
        (x_s,) = carry
        f_s = sorted_sweep(x_s, cm_via_slices)
        # canonical round-trip for bonded terms
        x_c = x_s[inv]
        f_c = 1e-3 * x_c  # stand-in bonded force in canonical space
        f_s = f_s + f_c[pad_order]
        return (x_s - 1e-6 * f_s,)

    timed_scan("d. sorted carry + canonical bonded round-trip", step_d, (x_s0,))

    # (e) isolated permutation costs
    f0 = jnp.asarray(np.random.default_rng(0).normal(size=(n_pad, 3)), jnp.float32)

    def step_unsort(carry):
        f_s, acc = carry
        f_canon = f_s[inv]
        return (f_s, acc + f_canon.sum())

    timed_scan("e1. un-sort gather (Npad,3)->[inv] alone", step_unsort, (f0, jnp.float32(0)))

    def step_roundtrip(carry):
        x_s, acc = carry
        x_c = x_s[inv]
        back = x_c[pad_order]
        return (x_s + 1e-9, acc + back.sum())

    timed_scan("e2. x[inv] + x[pad_order] round-trip alone", step_roundtrip, (x_s0, jnp.float32(0)))

    # parity: sorted-mode force (b) un-sorted == canonical apply force
    _, f_ref, _ = apply_fn(state0, conf, params, box, 1)
    f_b = sorted_sweep(x_s0, cm_via_slices)
    f_b_canon = -f_b[inv]
    err = float(jnp.max(jnp.abs(f_b_canon - f_ref)) / (jnp.max(jnp.abs(f_ref)) + 1e-9))
    print(f"parity sorted-vs-canonical force rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
