"""Isolate the DHFR nonbonded-step residual (TPU): what of the ~4.1 ms
nb-only step is sweep kernel vs per-step assemble/chop vs amortized rebuild
vs integrator. All variants run inside an evolving lax.scan (x feeds back) so
nothing constant-folds; methodology matches probe_preshift.py.

    nohup timeout 2400 python scripts/probe_residual.py > /tmp/probe_residual.log 2>&1 &
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
    print(f"{name:48s} {dt * 1e3:8.3f} ms/step", flush=True)
    return dt


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

    cfg = setup_dhfr_native(waters_first=True)
    conf = jnp.asarray(cfg.conf[:, :3], jnp.float32)
    box = jnp.asarray(cfg.box, jnp.float32)
    nb = cfg.host_system.nonbonded_all_pairs
    params = jnp.asarray(nb.params, jnp.float32)
    beta = float(nb.potential.beta)
    cutoff = float(nb.potential.cutoff)
    print("system:", conf.shape, flush=True)

    cell = float(os.environ.get("TM_PROBE_CELL", "0.65"))
    has_w = not os.environ.get("TM_PROBE_NO_W")
    mp = suggest_max_pairs(np.asarray(conf), np.asarray(box), cutoff + 0.1, margin=1.4, triangular=True, cell_size=cell)
    print(f"max_pairs: {mp} cell_size {cell} has_w {has_w}", flush=True)
    prov = make_nonbonded_rowscan_md(beta, cutoff, mp, skin=0.1, triangular=True, preshift=True, cell_size=cell, has_w=has_w)
    init_fn, apply_fn = prov[0], prov[1]
    energy_fn = prov[2]

    state0 = jax.block_until_ready(init_fn(conf, params, box))
    # tiles census
    pad_order, row_start, row_count, col_ids, rank_mat, rcen_q, inval = state0[:7]
    n_pad = pad_order.shape[0]
    print(
        f"built tiles {int(np.asarray(row_count).sum())}  invalid {int(np.asarray(inval))}  "
        f"slots {(int(np.asarray(row_count).sum()) + n_pad // ROW) * ROW * COL / 1e6:.1f} M",
        flush=True,
    )

    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)

    # (a) full provider apply, t varying (rebuild every 20 steps)
    def step_full(carry):
        x, st, t = carry
        _, f, st = apply_fn(st, x, params, box, t)
        return x + 1e-9 * jnp.clip(f, -100.0, 100.0), st, t + 1

    timed_scan("provider apply (rebuild every 20)", step_full, (conf, state0, jnp.asarray(1, jnp.int32)))

    # (b) provider apply, no rebuild (t fixed at 1)
    def step_norebuild(carry):
        x, st = carry
        _, f, st = apply_fn(st, x, params, box, 1)
        return x + 1e-9 * jnp.clip(f, -100.0, 100.0), st

    timed_scan("provider apply (no rebuild)", step_norebuild, (conf, state0))

    # (c) sweep kernel only: atoms_cm/atomsT prebuilt, evolve via cheap add
    prows_cm = state0[-2]
    prowsT = state0[-1]
    box_diag = jnp.diagonal(box)
    wrapped = conf - box_diag * jnp.floor(conf / box_diag)
    xyzN = wrapped[pad_order]
    atomsT0 = jnp.concatenate([xyzN, prowsT, jnp.zeros((n_pad, 1), jnp.float32)], axis=1)
    nc = n_pad // COL
    xyz_cm = [wrapped[:, k][pad_order].reshape(nc, 1, COL) for k in range(3)]
    atoms_cm0 = jnp.concatenate(xyz_cm + [prows_cm], axis=1)
    scal = _scalars(box, cutoff)
    n_rows = n_pad // ROW
    chopped = chop_row_counts(atoms_cm0, rank_mat, row_count, box, cutoff)
    print(f"chopped tiles {int(np.asarray(chopped).sum())}", flush=True)

    def step_sweep(carry):
        atoms_cm, atomsT = carry
        out = rowscan_sweep_cm(
            atoms_cm, atomsT, row_start, chopped, col_ids, scal,
            n_rows=n_rows, max_pairs=mp, h_coeffs=h_coeffs, p_coeffs=p_coeffs,
            compute_u=False, triangular=True, rcen_q=rcen_q, has_w=has_w,
        )
        d = 1e-9 * jnp.clip(out[0, 1], -1.0, 1.0)
        return atoms_cm + d, atomsT + d

    timed_scan("sweep only (fixed tiles, chopped counts)", step_sweep, (atoms_cm0, atomsT0))
    if os.environ.get("TM_PROBE_QUICK"):
        return

    # (c2) sweep without chop (built counts incl. skin shell)
    def step_sweep_nochop(carry):
        atoms_cm, atomsT = carry
        out = rowscan_sweep_cm(
            atoms_cm, atomsT, row_start, row_count, col_ids, scal,
            n_rows=n_rows, max_pairs=mp, h_coeffs=h_coeffs, p_coeffs=p_coeffs,
            compute_u=False, triangular=True, rcen_q=rcen_q,
        )
        d = 1e-9 * jnp.clip(out[0, 1], -1.0, 1.0)
        return atoms_cm + d, atomsT + d

    timed_scan("sweep only (unchopped counts)", step_sweep_nochop, (atoms_cm0, atomsT0))

    # (d) assemble+chop only: everything in _sweep_from_state except the sweep
    def step_assemble(carry):
        x = carry
        conf32 = jnp.asarray(x, jnp.float32)
        wrapped = conf32 - box_diag * jnp.floor(conf32 / box_diag)
        xyzN = wrapped[pad_order]
        atomsT = jnp.concatenate([xyzN, prowsT, jnp.zeros((n_pad, 1), jnp.float32)], axis=1)
        xyz_cm = [wrapped[:, k][pad_order].reshape(nc, 1, COL) for k in range(3)]
        atoms_cm = jnp.concatenate(xyz_cm + [prows_cm], axis=1)
        rc = chop_row_counts(atoms_cm, rank_mat, row_count, box, cutoff)
        # consume all outputs without a sweep
        s = jnp.sum(atoms_cm[0, 0, :1]) + jnp.sum(atomsT[0, :1]) + rc[0].astype(jnp.float32)
        return x + 1e-12 * s

    timed_scan("assemble + chop only (no sweep)", step_assemble, conf)

    # (e) chop only
    def step_chop(carry):
        atoms_cm = carry
        rc = chop_row_counts(atoms_cm, rank_mat, row_count, box, cutoff)
        return atoms_cm + 1e-12 * rc[0].astype(jnp.float32)

    timed_scan("chop only", step_chop, atoms_cm0)

    # (f) force gather (sorted -> canonical) like the provider epilogue
    inv = state0[-3]
    out0 = jnp.zeros((n_pad, 8), jnp.float32)

    def step_gather(carry):
        out = carry
        f = -out[inv, 1:4]
        return out + 1e-12 * jnp.sum(f[:1, :1])

    timed_scan("force gather epilogue only", step_gather, out0)

    # (g) energy sweep (the barostat path: compute_u through cached tiles)
    def step_energy(carry):
        x = carry
        u = energy_fn(state0, x, params, box)
        return x + 1e-12 * u

    timed_scan("energy sweep (barostat path, 1 of 2)", step_energy, conf)


if __name__ == "__main__":
    main()
