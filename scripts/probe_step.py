"""In-scan component probes for the 23k-atom NPT water step (TPU).

Every probe runs a 300-step lax.scan whose carry evolves (outputs feed back
into inputs) so XLA cannot hoist or elide the probed computation. Timings
are (t_total / n_steps). Run on the real chip:

    nohup timeout 3600 python scripts/probe_step.py > /tmp/probe_step.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 300


def load_system():
    d = np.load("/tmp/water23k.npz")
    return (
        jnp.asarray(d["x0"], jnp.float32),
        jnp.asarray(d["box"], jnp.float32),
        jnp.asarray(d["params"], jnp.float32),
        float(d["cutoff"]),
        float(d["beta"]),
    )


def timed_scan(name, step_fn, carry0, n_steps=N_STEPS):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), carry, None, length=n_steps)[0]

    out = run(carry0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(carry0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{name:45s} {dt * 1e3:8.3f} ms/step", flush=True)
    return dt


def main():
    from timemachine_tpu.ops.pallas.rowscan_kernel import (
        make_nonbonded_rowscan_md,
        suggest_max_pairs,
    )

    x0, box, params, cutoff, beta = load_system()
    print(f"n_atoms={x0.shape[0]} cutoff={cutoff} beta={beta}", flush=True)

    mp = suggest_max_pairs(np.asarray(x0), np.asarray(box), cutoff + 0.1, triangular=True)
    print(f"max_pairs={mp}", flush=True)
    init_fn, apply_fn, energy_fn = make_nonbonded_rowscan_md(beta, cutoff, mp, skin=0.1, rebuild_interval=20)[:3]
    state0 = init_fn(x0, params, box)
    jax.block_until_ready(jax.tree.leaves(state0))

    # P0: full production apply (incl. amortized rebuild every 20)
    def p0(c):
        x, st, t = c
        _, f, st = apply_fn(st, x, params, box, t)
        return (x + 1e-7 * f, st, t + 1)

    timed_scan("P0 apply_fn (rebuild/20 amortized)", p0, (x0, state0, jnp.int32(0)))

    # P1: sweep only (fixed tiles)
    def p1(c):
        x, st = c
        _, f, _ = apply_fn(st, x, params, box, jnp.int32(1))  # t=1 -> no rebuild
        return (x + 1e-7 * f, st)

    timed_scan("P1 sweep+assemble (no rebuild)", p1, (x0, state0))

    # P2: assemble only — gather + transpose + concat, consumed via sum
    pad_order = state0[0]
    prows, prowsT = state0[6], state0[7]
    n_pad = pad_order.shape[0]
    box_diag = jnp.diagonal(box)

    def p2(c):
        x, acc = c
        wrapped = x[:, :3] - box_diag * jnp.floor(x[:, :3] / box_diag)
        xyzN = wrapped[pad_order]
        z1 = jnp.zeros((1, n_pad), jnp.float32)
        atoms8 = jnp.concatenate([xyzN.T, prows, z1], axis=0)
        atomsT = jnp.concatenate([xyzN, prowsT, z1.T], axis=1)
        s = jnp.sum(atoms8[:4]) + jnp.sum(atomsT[:, :4])
        return (x + 1e-12 * s, acc + s)

    timed_scan("P2 assemble (gather+T+concat)", p2, (x0, jnp.float32(0)))

    # P3: the transpose alone
    def p3(c):
        x, acc = c
        xyzT = x.T  # (3, N)
        s = jnp.sum(xyzT)
        return (x + 1e-12 * s, acc + s)

    timed_scan("P3 transpose (N,3)->(3,N)", p3, (x0, jnp.float32(0)))

    # P4: gather alone
    def p4(c):
        x, acc = c
        xyzN = x[pad_order]
        s = jnp.sum(xyzN)
        return (x + 1e-12 * s, acc + s)

    timed_scan("P4 gather rows (Npad,3)", p4, (x0, jnp.float32(0)))

    # P5: tile rebuild alone
    from timemachine_tpu.ops.pallas.rowscan_kernel import build_rowscan_tiles

    def p5(c):
        x, acc = c
        _, rs, rc, ci, _ = build_rowscan_tiles(x, params, box, cutoff + 0.1, max_pairs=mp, triangular=True)
        s = jnp.sum(rc) + ci[0] + rs[0]
        return (x + 1e-12 * jnp.float32(s), acc + s)

    timed_scan("P5 tile rebuild", p5, (x0, jnp.int32(0)))

    # P6: bonded (water bonds+angles via production path)
    d = np.load("/tmp/water23k.npz")
    bond_idxs = jnp.asarray(d["bond_idxs"], jnp.int32)
    from timemachine_tpu.ops import bonded as bops

    n_bonds = bond_idxs.shape[0]
    bond_params = jnp.tile(jnp.asarray([[462750.4, 0.09572]], jnp.float32), (n_bonds, 1))

    def p6(c):
        x, acc = c
        u = bops.harmonic_bond(x, bond_params, box, bond_idxs)
        f = -jax.grad(lambda xx: bops.harmonic_bond(xx, bond_params, box, bond_idxs))(x)
        return (x + 1e-9 * f, acc + u)

    timed_scan("P6 harmonic bonds grad (15.3k)", p6, (x0, jnp.float32(0)))


if __name__ == "__main__":
    main()
