"""Consolidated TPU probe: quadscan vs rowscan on 23k water, one process.

Strictly sequential; never kill mid-run. Launch:
    nohup timeout 3600 python scripts/probe_quad2.py > /tmp/probe_quad2.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 200


def timed_scan(name, step_fn, carry0, n_steps=N_STEPS):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), carry, None, length=n_steps)[0]

    print(f"  [{name}] compiling...", flush=True)
    out = run(carry0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(carry0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{name:42s} {dt * 1e3:8.3f} ms/step", flush=True)
    return dt


def main():
    d = np.load("/tmp/water23k.npz")
    x0 = jnp.asarray(d["x0"], jnp.float32)
    box = jnp.asarray(d["box"], jnp.float32)
    params = jnp.asarray(d["params"], jnp.float32)
    cutoff = float(d["cutoff"])
    beta = float(d["beta"])

    print("health: tiny matmul...", flush=True)
    t0 = time.time()
    v = float(np.asarray((jnp.ones((256, 256)) @ jnp.ones((256, 256))).sum()))
    print(f"health ok {time.time() - t0:.1f}s v={v}", flush=True)

    from timemachine_tpu.ops.pallas import quadscan_kernel as qk
    from timemachine_tpu.ops.pallas.rowscan_kernel import (
        make_nonbonded_rowscan_md,
        suggest_max_pairs,
    )

    print("suggest quad tiles (hilbert)...", flush=True)
    t0 = time.time()
    mt = qk.suggest_max_tiles(np.asarray(x0), np.asarray(box), cutoff + 0.1, sort="hilbert")
    print(f"quad max_tiles={mt} slots={mt * 4096 / 1e6:.1f}M ({time.time() - t0:.1f}s)", flush=True)

    q_init, q_apply = qk.make_nonbonded_quadscan_md(beta, cutoff, mt, skin=0.1, rebuild_interval=20)[:2]
    q_state = q_init(x0, params, box)
    jax.block_until_ready(jax.tree.leaves(q_state))
    print("quad state built", flush=True)

    def q_sweep(c):
        x, st = c
        _, f, _ = q_apply(st, x, params, box, jnp.int32(1))
        return (x + 1e-7 * f, st)

    timed_scan("quad sweep+assemble", q_sweep, (x0, q_state))

    def q_full(c):
        x, st, t = c
        _, f, st = q_apply(st, x, params, box, t)
        return (x + 1e-7 * f, st, t + 1)

    timed_scan("quad apply (rebuild/20)", q_full, (x0, q_state, jnp.int32(0)))

    print("rowscan baseline...", flush=True)
    mp = suggest_max_pairs(np.asarray(x0), np.asarray(box), cutoff + 0.1, triangular=True)
    print(f"rowscan max_pairs={mp} slots={mp * 4096 / 1e6:.1f}M", flush=True)
    r_init, r_apply = make_nonbonded_rowscan_md(beta, cutoff, mp, skin=0.1, rebuild_interval=20)[:2]
    r_state = r_init(x0, params, box)
    jax.block_until_ready(jax.tree.leaves(r_state))

    def r_sweep(c):
        x, st = c
        _, f, _ = r_apply(st, x, params, box, jnp.int32(1))
        return (x + 1e-7 * f, st)

    timed_scan("rowscan sweep+assemble", r_sweep, (x0, r_state))

    _, f_row, _ = r_apply(r_state, x0, params, box, jnp.int32(1))
    _, f_quad, _ = q_apply(q_state, x0, params, box, jnp.int32(1))
    err = np.abs(np.asarray(f_quad) - np.asarray(f_row))
    den = np.abs(np.asarray(f_row)).max()
    print(f"force parity: max abs {err.max():.4f} rel {err.max() / den:.2e}", flush=True)


if __name__ == "__main__":
    main()
