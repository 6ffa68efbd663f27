"""TPU probe: quadscan vs rowscan sweep on the 23k water system (in-scan)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 300


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
    d = np.load("/tmp/water23k.npz")
    x0 = jnp.asarray(d["x0"], jnp.float32)
    box = jnp.asarray(d["box"], jnp.float32)
    params = jnp.asarray(d["params"], jnp.float32)
    cutoff = float(d["cutoff"])
    beta = float(d["beta"])

    from timemachine_tpu.ops.pallas import quadscan_kernel as qk

    print("building hilbert LUT...", flush=True)
    import time as _t
    t0 = _t.time()
    from timemachine_tpu.ops.pallas.nonbonded_kernel import hilbert_lut
    hilbert_lut(7)
    print(f"LUT built in {_t.time()-t0:.1f}s", flush=True)

    for sort in ("hilbert", "snake"):
        print(f"suggest_max_tiles[{sort}]...", flush=True)
        mt = qk.suggest_max_tiles(np.asarray(x0), np.asarray(box), cutoff + 0.1, sort=sort)
        print(f"[{sort}] max_tiles={mt} slots={mt * 4096 / 1e6:.1f}M", flush=True)
        init_fn, apply_fn, energy_fn = qk.make_nonbonded_quadscan_md(
            beta, cutoff, mt, skin=0.1, rebuild_interval=20, sort=sort
        )
        state0 = init_fn(x0, params, box)
        jax.block_until_ready(jax.tree.leaves(state0))

        def p_sweep(c):
            x, st = c
            _, f, _ = apply_fn(st, x, params, box, jnp.int32(1))
            return (x + 1e-7 * f, st)

        timed_scan(f"quad[{sort}] sweep+assemble", p_sweep, (x0, state0))

        def p_full(c):
            x, st, t = c
            _, f, st = apply_fn(st, x, params, box, t)
            return (x + 1e-7 * f, st, t + 1)

        timed_scan(f"quad[{sort}] apply (rebuild/20)", p_full, (x0, state0, jnp.int32(0)))

    # sanity: force parity vs rowscan on TPU (compiled, not interpret)
    from timemachine_tpu.ops.pallas.rowscan_kernel import (
        make_nonbonded_rowscan_md,
        suggest_max_pairs,
    )

    mp = suggest_max_pairs(np.asarray(x0), np.asarray(box), cutoff + 0.1, triangular=True)
    r_init, r_apply, _ = make_nonbonded_rowscan_md(beta, cutoff, mp, skin=0.1, rebuild_interval=20)
    r_state = r_init(x0, params, box)
    _, f_row, _ = r_apply(r_state, x0, params, box, jnp.int32(1))
    mt = qk.suggest_max_tiles(np.asarray(x0), np.asarray(box), cutoff + 0.1, sort="hilbert")
    q_init, q_apply, _ = qk.make_nonbonded_quadscan_md(beta, cutoff, mt, skin=0.1, rebuild_interval=20)
    q_state = q_init(x0, params, box)
    _, f_quad, _ = q_apply(q_state, x0, params, box, jnp.int32(1))
    err = np.abs(np.asarray(f_quad) - np.asarray(f_row))
    den = np.abs(np.asarray(f_row)).max()
    print(f"force parity: max abs {err.max():.4f} rel {err.max() / den:.2e}", flush=True)


if __name__ == "__main__":
    main()
