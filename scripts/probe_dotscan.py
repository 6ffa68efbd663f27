"""Dotscan vs rowscan sweep probe on the 23k-atom water system (TPU).

Stage 1: compile-check the dotscan kernel on hardware (Mosaic must accept
the NT/TN dot_general contraction forms) and verify force agreement vs
rowscan on the same coordinates.
Stage 2: in-scan sweep timing (evolving carry so XLA can't elide), rowscan
vs dotscan, MD mode (compute_u=False).

Run:  nohup timeout 3600 python scripts/probe_dotscan.py > /tmp/probe_dotscan.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 200


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
    from timemachine_tpu.ops.pallas import dotscan_kernel as dk
    from timemachine_tpu.ops.pallas.rowscan_kernel import (
        make_nonbonded_rowscan_md,
        suggest_max_pairs,
    )

    x0, box, params, cutoff, beta = load_system()
    print("system:", x0.shape, "box", np.diagonal(np.asarray(box)).round(2), flush=True)
    print("dotscan_valid:", dk.dotscan_valid(np.asarray(x0), np.asarray(box), cutoff + 0.1), flush=True)

    mp_r = suggest_max_pairs(np.asarray(x0), np.asarray(box), cutoff + 0.1, margin=1.4, triangular=True)
    mp_d = dk.suggest_max_pairs(np.asarray(x0), np.asarray(box), cutoff + 0.1, margin=1.4, triangular=True)
    print(f"max_pairs rowscan(snake)={mp_r} dotscan(hilbert)={mp_d} ratio={mp_d/mp_r:.3f}", flush=True)

    init_r, apply_r, *_ = make_nonbonded_rowscan_md(beta, cutoff, mp_r, skin=0.1, triangular=True)
    init_d, apply_d, *_ = dk.make_nonbonded_dotscan_md(beta, cutoff, mp_d, skin=0.1, triangular=True)

    # stage 1: single-apply parity on hardware
    t0 = time.perf_counter()
    sr = jax.block_until_ready(init_r(x0, params, box))
    print(f"rowscan build ok ({time.perf_counter()-t0:.1f} s)", flush=True)
    t0 = time.perf_counter()
    sd = jax.block_until_ready(init_d(x0, params, box))
    print(f"dotscan build ok ({time.perf_counter()-t0:.1f} s)", flush=True)

    t0 = time.perf_counter()
    _, f_r, _ = jax.block_until_ready(apply_r(sr, x0, params, box, 1))
    print(f"rowscan apply compile ok ({time.perf_counter()-t0:.1f} s)", flush=True)
    t0 = time.perf_counter()
    _, f_d, _ = jax.block_until_ready(apply_d(sd, x0, params, box, 1))
    print(f"dotscan apply compile ok ({time.perf_counter()-t0:.1f} s)", flush=True)

    f_r = np.asarray(f_r)
    f_d = np.asarray(f_d)
    scale = np.abs(f_r).max()
    err = np.abs(f_d - f_r).max()
    print(f"force parity on hardware: max abs err {err:.3e} rel {err/scale:.3e}", flush=True)

    # stage 2: in-scan sweep timing; carry = coords, force feeds back as a
    # tiny displacement so every iteration's sweep is live
    def make_step(apply_fn, state0):
        def step(x):
            _, f, _ = apply_fn(state0, x, params, box, 1)  # t=1: no rebuild in-loop
            return x + 1e-7 * jnp.clip(f, -100.0, 100.0)
        return step

    timed_scan("rowscan sweep (MD mode)", make_step(apply_r, sr), x0)
    timed_scan("dotscan sweep (MD mode)", make_step(apply_d, sd), x0)

    # variant: direct-difference distances, matmul force accumulation only
    init_v, apply_v, *_ = dk.make_nonbonded_dotscan_md(
        beta, cutoff, mp_d, skin=0.1, triangular=True, dot_r2=False
    )
    sv = jax.block_until_ready(init_v(x0, params, box))
    timed_scan("dotscan dot_r2=False (direct diff)", make_step(apply_v, sv), x0)

    # energy-mode (direct-difference) dotscan for completeness
    ef_d = dk.make_nonbonded_dotscan_md(beta, cutoff, mp_d, skin=0.1, triangular=True)[2]

    def step_u(x):
        u = ef_d(sd, x, params, box)
        return x + 1e-12 * u

    timed_scan("dotscan energy mode", step_u, x0)


if __name__ == "__main__":
    main()
