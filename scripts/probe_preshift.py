"""Rowscan vs rowscan+preshift sweep probe on the 23k-atom water system
(TPU). Preshift replaces the 9-op/slot per-pair minimum-image rounding with
per-atom image mapping to the periodic row-chunk center (rows once per grid
step, columns once per tile on (1, 128) vectors) — pure VPU, no MXU
(the dotscan A/B showed Mosaic's small-matmul lowering loses; this probes
the image-shift HALF of that design alone).

Run:  nohup timeout 2400 python scripts/probe_preshift.py > /tmp/probe_preshift.log 2>&1 &
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

    out = jax.block_until_ready(run(carry0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(carry0))
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{name:45s} {dt * 1e3:8.3f} ms/step", flush=True)
    return dt


def main():
    from timemachine_tpu.ops.pallas.dotscan_kernel import dotscan_valid
    from timemachine_tpu.ops.pallas.rowscan_kernel import (
        make_nonbonded_rowscan_md,
        suggest_max_pairs,
    )

    x0, box, params, cutoff, beta = load_system()
    print("system:", x0.shape, "dotscan_valid:", dotscan_valid(np.asarray(x0), np.asarray(box), cutoff + 0.1), flush=True)

    mp = suggest_max_pairs(np.asarray(x0), np.asarray(box), cutoff + 0.1, margin=1.4, triangular=True)
    base = make_nonbonded_rowscan_md(beta, cutoff, mp, skin=0.1, triangular=True)
    pre = make_nonbonded_rowscan_md(beta, cutoff, mp, skin=0.1, triangular=True, preshift=True)

    s0 = jax.block_until_ready(base[0](x0, params, box))
    s1 = jax.block_until_ready(pre[0](x0, params, box))
    t0 = time.perf_counter()
    _, f0, _ = jax.block_until_ready(base[1](s0, x0, params, box, 1))
    print(f"rowscan compile ok ({time.perf_counter()-t0:.1f} s)", flush=True)
    t0 = time.perf_counter()
    _, f1, _ = jax.block_until_ready(pre[1](s1, x0, params, box, 1))
    print(f"preshift compile ok ({time.perf_counter()-t0:.1f} s)", flush=True)
    err = float(jnp.abs(f1 - f0).max())
    print(f"force parity: {err:.3e} abs, {err/float(jnp.abs(f0).max()):.3e} rel", flush=True)

    def make_step(apply_fn, state0):
        def step(x):
            _, f, _ = apply_fn(state0, x, params, box, 1)
            return x + 1e-7 * jnp.clip(f, -100.0, 100.0)

        return step

    timed_scan("rowscan sweep (MD mode)", make_step(base[1], s0), x0)
    timed_scan("rowscan+preshift sweep (MD mode)", make_step(pre[1], s1), x0)

    def step_u(x):
        u = pre[2](s1, x, params, box)
        return x + 1e-12 * u

    timed_scan("preshift energy mode", step_u, x0)


if __name__ == "__main__":
    main()
