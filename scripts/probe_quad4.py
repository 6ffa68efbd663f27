"""Unroll sweep: quad tpi=4/8, rowscan UNROLL=8 and has_w=False."""

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

    t0 = time.time()
    float(np.asarray((jnp.ones((256, 256)) @ jnp.ones((256, 256))).sum()))
    print(f"health ok {time.time() - t0:.1f}s", flush=True)

    from timemachine_tpu.ops.pallas import quadscan_kernel as qk

    def bench_quad(name, **kwargs):
        tpi = kwargs.get("tiles_per_iter", 1)
        mt = qk.suggest_max_tiles(np.asarray(x0), np.asarray(box), cutoff + 0.1, tiles_per_iter=tpi)
        q_init, q_apply = qk.make_nonbonded_quadscan_md(
            beta, cutoff, mt, skin=0.1, rebuild_interval=20, **kwargs
        )[:2]
        st = q_init(x0, params, box)
        jax.block_until_ready(jax.tree.leaves(st))

        def p(c):
            x, s = c
            _, f, _ = q_apply(s, x, params, box, jnp.int32(1))
            return (x + 1e-7 * f, s)

        timed_scan(name, p, (x0, st))

    bench_quad("quad shifts tpi=4", tiles_per_iter=4)
    bench_quad("quad shifts tpi=8", tiles_per_iter=8)

    from timemachine_tpu.ops.pallas import rowscan_kernel as rk

    for unroll, has_w in ((8, True), (4, False)):
        rk.UNROLL = unroll  # module constant read at trace time
        mp = rk.suggest_max_pairs(np.asarray(x0), np.asarray(box), cutoff + 0.1, triangular=True)
        r_init, r_apply = rk.make_nonbonded_rowscan_md(
            beta, cutoff, mp, skin=0.1, rebuild_interval=20, has_w=has_w
        )[:2]
        st = r_init(x0, params, box)
        jax.block_until_ready(jax.tree.leaves(st))

        def p(c):
            x, s = c
            _, f, _ = r_apply(s, x, params, box, jnp.int32(1))
            return (x + 1e-7 * f, s)

        timed_scan(f"rowscan UNROLL={unroll} has_w={has_w}", p, (x0, st))
    rk.UNROLL = 4


if __name__ == "__main__":
    main()
