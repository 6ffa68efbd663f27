"""Micro-costs of the data-movement primitives in the MD step residual
(TPU, evolving-scan methodology): row gathers vs 1-D gathers, lane concats,
centroid paths. Decides the layout fixes for the step residual.

    nohup timeout 1200 python scripts/probe_micro.py > /tmp/probe_micro.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 23_558
NPAD = 23_680
N_STEPS = 300


def timed(name, step_fn, carry0, n_steps=N_STEPS):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), carry, None, length=n_steps)[0]

    out = jax.block_until_ready(run(carry0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(carry0))
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{name:52s} {dt * 1e3:8.4f} ms/step", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.permutation(NPAD)[:N], jnp.int32)
    idx_pad = jnp.asarray(rng.integers(0, N, NPAD), jnp.int32)
    x_n3 = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    x_n8 = jnp.asarray(rng.normal(size=(NPAD, 8)), jnp.float32)
    x_1d = jnp.asarray(rng.normal(size=(NPAD,)), jnp.float32)

    def ev(v):  # keep the carry evolving so nothing folds
        return 1e-12 * jnp.sum(v.reshape(-1)[:1])

    timed("row gather (Npad,8)[idx(N)]", lambda c: c + ev(c[idx, 1:4]), x_n8)
    timed("row gather (N,3)[idx_pad]", lambda c: c + ev(c[idx_pad % N]), x_n3)
    timed("1-D gather (Npad,)[idx_pad]", lambda c: c + ev(c[idx_pad]), x_1d)
    timed("3x 1-D gather from (N,3) cols", lambda c: c + ev(sum(c[:, k][idx_pad % N] for k in range(3))[:, None]), x_n3)
    timed("col extract (N,3)[:,0] only", lambda c: c + ev(c[:, 0]), x_n3)
    timed(
        "3x 1-D gather -> stack (N,3)",
        lambda c: c + ev(jnp.stack([c[:, k][idx_pad % N] for k in range(3)], axis=1)),
        x_n3,
    )
    timed(
        "lane concat (Npad,3)+(Npad,4)+(Npad,1)",
        lambda c: c + ev(jnp.concatenate([c[:, :3], c[:, 3:7], c[:, 7:]], axis=1)),
        x_n8,
    )

    # centroid paths (7023 waters of 3 atoms + 1 protein group of 2489)
    n_w = 7023
    scatter_idxs = jnp.asarray(
        np.concatenate([np.repeat(np.arange(n_w), 3), np.full(N - 3 * n_w, n_w)]), jnp.int32
    )
    sizes = jnp.asarray(np.concatenate([np.full(n_w, 3.0), [N - 3 * n_w]]), jnp.float32)

    def seg_centroid(c):
        s = jax.ops.segment_sum(c, scatter_idxs, num_segments=n_w + 1)
        cen = s / sizes[:, None]
        return c + ev(cen)

    timed("centroids: segment_sum (current)", seg_centroid, x_n3)

    starts = jnp.asarray(np.concatenate([np.arange(0, 3 * n_w + 1, 3), [N]]), jnp.int32)

    def cumsum_centroid(c):
        cs = jnp.concatenate([jnp.zeros((1, 3), c.dtype), jnp.cumsum(c, axis=0)], axis=0)
        sums = cs[starts[1:]] - cs[starts[:-1]]
        cen = sums / sizes[:, None]
        return c + ev(cen)

    timed("centroids: cumsum boundaries", cumsum_centroid, x_n3)

    def reshape_centroid(c):
        w = c[: 3 * n_w].reshape(n_w, 3, 3).mean(axis=1)
        p = c[3 * n_w :].mean(axis=0, keepdims=True)
        return c + ev(jnp.concatenate([w, p], axis=0))

    timed("centroids: reshape waters + mean", reshape_centroid, x_n3)

    def disp_gather(c):
        cen = c[: 3 * n_w].reshape(n_w, 3, 3).mean(axis=1)
        disp = jnp.concatenate([cen, jnp.zeros((1, 3), c.dtype)], axis=0)
        return c + 1e-12 * disp[scatter_idxs]

    timed("centroid displacement row-gather back", disp_gather, x_n3)

    # noise generation (integrator)
    key0 = jax.random.key(0)

    def noise_step(c):
        k = jax.random.fold_in(key0, jnp.int32(c[0, 0] * 1e6) % 1000)
        return c + 1e-12 * jax.random.normal(k, c.shape, c.dtype)

    timed("threefry normal (N,3)", noise_step, x_n3)


if __name__ == "__main__":
    main()
