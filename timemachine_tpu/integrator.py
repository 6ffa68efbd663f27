"""Standalone reference integrators + batched gas-phase `simulate`.

Capability target: reference `timemachine/integrator.py` (langevin
coefficients, reference Langevin/velocity-Verlet integrators, multiprocess
`simulate`). The production integrators live in
`timemachine_tpu/integrators.py` and run inside md/context.Context; this
module is the small, self-contained surface used for cross-checks and
gas-phase batch sampling.

Everything here is functional-first: trajectory generation is a jitted
`lax.scan` emitting every step (the reference appends to Python lists), and
`simulate` advances all walkers in one vmapped scan instead of a process
pool. Thin class shells preserve the reference's call surface.

Design deviation: the reference's VelocityVerlet accumulates in 2^36 fixed
point to match its CUDA kernels bitwise; plain f64 is used here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import random as jrandom

from timemachine_tpu.integrators import langevin_coefficients

__all__ = [
    "langevin_coefficients",
    "langevin_trajectory",
    "velocity_verlet_trajectory",
    "LangevinIntegrator",
    "VelocityVerletIntegrator",
    "simulate",
]


def _with_initial(x0, v0, xs, vs):
    return (
        jnp.concatenate([jnp.asarray(x0)[None], xs]),
        jnp.concatenate([jnp.asarray(v0)[None], vs]),
    )


@partial(jax.jit, static_argnums=(2, 7))
def langevin_trajectory(x, v, force_fn, key, ca, cb, cc, n_steps: int, dt):
    """n_steps of the half-step-rotated BAOAB update (Leimkuhler & Matthews,
    arXiv:1203.5428) as one scan; returns the (n_steps+1)-long trajectory."""

    def step(carry, key_t):
        x_t, v_t = carry
        v_mid = v_t + cb * force_fn(x_t)
        v_new = ca * v_mid + cc * jrandom.normal(key_t, jnp.shape(v_t))
        x_new = x_t + 0.5 * dt * (v_mid + v_new)
        return (x_new, v_new), (x_new, v_new)

    _, (xs, vs) = jax.lax.scan(step, (jnp.asarray(x), jnp.asarray(v)), jrandom.split(key, n_steps))
    return _with_initial(x, v, xs, vs)


@partial(jax.jit, static_argnums=(2, 4))
def velocity_verlet_trajectory(x, v, force_fn, cb, n_steps: int, dt):
    """Deterministic leapfrog, staggered so each step costs one force
    evaluation, with explicit initialize/finalize half-kicks."""
    x = jnp.asarray(x)
    v = jnp.asarray(v)

    v_half = v + 0.5 * cb * force_fn(x)
    x_1 = x + dt * v_half

    def step(carry, _):
        x_t, v_t = carry
        v_new = v_t + cb * force_fn(x_t)
        x_new = x_t + dt * v_new
        return (x_new, v_new), (x_new, v_new)

    (x_last, v_last), (xs, vs) = jax.lax.scan(step, (x_1, v_half), None, length=n_steps - 1)
    # on-step velocities: finalize the trailing half-kick
    v_final = v_last + 0.5 * cb * force_fn(x_last)
    xs = jnp.concatenate([x[None], x_1[None], xs[:-1], x_last[None]]) if n_steps > 1 else jnp.stack([x, x_1])
    vs = jnp.concatenate([v[None], v_half[None], vs[:-1], v_final[None]]) if n_steps > 1 else jnp.stack([v, v_half])
    return xs, vs


class LangevinIntegrator:
    """Reference-surface shell over `langevin_trajectory`."""

    def __init__(self, force_fxn, masses, temperature, dt, friction):
        self.dt = dt
        self.force_fxn = force_fxn
        ca, cb, cc = langevin_coefficients(temperature, dt, friction, masses)
        self.ca = ca
        self.cb = np.expand_dims(cb, -1)
        self.cc = np.expand_dims(cc, -1)

    def _step(self, x, v, noise):
        v_mid = v + self.cb * self.force_fxn(x)
        v_new = self.ca * v_mid + self.cc * noise
        return x + 0.5 * self.dt * (v_mid + v_new), v_new

    def step(self, x, v, rng: np.random.Generator):
        return self._step(x, v, rng.normal(size=np.shape(x)))

    def step_lax(self, key, x, v):
        return self._step(x, v, jrandom.normal(key, jnp.shape(x)))

    def multiple_steps(self, x, v, n_steps: int = 1000, rng=None):
        rng = rng or np.random.default_rng()
        xs, vs = [np.asarray(x)], [np.asarray(v)]
        for _ in range(n_steps):
            x, v = self.step(xs[-1], vs[-1], rng)
            xs.append(np.asarray(x))
            vs.append(np.asarray(v))
        return np.array(xs), np.array(vs)

    def multiple_steps_lax(self, key, x, v, n_steps: int = 1000):
        return langevin_trajectory(x, v, self.force_fxn, key, self.ca, self.cb, self.cc, n_steps, self.dt)


class VelocityVerletIntegrator:
    """Reference-surface shell over `velocity_verlet_trajectory`."""

    def __init__(self, force_fxn, masses, dt):
        self.dt = dt
        self.force_fxn = force_fxn
        self.cb = dt / np.asarray(masses)[:, None]

    def step(self, x, v):
        v_mid = v + 0.5 * self.cb * self.force_fxn(x)
        x_new = x + self.dt * v_mid
        v_new = v_mid + 0.5 * self.cb * self.force_fxn(x_new)
        return np.asarray(x_new), np.asarray(v_new)

    def multiple_steps(self, x, v, n_steps: int = 1000):
        xs, vs = velocity_verlet_trajectory(x, v, self.force_fxn, jnp.asarray(self.cb), n_steps, self.dt)
        return np.asarray(xs), np.asarray(vs)


def simulate(x0, U_fn, temperature, masses, steps_per_batch, num_batches, num_workers, seed=None):
    """Batched gas-phase Langevin: num_workers walkers advanced in one
    vmapped scan, emitting a frame per batch.

    Returns (xs, vs) with shape (num_workers, num_batches, N, 3)."""
    import time as _time

    dt = 1.5e-3
    friction = 1.0
    ca, cbs, ccs = langevin_coefficients(temperature, dt, friction, masses)
    cbs = jnp.expand_dims(jnp.asarray(cbs), -1)
    ccs = jnp.expand_dims(jnp.asarray(ccs), -1)
    force = jax.grad(lambda x: -U_fn(x))

    if seed is None:
        seed = int(_time.time())

    def one_walker(x0_w, v0_w, key0):
        def batch(carry, key_b):
            x, v = carry
            xs, vs = langevin_trajectory(x, v, force, key_b, ca, cbs, ccs, steps_per_batch, dt)
            return (xs[-1], vs[-1]), (xs[-1], vs[-1])

        _, (xs, vs) = jax.lax.scan(batch, (x0_w, v0_w), jrandom.split(key0, num_batches))
        return xs, vs

    v0 = jnp.zeros_like(jnp.asarray(x0))
    xs0 = jnp.broadcast_to(jnp.asarray(x0), (num_workers, *np.shape(x0)))
    vs0 = jnp.broadcast_to(v0, (num_workers, *np.shape(x0)))
    keys = jax.vmap(jrandom.key)(jnp.arange(seed, seed + num_workers))
    xs, vs = jax.jit(jax.vmap(one_walker))(xs0, vs0, keys)
    return np.asarray(xs), np.asarray(vs)
