"""Standalone reference integrators + batched gas-phase `simulate`.

Parity target: reference `timemachine/integrator.py` — langevin_coefficients
(:15-53), Integrator/StochasticIntegrator ABCs (:56-122), BAOAB-rotated
LangevinIntegrator (:124-150), VelocityVerletIntegrator (:153-224), batched
`simulate` (:240-307).

Differences by design:
* The reference's VelocityVerlet accumulates in 2^36 fixed point to match its
  CUDA kernels bitwise; here plain f64 is used (XLA has no int128 path and
  the descriptor-level integrators in `timemachine_tpu/integrators.py` are
  the production path).
* `simulate` runs walkers as ONE vmapped jitted scan instead of pmap over
  host CPU devices — the TPU-native batching (see also md/enhanced.py).
"""

from abc import ABC, abstractmethod
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import random as jrandom

from timemachine_tpu.integrators import langevin_coefficients

__all__ = [
    "langevin_coefficients",
    "Integrator",
    "StochasticIntegrator",
    "LangevinIntegrator",
    "VelocityVerletIntegrator",
    "simulate",
]


class Integrator(ABC):
    @abstractmethod
    def step(self, x, v) -> tuple:
        """Return copies of x and v, updated by a single timestep."""

    def multiple_steps(self, x, v, n_steps: int = 1000):
        xs, vs = [x], [v]
        for _ in range(n_steps):
            new_x, new_v = self.step(xs[-1], vs[-1])
            xs.append(new_x)
            vs.append(new_v)
        return np.array(xs), np.array(vs)


class StochasticIntegrator(ABC):
    @abstractmethod
    def step(self, x, v, rng: np.random.Generator) -> tuple:
        """Single timestep with a numpy Generator."""

    @abstractmethod
    def step_lax(self, key, x, v) -> tuple:
        """Single timestep with a jax PRNG key."""

    def multiple_steps(self, x, v, n_steps: int = 1000, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        xs, vs = [x], [v]
        for _ in range(n_steps):
            new_x, new_v = self.step(xs[-1], vs[-1], rng)
            xs.append(new_x)
            vs.append(new_v)
        return np.array(xs), np.array(vs)

    @partial(jax.jit, static_argnums=(0, 4))
    def multiple_steps_lax(self, key, x, v, n_steps: int = 1000):
        """n_steps via lax.scan (force fn must be jax-transformable)."""

        def f(xv, key):
            xv_ = self.step_lax(key, *xv)
            return xv_, xv_

        keys = jax.random.split(key, n_steps)
        _, (xs, vs) = jax.lax.scan(f, (x, v), keys)
        return (
            jnp.concatenate((x[jnp.newaxis, :], xs)),
            jnp.concatenate((v[jnp.newaxis, :], vs)),
        )


class LangevinIntegrator(StochasticIntegrator):
    """BAOAB rotated by half a timestep (Leimkuhler & Matthews,
    arXiv:1203.5428; matches ref langevin_integrator.cu:71-87)."""

    def __init__(self, force_fxn, masses, temperature, dt, friction):
        self.dt = dt
        self.masses = masses
        self.temperature = temperature
        ca, cb, cc = langevin_coefficients(temperature, dt, friction, masses)
        self.force_fxn = force_fxn
        self.ca, self.cb, self.cc = np.expand_dims(ca, -1), np.expand_dims(cb, -1), np.expand_dims(cc, -1)

    def _step(self, x, v, noise):
        v_mid = v + self.cb * self.force_fxn(x)
        new_v = (self.ca * v_mid) + (self.cc * noise)
        new_x = x + 0.5 * self.dt * (v_mid + new_v)
        return new_x, new_v

    def step(self, x, v, rng):
        return self._step(x, v, rng.normal(size=np.shape(x)))

    def step_lax(self, key, x, v):
        return self._step(x, v, jax.random.normal(key, jnp.shape(x)))


class VelocityVerletIntegrator(Integrator):
    """Deterministic leapfrog with initialize/finalize half-kicks
    (ref integrator.py:153-224; f64 instead of fixed point)."""

    def __init__(self, force_fxn, masses, dt):
        self.dt = dt
        self.masses = np.asarray(masses)[:, np.newaxis]
        self.force_fxn = force_fxn
        self.cb = self.dt / self.masses

    def step(self, x, v):
        """2 force calls per step — prefer multiple_steps."""
        v_mid = v + (0.5 * self.cb) * self.force_fxn(x)
        new_x = x + self.dt * v_mid
        new_v = v_mid + (0.5 * self.cb) * self.force_fxn(new_x)
        return np.asarray(new_x), np.asarray(new_v)

    def multiple_steps(self, x, v, n_steps: int = 1000):
        """Staggered leapfrog: one force call per step plus the two
        half-kicks (ref integrator.py:169-201)."""
        zs = [(x, v)]
        v = v + (0.5 * self.cb) * self.force_fxn(x)
        x = x + self.dt * v
        for _ in range(n_steps - 1):
            v = v + self.cb * self.force_fxn(x)
            x = x + self.dt * v
            zs.append((x, v))
        v = v + (0.5 * self.cb) * self.force_fxn(x)
        zs.append((x, v))
        xs = np.array([xx for (xx, _) in zs])
        vs = np.array([vv for (_, vv) in zs])
        return xs, vs


def simulate(x0, U_fn, temperature, masses, steps_per_batch, num_batches, num_workers, seed=None):
    """Batched gas-phase Langevin: num_workers walkers advanced in one
    vmapped scan, emitting a frame per batch (ref integrator.py:240-307).

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
        def body(carry, key_b):
            x, v = carry

            def step(c, key_t):
                x_t, v_t = c
                v_mid = v_t + cbs * force(x_t)
                noise = jrandom.normal(key_t, v_t.shape)
                v_new = ca * v_mid + ccs * noise
                x_new = x_t + 0.5 * dt * (v_mid + v_new)
                return (x_new, v_new), None

            keys = jrandom.split(key_b, steps_per_batch)
            (x, v), _ = jax.lax.scan(step, (x, v), keys)
            return (x, v), (x, v)

        batch_keys = jrandom.split(key0, num_batches)
        _, (xs, vs) = jax.lax.scan(body, (x0_w, v0_w), batch_keys)
        return xs, vs

    v0 = jnp.zeros_like(jnp.asarray(x0))
    xs0 = jnp.broadcast_to(jnp.asarray(x0), (num_workers, *np.shape(x0)))
    vs0 = jnp.broadcast_to(v0, (num_workers, *np.shape(x0)))
    keys = jax.vmap(jrandom.key)(jnp.arange(seed, seed + num_workers))
    xs, vs = jax.jit(jax.vmap(one_walker))(xs0, vs0, keys)
    return np.asarray(xs), np.asarray(vs)
