"""Integrators: Langevin (half-step-rotated BAOAB) and velocity Verlet.

Parity targets: reference `timemachine/integrator.py` (Python semantics),
`timemachine/cpp/src/langevin_integrator.cu:20-87` + `k_integrator.cuh:6`
(production coefficients), `timemachine/lib/__init__.py:12-62` (picklable
descriptors).

TPU design: an integrator is a *pure step function* `(state, noise) -> state`
built once from a force function, then composed inside the Context's
`lax.scan` (md/context.py). Noise comes from threefry keys threaded through
the state — counter-based, so trajectories are reproducible from
(InitialState, seed) without any stream-offset bookkeeping.

Frozen atoms (local MD, infinite masses from HMR edge cases) are handled by
zeroing cb/cc per atom — the same trick the reference's LocalMDPotentials
uses (local_md_potentials.hpp:16-70).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.constants import BOLTZ


def langevin_coefficients(temperature, dt, friction, masses):
    """(ca, cb, cc) for the BAOAB-style update (ref integrator.py:15-53):
    heat bath: v <- ca v + cc ξ;  force kick: v <- v + cb F.
    Infinite masses give cb = cc = 0 (frozen atoms)."""
    kT = BOLTZ * temperature
    masses = np.asarray(masses, dtype=np.float64)
    nscale = np.sqrt(kT / masses)
    ca = np.exp(-friction * dt)
    cb = dt / masses
    cc = np.sqrt(1 - np.exp(-2 * friction * dt)) * nscale
    cb = np.where(np.isfinite(cb), cb, 0.0)
    cc = np.where(np.isfinite(cc), cc, 0.0)
    return ca, cb, cc


def langevin_step(x, v, force, noise, ca, cb, cc, dt):
    """One BAOAB-rotated step (ref integrator.py:137-144, k_integrator.cuh:6):
        v_mid = v + cb F(x)
        v'    = ca v_mid + cc ξ
        x'    = x + dt/2 (v_mid + v')
    cb/cc broadcast per atom: scalar or (N,) or (N, 1).
    """
    v_mid = v + cb * force
    v_new = ca * v_mid + cc * noise
    x_new = x + 0.5 * dt * (v_mid + v_new)
    return x_new, v_new


@dataclass(frozen=True)
class LangevinIntegrator:
    """Picklable descriptor (ref lib/__init__.py:12-40). Build the pure step
    fn with `.make_step_fn(force_fn)`."""

    temperature: float
    dt: float
    friction: float
    masses: np.ndarray
    seed: int

    def coefficients(self, free_mask: Optional[np.ndarray] = None):
        ca, cb, cc = langevin_coefficients(self.temperature, self.dt, self.friction, self.masses)
        cb = cb[:, None]
        cc = cc[:, None]
        if free_mask is not None:
            m = np.asarray(free_mask, dtype=np.float64)[:, None]
            cb = cb * m
            cc = cc * m
        return ca, cb, cc

    def make_step_fn(self, force_fn: Callable, free_mask: Optional[np.ndarray] = None):
        """Returns step(x, v, box, key) -> (x', v'). force_fn(x, box) -> (N,3)."""
        ca, cb, cc = self.coefficients(free_mask)
        dt = self.dt

        def step(x, v, box, key):
            noise = jax.random.normal(key, x.shape, dtype=x.dtype)
            f = force_fn(x, box)
            return langevin_step(x, v, f, noise, ca, jnp.asarray(cb, x.dtype), jnp.asarray(cc, x.dtype), dt)

        return step

    def impl(self):
        # API-compat shim: the descriptor *is* the implementation here.
        return self


@dataclass(frozen=True)
class VelocityVerletIntegrator:
    """Deterministic leapfrog with half-step initialize/finalize
    (ref integrator.py:153-222, verlet_integrator.cu)."""

    dt: float
    masses: np.ndarray

    def make_step_fns(self, force_fn: Callable, free_mask: Optional[np.ndarray] = None):
        """Returns (initialize, step, finalize):
        initialize: half-kick + drift; step: full kick + drift;
        finalize: half-kick. All are (x, v, box) -> (x, v)."""
        cb = (self.dt / np.asarray(self.masses, dtype=np.float64))[:, None]
        cb = np.where(np.isfinite(cb), cb, 0.0)
        if free_mask is not None:
            cb = cb * np.asarray(free_mask, dtype=np.float64)[:, None]
        dt = self.dt

        def initialize(x, v, box):
            v2 = v + 0.5 * jnp.asarray(cb, x.dtype) * force_fn(x, box)
            return x + dt * v2, v2

        def step(x, v, box):
            v2 = v + jnp.asarray(cb, x.dtype) * force_fn(x, box)
            return x + dt * v2, v2

        def finalize(x, v, box):
            v2 = v + 0.5 * jnp.asarray(cb, x.dtype) * force_fn(x, box)
            return x, v2

        return initialize, step, finalize

    def impl(self):
        return self


def sample_velocities(masses, temperature, key, dtype=jnp.float64):
    """Maxwell-Boltzmann velocities (ref md/utils or thermostat/utils.py:7)."""
    n = len(masses)
    sigma = jnp.sqrt(BOLTZ * temperature / jnp.asarray(masses, dtype=dtype))[:, None]
    return sigma * jax.random.normal(key, (n, 3), dtype=dtype)
