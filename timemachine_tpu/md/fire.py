"""FIRE (Fast Inertial Relaxation Engine) minimizer as one jitted scan.

Parity target: reference timemachine/md/fire.py (vendored jax-md
fire_descent) — same update rule (Bitzek et al. 2006, PRL 97:170201), but the
whole n-step descent compiles to a single XLA loop instead of n Python-level
applications.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class FireMinimizationConfig:
    n_steps: int
    dt_start: float = 1e-5
    dt_max: float = 1e-3
    n_min: float = 5
    f_inc: float = 1.1
    f_dec: float = 0.5
    alpha_start: float = 0.1
    f_alpha: float = 0.99


@dataclass(frozen=True)
class ScipyMinimizationConfig:
    method: str
    options: Optional[dict] = None
    bounds: Optional[Any] = None


def fire_descent(
    force: Callable,
    shift_fn: Callable,
    dt_start: float = 1e-5,
    dt_max: float = 1e-3,
    n_min: float = 5,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
):
    """Returns (init_fn, apply_fn) over state (x, v, f, dt, alpha, n_pos)."""

    def init_fn(x):
        return (x, jnp.zeros_like(x), force(x), jnp.asarray(dt_start, x.dtype), jnp.asarray(alpha_start, x.dtype), jnp.asarray(0, jnp.int32))

    def apply_fn(state):
        x, v, f_old, dt, alpha, n_pos = state
        x = shift_fn(x, dt * v + dt**2 * f_old)
        f = force(x)
        v = v + dt * 0.5 * (f_old + f)

        f_norm = jnp.sqrt(jnp.sum(f**2) + 1e-6)
        v_norm = jnp.sqrt(jnp.sum(v**2))
        p = jnp.vdot(f, v)
        v = v + alpha * (f * v_norm / f_norm - v)

        n_pos = jnp.where(p >= 0, n_pos + 1, 0)
        dt = jnp.where(p > 0, jnp.where(n_pos > n_min, jnp.minimum(dt * f_inc, dt_max), dt), dt)
        dt = jnp.where(p < 0, dt * f_dec, dt)
        alpha = jnp.where(p > 0, jnp.where(n_pos > n_min, alpha * f_alpha, alpha), alpha)
        alpha = jnp.where(p < 0, jnp.asarray(alpha_start, x.dtype), alpha)
        v = jnp.where(p < 0, jnp.zeros_like(v), v)
        return (x, v, f, dt, alpha, n_pos)

    return init_fn, apply_fn


def fire_minimize_jax(x0, force_fn: Callable, config: FireMinimizationConfig):
    """Run the full FIRE descent under one jit (used by md/minimizer.py)."""
    init_fn, apply_fn = fire_descent(
        force_fn,
        lambda x, dx: x + dx,
        dt_start=config.dt_start,
        dt_max=config.dt_max,
        n_min=config.n_min,
        f_inc=config.f_inc,
        f_dec=config.f_dec,
        alpha_start=config.alpha_start,
        f_alpha=config.f_alpha,
    )

    def body(state, _):
        return apply_fn(state), None

    state = init_fn(jnp.asarray(x0))
    state, _ = jax.lax.scan(body, state, None, length=config.n_steps)
    return state[0]
