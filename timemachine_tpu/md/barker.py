"""Barker proposal (Livingstone & Zanella 2020, arXiv:1908.11812), JAX-native.

Gradient-informed proposal that is robust to clashes / bad step sizes, used
for host pre-equilibration (md/minimizer.equilibrate_host_barker; reference
semantics: timemachine/md/barker.py + minimizer.py:429-471). Unlike the
reference's per-step NumPy object, the chain here is a single jitted
`lax.scan`, so an n-step un-Metropolized equilibration is one device program
with no host round-trips.

Proposal: y = x + b ⊙ z with z ~ N(0, σ²) elementwise and b = ±1 drawn with
P(b=+1 | x, z) = σ(∇log q(x) ⊙ z) (logistic). Normalizing constant of the
joint proposal density is 1/2 per coordinate (prop. 3.1 of the paper).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def barker_propose(key: jax.Array, x: jax.Array, grad_log_q: jax.Array, sigma) -> jax.Array:
    """One Barker proposal draw y ~ p(·|x), given ∇log q(x)."""
    k_z, k_b = jax.random.split(key)
    z = sigma * jax.random.normal(k_z, x.shape, dtype=x.dtype)
    # b = +1 w.p. sigmoid(g·z): logistic draw via log-uniform comparison
    u = jax.random.uniform(k_b, x.shape, dtype=x.dtype)
    flip = jnp.log(u) > jax.nn.log_sigmoid(grad_log_q * z)
    return x + jnp.where(flip, -z, z)


def barker_log_density(x: jax.Array, y: jax.Array, grad_log_q_x: jax.Array, sigma) -> jax.Array:
    """log p(y | x) (eq. 16 of the paper), summed over coordinates."""
    z = y - x
    log_normal = -0.5 * (z / sigma) ** 2 - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
    log_flip_prob = jax.nn.log_sigmoid(grad_log_q_x * z)
    return jnp.sum(log_normal + log_flip_prob) - jnp.log(0.5)


def barker_chain(key: jax.Array, x0: jax.Array, grad_log_q_fn, sigma, n_steps: int) -> jax.Array:
    """Run `n_steps` un-Metropolized Barker updates as one jitted scan.

    grad_log_q_fn: x -> ∇log q(x) (for Boltzmann targets, -∇U(x)/kT).
    Returns the final state only (equilibration use-case).
    """

    def step(x, k):
        return barker_propose(k, x, grad_log_q_fn(x), sigma), None

    keys = jax.random.split(key, n_steps)
    x_final, _ = lax.scan(step, x0, keys)
    return x_final
