"""System containers + convenience sampling (parity: reference
timemachine/fe/system.py)."""

from __future__ import annotations

from abc import ABC
from dataclasses import dataclass, fields

import jax
import numpy as np
import scipy.optimize

from timemachine_tpu.potentials import (
    BoundPotential,
    ChiralAtomRestraint,
    ChiralBondRestraint,
    HarmonicAngle,
    HarmonicBond,
    Nonbonded,
    NonbondedInteractionGroup,
    NonbondedPairListPrecomputed,
    PeriodicTorsion,
)


def minimize_scipy(U_fn, x0, return_traj=False, seed=2024, method="BFGS"):
    """scipy minimization of a jax potential over flattened coordinates.

    Default is deterministic BFGS (cheap); method="basinhopping" restores
    the reference's stochastic global search (ref system.py:26-48)."""
    unflatten = lambda flat: flat.reshape(*x0.shape)
    value_and_grad = jax.jit(jax.value_and_grad(lambda flat: U_fn(unflatten(flat))))

    def fun(flat):
        v, g = value_and_grad(flat)
        return float(v), np.asarray(g, dtype=np.float64)

    traj = []
    kwargs = dict(jac=True, callback=lambda flat: traj.append(unflatten(flat)))
    flat0 = np.asarray(x0, dtype=np.float64).reshape(-1)
    if method == "basinhopping":
        res = scipy.optimize.basinhopping(fun, flat0, minimizer_kwargs=kwargs, seed=seed)
    else:
        res = scipy.optimize.minimize(fun, flat0, method=method, **kwargs)
    return traj if return_traj else unflatten(res.x)


def simulate_system(U_fn, x0, num_samples=20000, steps_per_batch=500, num_workers=None, minimize=True, temperature=300.0):
    """Vacuum sampling for estimator tests: vmapped Langevin walkers on device
    (replaces the reference's process-pool batch sampler, system.py:51-81 /
    integrator.py:240)."""
    import jax.numpy as jnp

    from timemachine_tpu.integrators import langevin_coefficients

    num_atoms = x0.shape[0]
    seed = 2023
    x_min = minimize_scipy(U_fn, x0, seed=seed) if minimize else x0

    num_workers = num_workers or 8
    samples_per_worker = int(np.ceil(num_samples / num_workers))
    burn_in = samples_per_worker // 10 + 1

    dt = 1.5e-3
    masses = np.ones(num_atoms) * 4.0
    ca, cb, cc = langevin_coefficients(temperature, dt, 1.0, masses)
    cb = cb[:, None]
    cc = cc[:, None]
    grad_fn = jax.grad(U_fn)

    def one_batch(carry, _):
        x, v, key = carry
        key, sub = jax.random.split(key)

        def step(c, k):
            x, v = c
            force = -grad_fn(x)
            noise = jax.random.normal(k, x.shape)
            v_mid = v + cb * force
            v2 = ca * v_mid + cc * noise
            x2 = x + 0.5 * dt * (v_mid + v2)
            return (x2, v2), None

        keys = jax.random.split(sub, steps_per_batch)
        (x, v), _ = jax.lax.scan(step, (x, v), keys)
        return (x, v, key), x

    def walker(key):
        v0 = jnp.zeros_like(x_min)
        (_, _, _), xs = jax.lax.scan(one_batch, (jnp.asarray(x_min), v0, key), None, length=samples_per_worker + burn_in)
        return xs[burn_in:]

    keys = jax.random.split(jax.random.key(seed), num_workers)
    frames = jax.jit(jax.vmap(walker))(keys)
    frames = np.asarray(frames).reshape(-1, num_atoms, 3)[:num_samples]
    assert len(frames) == num_samples
    return frames


# term families excluded from the active potential list: chiral bond
# restraints ship disabled pending validation (matching the reference,
# system.py:97-107)
_INACTIVE_TERMS = frozenset({"chiral_bond"})


@dataclass
class AbstractSystem(ABC):
    """A system is an ordered bag of bound potentials, one per dataclass
    field; subclasses differ only in which term families they carry."""

    def get_U_fns(self) -> list[BoundPotential]:
        return [getattr(self, f.name) for f in fields(self) if f.name not in _INACTIVE_TERMS]

    def get_U_fn(self):
        bound = self.get_U_fns()
        return lambda x: sum(bp(x, box=None) for bp in bound)


@dataclass
class HostSystem(AbstractSystem):
    bond: BoundPotential
    angle: BoundPotential
    proper: BoundPotential
    improper: BoundPotential
    nonbonded_all_pairs: BoundPotential


@dataclass
class GuestSystem(AbstractSystem):
    bond: BoundPotential
    angle: BoundPotential
    proper: BoundPotential
    improper: BoundPotential
    chiral_atom: BoundPotential
    chiral_bond: BoundPotential
    nonbonded_pair_list: BoundPotential


@dataclass
class HostGuestSystem(AbstractSystem):
    bond: BoundPotential
    angle: BoundPotential
    proper: BoundPotential
    improper: BoundPotential
    chiral_atom: BoundPotential
    chiral_bond: BoundPotential
    nonbonded_pair_list: BoundPotential
    nonbonded_all_pairs: BoundPotential
    nonbonded_ixn_group: BoundPotential
