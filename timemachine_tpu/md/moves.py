"""Monte Carlo move framework + MD moves.

Parity target: reference timemachine/md/moves.py — generic Move /
MonteCarloMove / CompoundMove combinators, NVT/NPT MD moves (backed by this
framework's scan Context), and multiple-try-Metropolis moves."""

from __future__ import annotations

from abc import ABC, abstractmethod
from itertools import islice
from typing import Any, Generic, Sequence, TypeVar

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp as jlogsumexp

from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.states import CoordsVelBox

_State = TypeVar("_State")


class Move(Generic[_State], ABC):
    @abstractmethod
    def move(self, _: _State) -> _State: ...

    def move_n(self, x: _State, n: int) -> _State:
        for _ in range(n):
            x = self.move(x)
        return x

    def sample_chain_iter(self, x: _State):
        while True:
            x = self.move(x)
            yield x

    def sample_chain(self, x: _State, n_samples: int):
        return list(islice(self.sample_chain_iter(x), n_samples))


class MonteCarloMove(Move[_State], ABC):
    def __init__(self):
        self._n_proposed = 0
        self._n_accepted = 0

    @abstractmethod
    def propose(self, x: _State) -> tuple[_State, float]:
        """return proposed state and log acceptance probability"""

    def move(self, x: _State) -> _State:
        proposal, log_acceptance_probability = self.propose(x)
        self._n_proposed += 1
        alpha = np.random.rand()
        if alpha < np.exp(log_acceptance_probability):
            self._n_accepted += 1
            return proposal
        return x

    @property
    def n_proposed(self) -> int:
        return self._n_proposed

    @property
    def n_accepted(self) -> int:
        return self._n_accepted

    @property
    def acceptance_fraction(self) -> float:
        return self._n_accepted / self._n_proposed if self._n_proposed else np.nan


class CompoundMove(Move[_State]):
    def __init__(self, moves: Sequence[MonteCarloMove]):
        self.moves = moves

    @property
    def n_accepted_by_move(self):
        return [m._n_accepted for m in self.moves]

    @property
    def n_proposed_by_move(self):
        return [m._n_proposed for m in self.moves]


class MixtureOfMoves(CompoundMove[_State]):
    """Apply a single uniformly-selected move per step (ref moves.py:97-124)."""

    def move(self, x: _State) -> _State:
        idx = np.random.choice(len(self.moves))
        return self.moves[idx].move(x)

    def move_n(self, x: _State, n: int):
        for idx in np.random.choice(len(self.moves), size=n, replace=True):
            x = self.moves[idx].move(x)
        return x

    def sample_chain(self, x: _State, n_samples: int):
        samples = []
        for idx in np.random.choice(len(self.moves), size=n_samples, replace=True):
            x = self.moves[idx].move(x)
            samples.append(x)
        return samples


class SequenceOfMoves(CompoundMove[_State]):
    def move(self, x: _State) -> _State:
        for m in self.moves:
            x = m.move(x)
        return x


class NVTMove(Move[CoordsVelBox]):
    """k MD steps at constant T as one Move (ref moves.py:138-170)."""

    def __init__(self, bps, masses, temperature: float, n_steps: int, seed: int, dt: float = 1.5e-3, friction: float = 1.0):
        self.bps = bps
        self.masses = masses
        self.temperature = temperature
        self.n_steps = n_steps
        self.seed = seed
        self.integrator = LangevinIntegrator(temperature, dt, friction, np.asarray(masses), seed)
        self._movers: list = []
        self._step_offset = 0

    def _run(self, x: CoordsVelBox, n_steps: int) -> CoordsVelBox:
        from timemachine_tpu.md.context import Context

        # one persistent Context: its jitted runner is compiled once and
        # reused across every move (state is swapped in, never retraced)
        if not hasattr(self, "_ctxt"):
            self._ctxt = Context(x.coords, x.velocities, x.box, self.integrator, self.bps, movers=self._movers)
        ctxt = self._ctxt
        ctxt.set_x_t(x.coords)
        ctxt.set_v_t(x.velocities)
        ctxt.set_box(x.box)
        ctxt._step = self._step_offset
        ctxt.multiple_steps(n_steps)
        self._step_offset = ctxt._step
        return CoordsVelBox(ctxt.get_x_t(), ctxt.get_v_t(), ctxt.get_box())

    def set_params(self, params_list):
        """Swap potential parameters (e.g. a new lambda window) without
        recompiling the move's runner."""
        self.bps = [bp.potential.bind(p) for bp, p in zip(self.bps, params_list)]
        if hasattr(self, "_ctxt"):
            self._ctxt.set_params(params_list)

    def move(self, x: CoordsVelBox) -> CoordsVelBox:
        return self._run(x, self.n_steps)


class NPTMove(NVTMove):
    """NVTMove + MC barostat (ref md/barostat/moves.py:85-119)."""

    def __init__(
        self,
        bps,
        masses,
        temperature: float,
        pressure: float,
        n_steps: int,
        seed: int,
        dt: float = 1.5e-3,
        friction: float = 1.0,
        barostat_interval: int = 5,
    ):
        super().__init__(bps, masses, temperature, n_steps, seed, dt=dt, friction=friction)
        from timemachine_tpu.md.barostat import MonteCarloBarostat
        from timemachine_tpu.md.utils import get_bond_list, get_group_indices
        from timemachine_tpu.potentials import HarmonicBond, get_bound_potential_by_type

        bond_pot = get_bound_potential_by_type(bps, HarmonicBond).potential
        group_idxs = get_group_indices(get_bond_list(bond_pot), len(masses))
        self._movers = [
            MonteCarloBarostat(len(masses), pressure, temperature, group_idxs, barostat_interval, seed + 1)
        ]


class DeterministicMTMMove(Move[CoordsVelBox]):
    """Multiple-try Metropolis with deterministic jax PRNG
    (ref moves.py:172-204)."""

    def __init__(self, rng_key):
        self.rng_key = rng_key
        self._n_proposed = 0
        self._n_accepted = 0

    @property
    def n_proposed(self):
        return self._n_proposed

    @property
    def n_accepted(self):
        return self._n_accepted

    def acceptance_probability(self, x, box, key) -> tuple[Any, Any, Any]:
        raise NotImplementedError

    def move(self, xvb: CoordsVelBox) -> CoordsVelBox:
        self._n_proposed += 1
        y_proposed, acceptance_probability, key = self.acceptance_probability(xvb.coords, xvb.box, self.rng_key)
        key, subkey = jax.random.split(key)
        self.rng_key = key
        alpha = jax.random.uniform(subkey)
        if alpha < acceptance_probability:
            self._n_accepted += 1
            return CoordsVelBox(np.asarray(y_proposed), xvb.velocities, xvb.box)
        return xvb


class OptimizedMTMMove(DeterministicMTMMove):
    """MTM with symmetric proposal Q and importance weights lambda = pi/Q
    (ref moves.py:206-261)."""

    def __init__(self, K, batch_proposal_fn, batched_log_weights_fn, seed):
        super().__init__(jax.random.key(seed))
        self.K = K
        self.batch_proposal_fn = batch_proposal_fn
        self.batched_log_weights_fn = batched_log_weights_fn

    def acceptance_probability(self, x, box, key):
        key, k1, k2 = jax.random.split(key, 3)
        yj = self.batch_proposal_fn(x, self.K, k1)
        log_weights_yj = self.batched_log_weights_fn(yj, box)
        normalized = jnp.exp(log_weights_yj - jlogsumexp(log_weights_yj))
        j = jax.random.categorical(k2, log_weights_yj)
        y = yj[j]
        # reverse ensemble: proposals from y, with x substituted in
        key, k3 = jax.random.split(key)
        xi = self.batch_proposal_fn(y, self.K, k3)
        xi = jnp.concatenate([xi[:-1], x[None]], axis=0)
        log_weights_xi = self.batched_log_weights_fn(xi, box)
        log_ratio = jlogsumexp(log_weights_yj) - jlogsumexp(log_weights_xi)
        return y, jnp.exp(jnp.minimum(log_ratio, 0.0)), key


class ReferenceMTMMove(DeterministicMTMMove):
    """General multiple-try Metropolis with separate proposal density Q and
    importance function lambda (Liang & Wong 2000 recipe; ref
    moves.py:263-331). `OptimizedMTMMove` is the symmetric-Q special case.

    batch_proposal_fn: (state, K, key) -> list of K proposed states
    batch_log_Q_fn: (states, ref_state) -> (K,) log proposal densities
    batch_log_pi_fn: (states) -> (K,) log target densities
    batch_log_lambda_a_b_fn: (states, ref_state) -> (K,) symmetric log lambda
    """

    def __init__(self, K, batch_proposal_fn, batch_log_Q_fn, batch_log_pi_fn, batch_log_lambda_a_b_fn, seed):
        super().__init__(jax.random.key(seed))
        self.K = K
        self.batch_proposal_fn = batch_proposal_fn
        self.batch_log_Q_fn = batch_log_Q_fn
        self.batch_log_pi_fn = batch_log_pi_fn
        self.batch_log_lambda_fn = batch_log_lambda_a_b_fn

    def acceptance_probability(self, x, box, key):
        key, k1 = jax.random.split(key)
        yj = self.batch_proposal_fn(x, self.K, k1)
        log_weights_yj = (
            jnp.asarray(self.batch_log_pi_fn(yj))
            + jnp.asarray(self.batch_log_Q_fn(yj, x))
            + jnp.asarray(self.batch_log_lambda_fn(yj, x))
        )
        key, k2 = jax.random.split(key)
        j = int(jax.random.categorical(k2, log_weights_yj))
        y = yj[j]
        key, k3 = jax.random.split(key)
        xi = list(self.batch_proposal_fn(y, self.K - 1, k3)) + [x]
        log_weights_xi = (
            jnp.asarray(self.batch_log_pi_fn(xi))
            + jnp.asarray(self.batch_log_Q_fn(xi, y))
            + jnp.asarray(self.batch_log_lambda_fn(xi, y))
        )
        log_ratio = jlogsumexp(log_weights_yj) - jlogsumexp(log_weights_xi)
        return y, jnp.exp(jnp.minimum(log_ratio, 0.0)), key
