"""Monte Carlo move framework + MD moves.

Capability target: reference timemachine/md/moves.py — generic Move /
MonteCarloMove / CompoundMove combinators, NVT/NPT MD moves (backed by this
framework's scan Context), and multiple-try-Metropolis moves.

Differences from the reference's structure: acceptance bookkeeping lives in a
single `_Tally` base with a log-space Metropolis helper, and both MTM variants
share one acceptance routine (`_mtm_accept`) parameterized by their log-weight
functions — the symmetric-Q "optimized" move is the special case where the
weights are just log pi.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Callable, Generic, Sequence, TypeVar

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
        """n iterated moves; subclasses may batch randomness."""
        for _ in range(n):
            x = self.move(x)
        return x

    def sample_chain_iter(self, x: _State):
        """Infinite generator over the chain started at x."""
        while True:
            x = self.move(x)
            yield x

    def sample_chain(self, x: _State, n_samples: int) -> list:
        chain = self.sample_chain_iter(x)
        return [next(chain) for _ in range(n_samples)]


class _Tally:
    """Proposal/acceptance counters shared by every Metropolis-style move."""

    _n_proposed: int = 0
    _n_accepted: int = 0

    @property
    def n_proposed(self) -> int:
        return self._n_proposed

    @property
    def n_accepted(self) -> int:
        return self._n_accepted

    @property
    def acceptance_fraction(self) -> float:
        return self._n_accepted / self._n_proposed if self._n_proposed else np.nan

    def _tally(self, accepted: bool) -> bool:
        self._n_proposed += 1
        self._n_accepted += int(accepted)
        return accepted


class MonteCarloMove(_Tally, Move[_State], ABC):
    def __init__(self):
        self._n_proposed = 0
        self._n_accepted = 0

    @abstractmethod
    def propose(self, x: _State) -> tuple[_State, float]:
        """return proposed state and log acceptance probability"""

    def move(self, x: _State) -> _State:
        proposal, log_p_accept = self.propose(x)
        # log-space Metropolis: log u < log p  <=>  u < p (u=0 rejects iff p=0)
        with np.errstate(divide="ignore"):
            accept = np.log(np.random.rand()) < log_p_accept
        return proposal if self._tally(bool(accept)) else x


class CompoundMove(Move[_State]):
    def __init__(self, moves: Sequence[MonteCarloMove]):
        self.moves = moves

    @property
    def n_accepted_by_move(self) -> list[int]:
        return [m._n_accepted for m in self.moves]

    @property
    def n_proposed_by_move(self) -> list[int]:
        return [m._n_proposed for m in self.moves]


class MixtureOfMoves(CompoundMove[_State]):
    """Each step applies one uniformly-drawn member move (ref moves.py:97-124)."""

    def _drive(self, x: _State, n: int, collect: bool):
        out = []
        for idx in np.random.choice(len(self.moves), size=n, replace=True):
            x = self.moves[idx].move(x)
            if collect:
                out.append(x)
        return out if collect else x

    def move(self, x: _State) -> _State:
        return self._drive(x, 1, collect=False)

    def move_n(self, x: _State, n: int) -> _State:
        return self._drive(x, n, collect=False)

    def sample_chain(self, x: _State, n_samples: int) -> list:
        return self._drive(x, n_samples, collect=True)


class SequenceOfMoves(CompoundMove[_State]):
    """Each step applies every member move in order."""

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


# ---------------------------------------------------------------------------
# multiple-try Metropolis


def _mtm_accept(key, x, K, propose_batch, log_weight_fn):
    """One MTM round (Liang & Wong 2000): draw K proposals from x, select one
    by its weight, then rebuild the reverse-direction ensemble around the
    selection with x swapped in. Returns (y, p_accept, key').

    log_weight_fn(states, ref_state) -> (K,) log selection weights; for the
    symmetric-Q case this is just log pi (Q and lambda terms cancel).
    """
    key, k_fwd, k_sel, k_rev = jax.random.split(key, 4)

    ys = propose_batch(x, K, k_fwd)
    log_w_fwd = jnp.asarray(log_weight_fn(ys, x))
    j = int(jax.random.categorical(k_sel, log_w_fwd))
    y = ys[j]

    xs = propose_batch(y, K, k_rev)
    xs = jnp.concatenate([jnp.asarray(xs)[: K - 1], jnp.asarray(x)[None]], axis=0)
    log_w_rev = jnp.asarray(log_weight_fn(xs, y))

    log_ratio = jlogsumexp(log_w_fwd) - jlogsumexp(log_w_rev)
    return y, jnp.exp(jnp.minimum(log_ratio, 0.0)), key


class DeterministicMTMMove(_Tally, Move[CoordsVelBox]):
    """MTM base with a deterministic jax PRNG stream (ref moves.py:172-204)."""

    def __init__(self, rng_key):
        self.rng_key = rng_key
        self._n_proposed = 0
        self._n_accepted = 0

    def acceptance_probability(self, x, box, key) -> tuple[Any, Any, Any]:
        raise NotImplementedError

    def move(self, xvb: CoordsVelBox) -> CoordsVelBox:
        y, p_accept, key = self.acceptance_probability(xvb.coords, xvb.box, self.rng_key)
        self.rng_key, k_u = jax.random.split(key)
        if self._tally(bool(jax.random.uniform(k_u) < p_accept)):
            return CoordsVelBox(np.asarray(y), xvb.velocities, xvb.box)
        return xvb


class OptimizedMTMMove(DeterministicMTMMove):
    """MTM with symmetric proposal Q and importance weights lambda = pi/Q, so
    proposals are selected by log pi alone (ref moves.py:206-261)."""

    def __init__(self, K, batch_proposal_fn, batched_log_weights_fn, seed):
        super().__init__(jax.random.key(seed))
        self.K = K
        self.batch_proposal_fn = batch_proposal_fn
        self.batched_log_weights_fn = batched_log_weights_fn

    def acceptance_probability(self, x, box, key):
        return _mtm_accept(
            key, x, self.K, self.batch_proposal_fn, lambda states, _ref: self.batched_log_weights_fn(states, box)
        )


class ReferenceMTMMove(DeterministicMTMMove):
    """General MTM with separate proposal density Q and importance function
    lambda (ref moves.py:263-331); `OptimizedMTMMove` is the symmetric-Q
    special case.

    batch_proposal_fn: (state, K, key) -> K proposed states
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

    def _log_weights(self, states, ref):
        return (
            jnp.asarray(self.batch_log_pi_fn(states))
            + jnp.asarray(self.batch_log_Q_fn(states, ref))
            + jnp.asarray(self.batch_log_lambda_fn(states, ref))
        )

    def acceptance_probability(self, x, box, key):
        return _mtm_accept(key, x, self.K, self.batch_proposal_fn, self._log_weights)
