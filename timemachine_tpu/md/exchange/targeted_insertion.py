"""Production TIBD water sampler as a Context mover: the full batch of
proposals runs inside one jitted `lax.scan`, so water sampling lives inside
the Context's MD scan exactly like the barostat.

Parity target: the reference's CUDA `custom_ops.TIBDExchangeMove_f32`
(`timemachine/cpp/src/exchange_mover.cu`, constructed in
fe/free_energy.py:640-656): n_proposals targeted-insertion/biased-deletion
proposals every `interval` MD steps. Semantics follow the python prototype in
`md/exchange/exchange_mover.py` (the reference's own numerical spec).

TPU design notes:
* Per-water weights are maintained incrementally across proposals in the
  scan carry (the "transposition trick" becomes a scan over 3xN interaction
  blocks); the full (W, 3, N) weight rebuild runs once per firing, chunked.
* Region partition, degenerate-count handling, and accept/reject are all
  branchless (`jnp.where`), so one compiled program covers every case.
* Outer-region insertion sites use a bounded `lax.while_loop` rejection
  sampler (the sphere is a small fraction of the box, so this terminates in
  a couple of iterations with overwhelming probability).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.md.exchange.exchange_mover import make_weight_fns, make_weight_fns_paramized


class TIBDState(NamedTuple):
    n_accepted: jax.Array  # int32
    n_proposed: jax.Array  # int32
    # water-sampler nonbonded params (N, 4): carried in the scan state so
    # HREX can swap per-lambda params without retracing the Context runner
    params: jax.Array


def _sphere_point(key, radius, center, dtype):
    k1, k2 = jax.random.split(key)
    xyz = jax.random.normal(k1, (3,), dtype=dtype)
    xyz = xyz / jnp.linalg.norm(xyz)
    c = jnp.cbrt(jax.random.uniform(k2, dtype=dtype))
    return xyz * c * radius + center


def _delta_r(ri, rj, box_diag):
    diff = ri - rj
    return diff - box_diag * jnp.floor(diff / box_diag + 0.5)


def _outer_point(key, radius, center, box_diag, dtype, max_tries: int = 64):
    """Uniform in box minus sphere by bounded rejection."""

    def cond(carry):
        _, site, tries = carry
        inside = jnp.linalg.norm(_delta_r(site, center, box_diag)) < radius
        return inside & (tries < max_tries)

    def body(carry):
        k, _, tries = carry
        k, sub = jax.random.split(k)
        site = jax.random.uniform(sub, (3,), dtype=dtype) * box_diag
        return k, site, tries + 1

    k, sub = jax.random.split(key)
    site0 = jax.random.uniform(sub, (3,), dtype=dtype) * box_diag
    _, site, _ = jax.lax.while_loop(cond, body, (k, site0, jnp.asarray(0)))
    return site


def _random_rotation(key, dtype):
    """Haar SO(3) from a unit quaternion."""
    q = jax.random.normal(key, (4,), dtype=dtype)
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=dtype,
    )


@dataclass(eq=False)
class TIBDExchangeMove:
    """Context mover: n_proposals TIBD water swaps per firing.

    Constructor signature mirrors the reference custom_ops mover
    (fe/free_energy.py:640-656)."""

    # teleports waters beyond any neighborlist skin: the Context must rebuild
    # stateful force-provider tile lists after this mover fires
    moves_atoms_nonlocally = True

    n_atoms: int
    ligand_idxs: np.ndarray
    water_idxs: list  # list of 3-arrays or (W, 3)
    params: np.ndarray  # (N, 4) water-sampler nonbonded params
    temperature: float
    beta: float  # nonbonded beta
    cutoff: float
    radius: float
    seed: int
    n_proposals: int = 1000
    interval: int = 400
    batch_size: int = 250  # accepted for parity; proposals run in one scan

    def __post_init__(self):
        self.water_idxs = np.asarray([np.asarray(g) for g in self.water_idxs], dtype=np.int32)
        assert self.water_idxs.shape[1] == 3
        self.num_waters = len(self.water_idxs)
        self._kT = BOLTZ * self.temperature
        self._batch_log_weights, self._incremental = make_weight_fns(
            self.params, self.water_idxs, self.beta, self.cutoff, self._kT
        )
        self._blw_p, self._inc_p = make_weight_fns_paramized(
            self.water_idxs, self.beta, self.cutoff, self._kT, np.asarray(self.params).shape[0]
        )

    def init_state(self) -> TIBDState:
        return TIBDState(
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(self.params)
        )

    def set_params(self, params):
        """Swap sampler nonbonded params (python-prototype path). Rebuilds the
        baked weight closures. Context-integrated movers swap params through
        TIBDState (Context.set_water_sampler_params) instead — no retrace."""
        self.params = np.asarray(params)
        self._batch_log_weights, self._incremental = make_weight_fns(
            self.params, self.water_idxs, self.beta, self.cutoff, self._kT
        )

    # counters for parity with custom_ops mover
    def n_proposed(self, state: TIBDState) -> int:
        return int(state.n_proposed)

    def n_accepted(self, state: TIBDState) -> int:
        return int(state.n_accepted)

    def make_move_fn(self, energy_fn=None):
        """energy_fn (the Context's total potential) is unused: the sampler
        carries its own nonbonded parameterization, matching the reference
        mover's independent water-sampler params."""
        del energy_fn
        water_idxs = jnp.asarray(self.water_idxs)
        ligand_idxs = jnp.asarray(np.asarray(self.ligand_idxs, dtype=np.int32))
        radius = self.radius
        num_waters = self.num_waters
        vol_sphere = (4.0 / 3.0) * np.pi * radius**3
        incremental = self._inc_p
        batch_log_weights = self._blw_p

        def one_proposal(carry, key):
            x, box, params, weights, n_acc = carry
            dtype = x.dtype
            box_diag = jnp.diagonal(box)
            k_dir, k_pick, k_site_in, k_site_out, k_rot, k_acc = jax.random.split(key, 6)

            center = jnp.mean(x[ligand_idxs], axis=0)
            centroids = jnp.mean(x[water_idxs], axis=1)
            dij = jnp.linalg.norm(jax.vmap(_delta_r, (0, None, None))(centroids, center, box_diag), axis=-1)
            inner = dij < radius
            n1 = jnp.sum(inner)
            n2 = num_waters - n1

            # direction: True = delete from inner, insert into outer
            p_i2o = jnp.where(n1 == 0, 0.0, jnp.where(n2 == 0, 1.0, 0.5))
            i2o = jax.random.uniform(k_dir, dtype=dtype) < p_i2o
            vi_mask = jnp.where(i2o, inner, ~inner)

            # biased deletion: categorical over exp(weights) restricted to vi
            logits = jnp.where(vi_mask, weights, -jnp.inf)
            chosen = jax.random.categorical(k_pick, logits)

            # insertion site in the opposite region
            site_in = _sphere_point(k_site_in, radius, center, dtype)
            site_out = _outer_point(k_site_out, radius, center, box_diag, dtype)
            site = jnp.where(i2o, site_out, site_in)

            # rigid placement
            a_idxs = water_idxs[chosen]
            w_coords = x[a_idxs]
            centered = w_coords - jnp.mean(w_coords, axis=0, keepdims=True)
            rot = _random_rotation(k_rot, dtype)
            new_pos = centered @ rot.T + site

            w_after, x_new = incremental(params, x, box, chosen, new_pos, weights)

            # acceptance ratio (ref exchange_mover.py:298-324)
            is_chosen = jnp.arange(num_waters) == chosen
            lse_before = jax.scipy.special.logsumexp(jnp.where(vi_mask, weights, -jnp.inf))
            vj_plus = (~vi_mask) | is_chosen
            lse_after = jax.scipy.special.logsumexp(jnp.where(vj_plus, w_after, -jnp.inf))

            vol_i = jnp.where(i2o, vol_sphere, jnp.prod(box_diag) - vol_sphere)
            vol_j = jnp.where(i2o, jnp.prod(box_diag) - vol_sphere, vol_sphere)
            n_i = jnp.where(i2o, n1, n2)
            n_j = num_waters - n_i
            g_fwd = jnp.where((n_i > 0) & (n_j > 0), 0.5, 1.0)
            g_rev = jnp.where((n_i - 1 > 0) & (n_j + 1 > 0), 0.5, 1.0)

            raw_log_p = lse_before - lse_after + jnp.log(vol_j / vol_i) + jnp.log(g_rev / g_fwd)
            log_u = jnp.log(jax.random.uniform(k_acc, dtype=dtype))
            accept = (log_u < jnp.minimum(raw_log_p, 0.0)) & (n_i > 0)

            x = jnp.where(accept, x_new, x)
            weights = jnp.where(accept, w_after, weights)
            # per-proposal trace record: the full proposal (selection,
            # geometry, randomness) plus the mover's verdict, enough for an
            # external implementation to re-judge the SAME proposal stream
            # move-for-move (tests/test_exchange.py cross-validation; ref
            # tests/test_cuda_targeted_insertion_mover.py strategy)
            rec = dict(
                chosen=chosen, i2o=i2o, site=site, rot=rot,
                raw_log_p=raw_log_p, log_u=log_u, accept=accept, n1=n1,
            )
            return (x, box, params, weights, n_acc + accept.astype(jnp.int32)), rec

        def move(state: TIBDState, x, v, box, key, with_trace=False):
            weights = batch_log_weights(state.params, x, box)
            keys = jax.random.split(key, self.n_proposals)
            (x, box, _, _, n_acc), recs = jax.lax.scan(
                one_proposal, (x, box, state.params, weights, jnp.asarray(0, jnp.int32)), keys
            )
            new_state = TIBDState(
                n_accepted=state.n_accepted + n_acc,
                n_proposed=state.n_proposed + jnp.asarray(self.n_proposals, jnp.int32),
                params=state.params,
            )
            if with_trace:
                return new_state, x, v, box, recs
            return new_state, x, v, box

        return move

    def move_traced(self, state: TIBDState, x, v, box, key):
        """Run one firing and ALSO return the stacked per-proposal trace
        (chosen/i2o/site/rot/raw_log_p/log_u/accept/n1 arrays of leading dim
        n_proposals) for move-for-move cross-validation against the python
        prototype (md/exchange/exchange_mover.py)."""
        import functools

        move = self.make_move_fn()
        return jax.jit(functools.partial(move, with_trace=True))(state, x, v, box, key)

    def impl(self, *_args):
        return self
