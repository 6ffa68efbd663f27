"""Context: the MD hot loop as one jitted `lax.scan`.

Parity target: reference `custom_ops.Context` (`timemachine/cpp/src/
context.cu:216-277`) — `multiple_steps(n_steps, store_x_interval)`, movers
firing on their intervals, frame downloads, and coordinate/box sanity checks.

TPU design:
* state pytree (x, v, box, step, rng_key, mover_states) scanned over steps;
  XLA fuses integrator + all potential terms into one program — the analog
  of the reference's per-potential CUDA streams is free here.
* movers (barostat, exchange) run under `lax.cond` on the global step index,
  so their two extra energy evaluations cost nothing on non-firing steps.
* frames are emitted as scan outputs every `store_x_interval` steps (outer
  scan over frames, inner scan over steps) — one device→host copy per call.
* per-step randomness: threefry `fold_in(base_key, global_step)`, so a
  trajectory is bitwise reproducible from (initial state, seed) regardless
  of how steps are chunked into frames — replacing cuRAND offset bookkeeping
  (ref langevin_integrator.cu:74-87).
* `set_params` is recompile-free: parameters are scan inputs, not constants.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.integrators import LangevinIntegrator, VelocityVerletIntegrator
from timemachine_tpu.potentials import BoundPotential


class Context:
    def __init__(
        self,
        x0,
        v0,
        box0,
        integrator,
        bps: Sequence[BoundPotential],
        movers: Sequence = (),
        rng_seed: Optional[int] = None,
    ):
        self._x = np.asarray(x0)
        self._v = np.asarray(v0)
        self._box = np.asarray(box0)
        assert self._x.shape == self._v.shape
        assert self._box.shape == (3, 3)
        self.integrator = integrator
        self.potentials = [bp.potential for bp in bps]
        self._params = [jnp.asarray(bp.params) for bp in bps]
        self.movers = list(movers)
        self._mover_states = [m.init_state() for m in self.movers]
        seed = rng_seed if rng_seed is not None else getattr(integrator, "seed", 0)
        self._base_key = jax.random.key(seed)
        self._step = 0
        self._runner_cache: dict = {}
        self._stateful_provider_idx: list = []
        # stateful-provider (tile list) states carried across multiple_steps
        # calls. Re-initializing at every entry rebuilt the tile lists at
        # chunk boundaries, so f32 sweep summation order — and hence the
        # trajectory — depended on how steps were split across calls,
        # breaking the chunking-determinism contract
        # (tests/test_sorted_md.py::test_sorted_path_chunking_invariance).
        # Carrying them preserves the exact unchunked rebuild schedule
        # (t % rebuild_interval == 0). Invalidated by any external state
        # mutation (set_x_t / set_box / set_params / local MD).
        self._prov_states = None

        def energy_fn(x, box, params_list):
            total = 0.0
            for pot, p in zip(self.potentials, params_list):
                total = total + pot(x, p, box)
            return total

        self._energy_fn = energy_fn

    # -- observers (ref custom_ops.pyi Context surface) ---------------------

    def get_x_t(self) -> np.ndarray:
        return np.array(self._x)

    def get_v_t(self) -> np.ndarray:
        return np.array(self._v)

    def get_box(self) -> np.ndarray:
        return np.array(self._box)

    def set_x_t(self, x):
        self._x = np.asarray(x)
        self._prov_states = None

    def set_v_t(self, v):
        self._v = np.asarray(v)

    def set_box(self, box):
        self._box = np.asarray(box)
        self._prov_states = None

    def get_params(self):
        return [np.asarray(p) for p in self._params]

    def set_params(self, params_list):
        """Swap potential parameters without recompiling (HREX replica swap
        path; ref free_energy.py:1485-1531)."""
        assert len(params_list) == len(self._params)
        self._params = [jnp.asarray(p) for p in params_list]
        self._prov_states = None

    def set_water_sampler_params(self, params):
        """Swap the water exchange mover's nonbonded params (carried in its
        scan state, so no runner retrace — the HREX per-replica path)."""
        from timemachine_tpu.md.exchange.targeted_insertion import TIBDExchangeMove

        for i, m in enumerate(self.movers):
            if isinstance(m, TIBDExchangeMove):
                st = self._mover_states[i]
                self._mover_states[i] = st._replace(params=jnp.asarray(params, st.params.dtype))

    def get_barostat(self):
        from timemachine_tpu.md.barostat import MonteCarloBarostat

        for m, s in zip(self.movers, self._mover_states):
            if isinstance(m, MonteCarloBarostat):
                return m, s
        return None

    def reset_for_state(self, initial_state, seed: Optional[int] = None):
        """Re-point this Context at another compatible InitialState without
        recompiling: swap coordinates, box, parameters, RNG seed, and reset
        movers/step counter. States must be potentials-compatible (the HREX/
        bisection contract, ref free_energy.py:1000-1004)."""
        self.set_x_t(initial_state.x0)
        self.set_v_t(initial_state.v0)
        self.set_box(initial_state.box0)
        self.set_params([np.asarray(bp.params) for bp in initial_state.potentials])
        self._step = 0
        self._mover_states = [m.init_state() for m in self.movers]
        key_seed = seed if seed is not None else getattr(initial_state.integrator, "seed", 0)
        self._base_key = jax.random.key(key_seed)
        return self

    def set_barostat_interval(self, interval: int) -> Optional[int]:
        """Change the barostat firing interval (used to speed equilibration;
        ref free_energy.py:700-710). Returns the previous interval, or None
        if there is no barostat. Invalidates compiled runners (the interval
        is baked into the traced step function)."""
        from dataclasses import replace as dc_replace

        from timemachine_tpu.md.barostat import MonteCarloBarostat

        for i, m in enumerate(self.movers):
            if isinstance(m, MonteCarloBarostat):
                prev = m.interval
                if prev != interval:
                    self.movers[i] = dc_replace(m, interval=interval)
                    self._runner_cache.clear()
                return prev
        return None

    def compute_u_t(self) -> float:
        return float(self._energy_fn(jnp.asarray(self._x), jnp.asarray(self._box), self._params))

    # -- stepping ------------------------------------------------------------

    def _make_step_fn(self, free_mask=None):
        """One global MD step: integrator update then movers on their
        intervals (ref context.cu:262-277). Langevin uses the fused BAOAB
        update; VelocityVerlet uses a kick-drift leapfrog step — the
        surrounding half-(un)kicks live in `_multiple_steps_impl`, matching
        the reference Context's initialize/finalize contract
        (verlet_integrator.cu)."""
        assert isinstance(self.integrator, (LangevinIntegrator, VelocityVerletIntegrator))
        is_verlet = isinstance(self.integrator, VelocityVerletIntegrator)
        energy_fn = self._energy_fn

        def force_fn_builder(params_list):
            def force_fn(x, box):
                return -jax.grad(energy_fn)(x, box, params_list)

            return force_fn

        if is_verlet:
            cb_vv = (self.integrator.dt / np.asarray(self.integrator.masses, dtype=np.float64))[:, None]
            cb_vv = np.where(np.isfinite(cb_vv), cb_vv, 0.0)
            if free_mask is not None:
                cb_vv = cb_vv * np.asarray(free_mask, dtype=np.float64)[:, None]
            ca, cb, cc = 1.0, cb_vv, np.zeros_like(cb_vv)
        else:
            ca, cb, cc = self.integrator.coefficients(free_mask)
        dt = self.integrator.dt

        # split potentials into four tiers:
        # 1. stateful MD providers (Pallas nonbonded with amortized tile
        #    rebuilds — state carried through the scan),
        # 2. contribution providers: irregular term lists (bonded tails,
        #    exclusion tails) whose forces are assembled scatter-free through
        #    ONE shared atom-major plan (ops/assembly.py; XLA scatter-add
        #    serializes at ~9 ns/update — measured 1.04 -> 0.73 ms/step for
        #    the DHFR protein tails, scripts/probe_assembly.py),
        # 3. stateless fused (u, f) providers (one pass, no backward sweep),
        # 4. grad-evaluated terms.
        stateful: dict = {}
        fused_fns: dict = {}
        contrib_groups: list = []
        contrib_entries: list = []  # (potential index, fn)
        for i, p in enumerate(self.potentials):
            split_m = getattr(p, "md_force_provider_split", None)
            split = split_m() if split_m is not None else None
            if split is not None:
                prov, groups, fn = split
                stateful[i] = prov
                contrib_groups.extend(groups)
                contrib_entries.append((i, fn))
                continue
            mdp = getattr(p, "md_force_provider", None)
            prov = mdp() if mdp is not None else None
            if prov is not None:
                stateful[i] = prov
                continue
            fc_m = getattr(p, "force_contribs", None)
            fc = fc_m() if fc_m is not None else None
            if fc is not None:
                groups, fn = fc
                contrib_groups.extend(groups)
                contrib_entries.append((i, fn))
                continue
            ef = getattr(p, "energy_force_fn", lambda: None)()
            if ef is not None:
                fused_fns[i] = ef
        contrib_idx = {i for i, _ in contrib_entries}
        grad_idx = [
            i
            for i in range(len(self.potentials))
            if i not in fused_fns and i not in stateful and i not in contrib_idx
        ]
        self._stateful_provider_idx = sorted(stateful.keys())

        contrib_plan = None
        if contrib_groups:
            from timemachine_tpu.ops.assembly import assemble_forces, build_contrib_plan

            contrib_plan = build_contrib_plan(contrib_groups, self._x.shape[0])

        def energy_with_states(x, box, params_list, prov_states, rigid_only=False):
            """Total energy where stateful providers REUSE their tile lists
            (one sweep, no rebuild) — the MC-mover energy path. Valid for
            configurations within skin/2 of the tiles' build conf.

            rigid_only: for movers that displace molecules RIGIDLY (the
            barostat), bond-graph-local terms are bitwise invariant and
            cancel exactly in dU — skip them (also avoids f32 cancellation
            of large intra sums)."""
            total = 0.0
            for i, pot in enumerate(self.potentials):
                if rigid_only and getattr(pot, "rigid_group_invariant", False):
                    continue
                if i in stateful and len(stateful[i]) > 2:
                    k = self._stateful_provider_idx.index(i)
                    idx_e = 3 if rigid_only and len(stateful[i]) > 3 else 2
                    total = total + stateful[i][idx_e](prov_states[k], x, params_list[i], box)
                else:
                    total = total + pot(x, params_list[i], box)
            return total

        def residual_force(x, box, params_list):
            """Canonical-space force of everything EXCEPT the stateful
            providers: grad-evaluated terms, fused terms, and the shared
            contribution plan (bonded + exclusion tails)."""
            force = jnp.zeros_like(x)
            if grad_idx:

                def u_rest(xx):
                    return sum(self.potentials[i](xx, params_list[i], box) for i in grad_idx)

                force = force - jax.grad(u_rest)(x)
            for i in fused_fns:
                _, f = fused_fns[i](x, params_list[i], box)
                force = force + f
            if contrib_plan is not None:
                all_contribs = []
                for i, fn in contrib_entries:
                    cs, extra = fn(x, params_list[i], box)
                    all_contribs.extend(cs)
                    if extra is not None:
                        force = force + extra
                force = force + assemble_forces(contrib_plan, all_contribs)
            return force

        # exposed for equivalence diagnostics (tests/test_sorted_md.py)
        self._residual_force = residual_force

        def total_force(x, box, params_list, prov_states, t):
            force = residual_force(x, box, params_list)
            new_states = []
            for k, i in enumerate(self._stateful_provider_idx):
                _, f, st = stateful[i][1](prov_states[k], x, params_list[i], box, t)
                force = force + f
                new_states.append(st)
            return force, tuple(new_states)

        def step_fn(carry, params_list, base_key=None):
            x, v, box, t, mover_states, prov_states = carry
            key_t = jax.random.fold_in(base_key if base_key is not None else self._base_key, t)
            k_int, k_movers = jax.random.split(key_t)

            force, prov_states = total_force(x, box, params_list, prov_states, t)
            if is_verlet:
                # kick-drift leapfrog (half-kicks applied by the caller)
                v = v + jnp.asarray(cb, x.dtype) * force
                x = x + dt * v
            else:
                noise = jax.random.normal(k_int, x.shape, dtype=x.dtype)
                v_mid = v + jnp.asarray(cb, x.dtype) * force
                # cast ca too: a numpy f64 scalar would promote an f32 carry under x64
                v = jnp.asarray(ca, x.dtype) * v_mid + jnp.asarray(cc, x.dtype) * noise
                x = x + 0.5 * dt * (v_mid + v)

            new_mover_states = []
            for i, mover in enumerate(self.movers):
                mk = jax.random.fold_in(k_movers, i)
                # movers evaluate energies through the providers' cached tile
                # lists — one sweep instead of sweep + rebuild per evaluation;
                # rigid movers (barostat) additionally skip bond-graph-local
                # terms whose dU is exactly zero
                rigid = getattr(mover, "rigid_group_move", False)
                move_fn = mover.make_move_fn(
                    lambda xx, bb, _r=rigid: energy_with_states(xx, bb, params_list, prov_states, rigid_only=_r)
                )
                interval = mover.interval
                due = (t + 1) % interval == 0

                if getattr(mover, "moves_atoms_nonlocally", False) and self._stateful_provider_idx:
                    # exchange-style movers teleport atoms beyond the skin:
                    # stale tile lists would silently drop their interactions
                    # until the next scheduled rebuild, so rebuild on firing
                    def do_move(args):
                        st, xx, vv, bb, ps = args
                        st, xx, vv, bb = move_fn(st, xx, vv, bb, mk)
                        ps = tuple(
                            stateful[j][0](xx, params_list[j], bb) for j in self._stateful_provider_idx
                        )
                        return st, xx, vv, bb, ps

                    def skip(args):
                        return args

                    st, x, v, box, prov_states = jax.lax.cond(
                        due, do_move, skip, (mover_states[i], x, v, box, prov_states)
                    )
                else:

                    def do_move(args):
                        st, xx, vv, bb = args
                        return move_fn(st, xx, vv, bb, mk)

                    def skip(args):
                        return args

                    st, x, v, box = jax.lax.cond(due, do_move, skip, (mover_states[i], x, v, box))
                new_mover_states.append(st)

            return (x, v, box, t + 1, tuple(new_mover_states), prov_states), None

        # ---- sorted-state fast path (TPU Pallas providers) ------------------
        # Carry coordinates/velocities in the nonbonded provider's pad_order
        # space so the per-step (N,3) coordinate gather, the three chunk-major
        # column gathers and the un-sort force epilogue all disappear
        # (measured 1.167 -> 0.688 ms/step at 23k atoms INCLUDING the
        # canonical round-trip for bonded terms, scripts/probe_sorted.py).
        # Bonded/exclusion-tail terms stay canonical: one (N,3) un-sort gather
        # of x feeds them, their summed force joins the sweep force through
        # one sort gather. Movers run canonically inside their firing cond
        # (amortized). Restricted to Langevin + no free_mask + exactly one
        # stateful provider + no nonlocal movers; everything else falls back
        # to the canonical step_fn above.
        self._sorted_machinery = None
        if (
            not is_verlet
            and free_mask is None
            and len(self._stateful_provider_idx) == 1
            and not any(getattr(m, "moves_atoms_nonlocally", False) for m in self.movers)
            and os.environ.get("TM_SORTED_MD", "1") != "0"
        ):
            nb_i = self._stateful_provider_idx[0]
            sorted_m = getattr(self.potentials[nb_i], "md_force_provider_sorted", None)
            info = sorted_m() if sorted_m is not None else None
            if info is not None:
                n_atoms = self._x.shape[0]
                init_nb = stateful[nb_i][0]
                rebuild_interval = info.rebuild_interval
                cb_j = jnp.asarray(cb)
                cc_j = jnp.asarray(cc)

                def _tail_mask(n_pad):
                    # pad slots are always the static trailing Npad - N slots
                    # (pad_order = concat([argsort(keys), zeros]))
                    return (jnp.arange(n_pad) >= n_atoms)[:, None]

                def to_sorted(x_c, v_c, state, dtype):
                    """Canonical (N,3) x/v -> sorted carry aligned to state's
                    pad_order, with per-atom integrator rows re-sorted and
                    pad slots zeroed so they never move."""
                    po = info.pad_order(state)
                    tail = _tail_mask(po.shape[0])
                    zero = jnp.zeros((), dtype)
                    x_s = x_c[po]
                    v_s = jnp.where(tail, zero, v_c[po])
                    cb_s = jnp.where(tail, zero, jnp.asarray(cb_j, dtype)[po])
                    cc_s = jnp.where(tail, zero, jnp.asarray(cc_j, dtype)[po])
                    return x_s, v_s, cb_s, cc_s

                def sorted_step_fn(carry, params_list, base_key):
                    x_s, v_s, box, t, mover_states, prov_states, cb_s, cc_s = carry
                    key_t = jax.random.fold_in(base_key if base_key is not None else self._base_key, t)
                    k_int, k_movers = jax.random.split(key_t)
                    dtype = x_s.dtype

                    def rebuild(args):
                        x_s, v_s, cb_s, cc_s, st = args
                        x_c = x_s[info.inv(st)]
                        v_c = v_s[info.inv(st)]
                        st2 = init_nb(x_c, params_list[nb_i], box)
                        return (*to_sorted(x_c, v_c, st2, dtype), st2)

                    x_s, v_s, cb_s, cc_s, st = jax.lax.cond(
                        (t % rebuild_interval) == 0,
                        rebuild,
                        lambda args: args,
                        (x_s, v_s, cb_s, cc_s, prov_states[0]),
                    )
                    po = info.pad_order(st)
                    inv = info.inv(st)
                    tail = _tail_mask(po.shape[0])

                    # Refresh the pad-tail slots to the CURRENT atom-0 row
                    # every step. The canonical apply re-gathers
                    # wrapped[pad_order] per step, so its tail slots track
                    # atom 0 live; the sorted carry would otherwise freeze
                    # them at rebuild-time positions. Tail coordinates feed
                    # the per-step tile chop / preshift geometry, so stale
                    # tails shift summation images and break the bitwise
                    # equivalence contract (tests/test_sorted_md.py) and
                    # chunking invariance (to_sorted at chunk entry derives
                    # tails from the current frame).
                    x_s = jnp.where(tail, x_s[inv[0]], x_s)

                    out = info.sweep(st, x_s, box)  # (Npad, 8), poisoned on overflow
                    f_s = -out[:, 1:4].astype(dtype)
                    x_c = x_s[inv]
                    f_c = residual_force(x_c, box, params_list)
                    if info.canonical_force is not None:
                        f_c = f_c + info.canonical_force(x_c, params_list[nb_i], box)
                    f_s = jnp.where(tail, jnp.zeros((), dtype), f_s + f_c[po])

                    noise = jax.random.normal(k_int, x_s.shape, dtype=dtype)
                    v_mid = v_s + cb_s * f_s
                    v_s = jnp.asarray(ca, dtype) * v_mid + cc_s * noise
                    x_s = x_s + 0.5 * dt * (v_mid + v_s)

                    prov_states = (st,)
                    new_mover_states = []
                    for i, mover in enumerate(self.movers):
                        mk = jax.random.fold_in(k_movers, i)
                        rigid = getattr(mover, "rigid_group_move", False)
                        move_fn = mover.make_move_fn(
                            lambda xx, bb, _r=rigid: energy_with_states(
                                xx, bb, params_list, prov_states, rigid_only=_r
                            )
                        )
                        due = (t + 1) % mover.interval == 0

                        def do_move(args):
                            st_m, x_s, v_s, bb = args
                            xx, vv = x_s[inv], v_s[inv]
                            st_m, xx, vv, bb = move_fn(st_m, xx, vv, bb, mk)
                            x_s2 = xx[po]
                            v_s2 = jnp.where(tail, jnp.zeros((), dtype), vv[po])
                            return st_m, x_s2, v_s2, bb

                        st_m, x_s, v_s, box = jax.lax.cond(
                            due, do_move, lambda args: args, (mover_states[i], x_s, v_s, box)
                        )
                        new_mover_states.append(st_m)

                    return (x_s, v_s, box, t + 1, tuple(new_mover_states), prov_states, cb_s, cc_s), None

                self._sorted_machinery = (sorted_step_fn, to_sorted, info)

        return step_fn

    def _init_provider_states(self, x, box):
        states = []
        for i in self._stateful_provider_idx:
            init_fn = self.potentials[i].md_force_provider()[0]
            states.append(init_fn(x, self._params[i], box))
        return tuple(states)

    def _get_runner(self, steps_per_frame: int, n_frames: int, free_mask_key=None, free_mask=None):
        cache_key = (steps_per_frame, n_frames, free_mask_key)
        if cache_key in self._runner_cache:
            return self._runner_cache[cache_key]

        step_fn = self._make_step_fn(free_mask)

        if self._sorted_machinery is not None:
            sorted_step_fn, to_sorted, info = self._sorted_machinery

            # sorted-state runner: same external contract as the canonical
            # runner (canonical x/v in and out, canonical frames), sorted
            # carry inside the scans. The entry sort / exit un-sort / per-
            # frame un-sort are amortized over steps_per_frame steps.
            @jax.jit
            def run_sorted(x, v, box, t0, mover_states, prov_states, params_list, base_key):
                st0 = prov_states[0]
                x_s, v_s, cb_s, cc_s = to_sorted(x, v, st0, x.dtype)

                def frame_body(carry, _):
                    def step_body(c, _):
                        return sorted_step_fn(c, params_list, base_key)

                    carry, _ = jax.lax.scan(step_body, carry, None, length=steps_per_frame)
                    x_sf, _, box_f = carry[0], carry[1], carry[2]
                    inv_f = info.inv(carry[5][0])
                    return carry, (x_sf[inv_f], box_f)

                carry = (x_s, v_s, box, t0, mover_states, (st0,), cb_s, cc_s)
                carry, (xs, boxes) = jax.lax.scan(frame_body, carry, None, length=n_frames)
                x_s, v_s, box_out, t_out, mover_states, prov_states, _, _ = carry
                inv_out = info.inv(prov_states[0])
                return (x_s[inv_out], v_s[inv_out], box_out, t_out, mover_states, prov_states), xs, boxes

            self._runner_cache[cache_key] = run_sorted
            return run_sorted

        # base_key is a runtime argument (NOT a trace-time closure constant)
        # so reset_for_state's reseeding reaches already-compiled runners
        @jax.jit
        def run(x, v, box, t0, mover_states, prov_states, params_list, base_key):
            def frame_body(carry, _):
                def step_body(c, _):
                    return step_fn(c, params_list, base_key)

                carry, _ = jax.lax.scan(step_body, carry, None, length=steps_per_frame)
                x_f, v_f, box_f, _, _, _ = carry
                return carry, (x_f, box_f)

            carry = (x, v, box, t0, mover_states, prov_states)
            carry, (xs, boxes) = jax.lax.scan(frame_body, carry, None, length=n_frames)
            return carry, xs, boxes

        self._runner_cache[cache_key] = run
        return run

    def multiple_steps(self, n_steps: int, store_x_interval: int = 0):
        """Advance n_steps; return (frames, boxes) sampled every
        store_x_interval steps (0 ⇒ final frame only), matching
        Context::multiple_steps (context.cu:216-238)."""
        return self._multiple_steps_impl(n_steps, store_x_interval, free_mask_key=None, free_mask=None)

    def _multiple_steps_impl(self, n_steps, store_x_interval, free_mask_key, free_mask):
        interval = store_x_interval if store_x_interval > 0 else n_steps
        if n_steps % interval != 0:
            # match reference: frames at k*interval <= n_steps, plus warn-free tail handling
            n_frames = n_steps // interval
            tail = n_steps - n_frames * interval
        else:
            n_frames = n_steps // interval
            tail = 0

        mover_states = tuple(self._mover_states)
        xs_out, boxes_out = [], []
        x, v, box = jnp.asarray(self._x), jnp.asarray(self._v), jnp.asarray(self._box)

        is_verlet = isinstance(self.integrator, VelocityVerletIntegrator)
        if is_verlet:
            # enter the half-step velocity lattice (reference initialize):
            # v_{-1/2} = v_0 - (dt/2m) F(x_0); the scan's kick-drift steps
            # then advance on-step positions with half-step velocities, and
            # finalize recovers on-step velocities
            v = self._vv_half_kick(x, v, box, -0.5, free_mask)
        # int32 holds ~2.1B steps (~5.4 µs of MD at 2.5 fs) — plenty for a
        # single Context lifetime; avoids x64-truncation warnings on TPU
        t0 = jnp.asarray(self._step, dtype=jnp.result_type(int))

        # build the step fn (populates stateful-provider detection), then
        # reuse the carried provider states (exact unchunked rebuild
        # schedule) or initialize them from the current coordinates
        self._get_runner(interval if n_frames > 0 else tail, max(n_frames, 1), free_mask_key, free_mask)
        prov_states = self._prov_states
        if prov_states is None:
            prov_states = self._init_provider_states(x, box)

        if n_frames > 0:
            run = self._get_runner(interval, n_frames, free_mask_key, free_mask)
            carry, xs, boxes = run(x, v, box, t0, mover_states, prov_states, self._params, self._base_key)
            x, v, box, t0, mover_states, prov_states = carry
            xs_out.append(np.asarray(xs))
            boxes_out.append(np.asarray(boxes))
        if tail > 0:
            run = self._get_runner(tail, 1, free_mask_key, free_mask)
            carry, xs, boxes = run(x, v, box, t0, mover_states, prov_states, self._params, self._base_key)
            x, v, box, t0, mover_states, prov_states = carry

        if is_verlet:
            v = self._vv_half_kick(x, v, box, +0.5, free_mask)  # finalize

        self._x = np.asarray(x)
        self._v = np.asarray(v)
        self._box = np.asarray(box)
        self._step = int(t0)
        self._mover_states = list(mover_states)
        self._prov_states = prov_states

        self._validate_state()

        if xs_out:
            return np.concatenate(xs_out), np.concatenate(boxes_out)
        return np.zeros((0, *self._x.shape)), np.zeros((0, 3, 3))

    def _vv_half_kick(self, x, v, box, sign: float, free_mask=None):
        """v + sign * (dt/m) * F(x) — the Verlet initialize/finalize kicks."""
        cache_key = ("vv_half", None if free_mask is None else tuple(np.asarray(free_mask).tolist()))
        if cache_key not in self._runner_cache:
            cb = (self.integrator.dt / np.asarray(self.integrator.masses, dtype=np.float64))[:, None]
            cb = np.where(np.isfinite(cb), cb, 0.0)
            if free_mask is not None:
                cb = cb * np.asarray(free_mask, dtype=np.float64)[:, None]
            energy_fn = self._energy_fn

            @jax.jit
            def half_kick(x, v, box, params_list, sign):
                force = -jax.grad(energy_fn)(x, box, params_list)
                return v + sign * jnp.asarray(cb, x.dtype) * force

            self._runner_cache[cache_key] = half_kick
        return self._runner_cache[cache_key](x, v, box, self._params, sign)

    def step(self):
        """Single unstored step (ref Context::step)."""
        self._multiple_steps_impl(1, 1, None, None)

    # -- local MD (ref context.cu multiple_steps_local + local_md_potentials.cu)

    def setup_local_md(self, temperature: Optional[float] = None, freeze_reference: bool = True):
        """Declare local-MD settings (ref Context::setup_local_md,
        context.cu:90-100). On TPU there is nothing to pre-build: the free
        selection is a runtime mask input to one compiled local runner."""
        self._local_md_temperature = temperature
        self._local_md_freeze_reference = freeze_reference

    def _get_local_runner(self, steps_per_frame: int, n_frames: int, freeze_reference: bool = True):
        """Local-MD runner: like _get_runner but with a runtime (free-mask,
        reference restraint) input so new particle selections never recompile.

        TPU design note: the reference rebuilds the nonbonded potential on
        the free-row subset (local_md_potentials.cu:225-260) because dynamic
        index sets are cheap in CUDA. Under XLA, dynamic shapes force
        recompilation, so instead the FULL force is evaluated and frozen
        atoms are masked out of the integrator update — identical dynamics
        for the free atoms (frozen-frozen forces are computed then
        discarded)."""
        cache_key = ("local", steps_per_frame, n_frames, freeze_reference)
        if cache_key in self._runner_cache:
            return self._runner_cache[cache_key]

        assert isinstance(self.integrator, LangevinIntegrator)
        ca, cb, cc = self.integrator.coefficients(None)
        dt = self.integrator.dt

        fused_idx = [
            i for i, p in enumerate(self.potentials) if getattr(p, "energy_force_fn", lambda: None)() is not None
        ]
        fused_fns = {i: self.potentials[i].energy_force_fn() for i in fused_idx}
        grad_idx = [i for i in range(len(self.potentials)) if i not in fused_fns]

        from timemachine_tpu.constants import BOLTZ as _BOLTZ
        from timemachine_tpu.ops.pbc import lifted_distance_on_pairs

        restraint_temp = getattr(self, "_local_md_temperature", None) or getattr(
            self.integrator, "temperature", 300.0
        )
        inv_kT = 1.0 / (_BOLTZ * restraint_temp)

        def total_force(x, box, params_list, ref_idx, free, k, radius):
            force = jnp.zeros_like(x)
            if grad_idx:

                def u_rest(xx):
                    return sum(self.potentials[i](xx, params_list[i], box) for i in grad_idx)

                force = force - jax.grad(u_rest)(x)
            for i in fused_idx:
                _, f = fused_fns[i](x, params_list[i], box)
                force = force + f

            # flat-bottom restraint of each free atom to the reference
            # (ref k_local_md.cuh k_construct_bonded_params: k, r_min=0, r_max=radius);
            # with a FREE reference, frozen atoms additionally carry the
            # log-complement restraint -(1/beta) log(1 - exp(-beta U_fb)) so
            # the shell tracks the moving reference with the stationary
            # distribution preserved (ref local_md_potentials.cu:77-82)
            def u_restraint(xx):
                d = lifted_distance_on_pairs(xx[ref_idx][None, :].repeat(xx.shape[0], 0), xx, box)
                over = jnp.maximum(d - radius, 0.0)
                u_fb = (k / 4.0) * over**4
                u = jnp.sum(free * u_fb)
                if not freeze_reference:
                    is_self = jnp.arange(xx.shape[0]) == ref_idx
                    frozen = (1.0 - free) * (1.0 - is_self.astype(xx.dtype))
                    log_term = -jnp.log1p(-jnp.exp(-inv_kT * u_fb) * (1.0 - 1e-12))
                    u = u + jnp.sum(frozen * log_term) / inv_kT
                return u

            return force - jax.grad(u_restraint)(x)

        def step_fn(carry, params_list, ref_idx, free, k, radius):
            x, v, box, t = carry
            key_t = jax.random.fold_in(self._base_key, t)
            force = total_force(x, box, params_list, ref_idx, free, k, radius)
            noise = jax.random.normal(key_t, x.shape, dtype=x.dtype)
            fm = free[:, None]
            v_mid = v + jnp.asarray(cb, x.dtype) * fm * force
            v_new = jnp.asarray(ca, x.dtype) * v_mid + jnp.asarray(cc, x.dtype) * fm * noise
            # frozen atoms: coordinates AND velocities untouched
            x = x + jnp.where(fm > 0, 0.5 * dt * (v_mid + v_new), 0.0)
            v = jnp.where(fm > 0, v_new, v)
            return (x, v, box, t + 1), None

        @jax.jit
        def run(x, v, box, t0, params_list, ref_idx, free, k, radius):
            def frame_body(carry, _):
                def step_body(c, _):
                    return step_fn(c, params_list, ref_idx, free, k, radius)

                carry, _ = jax.lax.scan(step_body, carry, None, length=steps_per_frame)
                x_f, _, box_f, _ = carry
                return carry, (x_f, box_f)

            carry = (x, v, box, t0)
            carry, (xs, boxes) = jax.lax.scan(frame_body, carry, None, length=n_frames)
            return carry, xs, boxes

        self._runner_cache[cache_key] = run
        return run

    def multiple_steps_local(
        self,
        n_steps: int,
        local_idxs,
        k: float = 10_000.0,
        radius: float = 1.0,
        seed: int = 0,
        store_x_interval: int = 0,
        temperature: Optional[float] = None,
        freeze_reference: bool = True,
    ):
        """Advance n_steps moving only a probabilistically-selected region
        around a random atom of local_idxs (ref Context::multiple_steps_local,
        context.cu:102-160; selection per k_log_probability_selection,
        k_flat_bottom_bond.cuh:23-70). Movers do not fire during local MD.

        Returns (frames, boxes) like multiple_steps."""
        from timemachine_tpu.constants import BOLTZ

        assert len(local_idxs) > 0
        n_atoms = self._x.shape[0]
        temperature = temperature if temperature is not None else getattr(self.integrator, "temperature", 300.0)
        kBT = BOLTZ * temperature

        rng = np.random.default_rng(seed)
        reference_idx = int(np.asarray(local_idxs)[rng.integers(len(local_idxs))])

        # selection: p_i = exp(-U_fb(d_i; 0, radius) / kBT), 1 inside radius
        diff = self._x - self._x[reference_idx]
        box_diag = np.diagonal(self._box)
        diff -= box_diag * np.floor(diff / box_diag + 0.5)
        d = np.linalg.norm(diff, axis=1)
        over = np.maximum(d - radius, 0.0)
        p_sel = np.exp(-(k / 4.0) * over**4 / kBT)
        free = (rng.random(n_atoms) < p_sel).astype(np.float64)
        # freeze_reference=True: the reference anchors the region (frozen);
        # False: it moves too, and the frozen shell is tethered to it by the
        # log-complement restraint inside the runner
        free[reference_idx] = 0.0 if freeze_reference else 1.0
        return self._run_local(n_steps, reference_idx, free, k, radius, store_x_interval, freeze_reference)

    def multiple_steps_local_selection(
        self,
        n_steps: int,
        reference_idx: int,
        selection_idxs,
        store_x_interval: int = 0,
        radius: float = 1.2,
        k: float = 10_000.0,
        freeze_reference: bool = True,
    ):
        """Advance n_steps moving ONLY the explicitly-selected atoms, each
        flat-bottom-restrained (r_max=radius, stiffness k) to reference_idx
        (ref Context::multiple_steps_local_selection, context.cu:111-161;
        custom_ops.pyi:95). Unlike multiple_steps_local, the free set is
        caller-chosen rather than probabilistically sampled. The reference
        atom must not be in the selection; it is frozen unless
        freeze_reference=False (reference: setup_local_md flag), in which
        case it moves and the frozen shell tracks it via the log-complement
        restraint. Returns (frames, boxes) like multiple_steps."""
        selection_idxs = np.asarray(selection_idxs, dtype=np.int64)
        assert selection_idxs.ndim == 1 and len(selection_idxs) > 0
        n_atoms = self._x.shape[0]
        if np.any((selection_idxs < 0) | (selection_idxs >= n_atoms)):
            raise ValueError("selection_idxs out of range")
        if reference_idx in selection_idxs:
            raise ValueError("reference_idx must not be part of selection_idxs")
        free = np.zeros(n_atoms, dtype=np.float64)
        free[selection_idxs] = 1.0
        free[reference_idx] = 0.0 if freeze_reference else 1.0
        return self._run_local(n_steps, int(reference_idx), free, k, radius, store_x_interval, freeze_reference)

    def _run_local(self, n_steps, reference_idx, free, k, radius, store_x_interval, freeze_reference):
        if free.sum() == 0:
            raise RuntimeError("local MD selection has no free particles")

        interval = store_x_interval if store_x_interval > 0 else n_steps
        n_frames, tail = divmod(n_steps, interval)

        x, v, box = jnp.asarray(self._x), jnp.asarray(self._v), jnp.asarray(self._box)
        t0 = jnp.asarray(self._step, dtype=jnp.result_type(int))
        freej = jnp.asarray(free, x.dtype)
        xs_out, boxes_out = [], []

        if n_frames > 0:
            run = self._get_local_runner(interval, n_frames, freeze_reference)
            carry, xs, boxes = run(x, v, box, t0, self._params, reference_idx, freej, k, radius)
            x, v, box, t0 = carry
            xs_out.append(np.asarray(xs))
            boxes_out.append(np.asarray(boxes))
        if tail > 0:
            run = self._get_local_runner(tail, 1, freeze_reference)
            carry, _, _ = run(x, v, box, t0, self._params, reference_idx, freej, k, radius)
            x, v, box, t0 = carry

        self._x = np.asarray(x)
        self._v = np.asarray(v)
        self._box = np.asarray(box)
        self._step = int(t0)
        # local MD moved atoms outside the provider-carry bookkeeping
        self._prov_states = None
        self._validate_state()

        if xs_out:
            return np.concatenate(xs_out), np.concatenate(boxes_out)
        return np.zeros((0, *self._x.shape)), np.zeros((0, 3, 3))

    def _validate_state(self):
        """Coordinate / box sanity checks (ref context.cu:52-78)."""
        if not np.all(np.isfinite(self._x)):
            raise RuntimeError("Context: coordinates are not finite (simulation blew up)")
        max_coord = np.max(np.abs(self._x))
        if max_coord > 1e5:
            raise RuntimeError(f"Context: coordinates exploded (|x|max = {max_coord})")
        box_diag = np.diagonal(self._box)
        cutoffs = [getattr(p, "cutoff", None) for p in self.potentials]
        cutoffs = [c for c in cutoffs if c is not None]
        if cutoffs and np.any(box_diag < 2 * max(cutoffs)):
            raise RuntimeError(
                f"Context: box dimensions {box_diag} smaller than twice the nonbonded cutoff {max(cutoffs)}"
            )
