"""Stateful Pallas MD provider: tile-list reuse and rebuild semantics
(interpret mode). Pins the ARCHITECTURE claims that round 1 left untested:

* within-skin displacements reuse stale tiles and still produce the fresh
  forces (the skin guarantees coverage),
* a barostat-scale box change within skin keeps mover energies consistent,
* a nonlocal teleport (exchange-style) makes stale tiles WRONG, and the
  Context's moves_atoms_nonlocally hook rebuilds so post-move forces match a
  freshly built Context at identical coordinates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops.pallas.rowscan_kernel import (
    make_nonbonded_rowscan_md,
    suggest_max_pairs,
)

BETA, CUTOFF = 2.0, 1.2


@pytest.fixture(scope="module")
def fluid():
    rng = np.random.default_rng(0)
    n_side = 16
    pts = np.stack(np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"), -1).reshape(-1, 3) * 0.31
    n = 3000
    conf = (pts[:n] + rng.normal(0, 0.03, (n, 3))).astype(np.float32)
    box = np.eye(3, dtype=np.float32) * (n_side * 0.31)
    params = np.stack(
        [
            rng.uniform(-0.6, 0.6, n) * np.sqrt(138.935456),
            rng.uniform(0.05, 0.16, n),
            rng.uniform(0.05, 0.9, n) ** 0.5,
            np.zeros(n),
        ],
        1,
    ).astype(np.float32)
    return jnp.asarray(conf), jnp.asarray(params), jnp.asarray(box)


def make_provider(conf, params, box, skin=0.1):
    mp = suggest_max_pairs(np.asarray(conf), np.asarray(box), CUTOFF + skin, triangular=True)
    return make_nonbonded_rowscan_md(BETA, CUTOFF, mp, skin=skin, rebuild_interval=20, interpret=True)[:3]


def test_within_skin_reuse_matches_fresh_build(fluid):
    conf, params, box = fluid
    init_fn, apply_fn, energy_fn = make_provider(conf, params, box)
    state = init_fn(conf, params, box)

    rng = np.random.default_rng(1)
    moved = conf + jnp.asarray(rng.normal(0, 0.012, conf.shape), jnp.float32)  # |dx| << skin/2

    _, f_stale, _ = apply_fn(state, moved, params, box, jnp.int32(1))  # t=1: no rebuild
    fresh = init_fn(moved, params, box)
    _, f_fresh, _ = apply_fn(fresh, moved, params, box, jnp.int32(1))

    np.testing.assert_allclose(np.asarray(f_stale), np.asarray(f_fresh), rtol=1e-4, atol=5e-3)
    # energies through the cached tiles agree too (the MC-mover path)
    u_stale = float(energy_fn(state, moved, params, box))
    u_fresh = float(energy_fn(fresh, moved, params, box))
    assert u_stale == pytest.approx(u_fresh, rel=1e-6)


def test_barostat_scale_within_skin_consistent(fluid):
    conf, params, box = fluid
    init_fn, apply_fn, energy_fn = make_provider(conf, params, box)
    state = init_fn(conf, params, box)

    # a barostat trial move: ~0.1% volume scale (dx ~ 2e-3 nm at box edge)
    scale = jnp.float32(1.001 ** (1.0 / 3.0))
    conf_s = conf * scale
    box_s = box * scale

    u_stale = float(energy_fn(state, conf_s, params, box_s))
    fresh = init_fn(conf_s, params, box_s)
    u_fresh = float(energy_fn(fresh, conf_s, params, box_s))
    assert u_stale == pytest.approx(u_fresh, rel=1e-6)


def test_teleport_requires_rebuild(fluid):
    conf, params, box = fluid
    init_fn, apply_fn, _ = make_provider(conf, params, box)
    state = init_fn(conf, params, box)

    # teleport one atom across the box (far beyond the skin)
    target = 7
    tele = conf.at[target].set(conf[target] + jnp.asarray([2.0, 2.1, 1.9], jnp.float32))

    _, f_stale, _ = apply_fn(state, tele, params, box, jnp.int32(1))  # stale tiles
    fresh = init_fn(tele, params, box)
    _, f_fresh, _ = apply_fn(fresh, tele, params, box, jnp.int32(1))

    # stale tiles MISS the teleported atom's new neighborhood...
    err_stale = np.abs(np.asarray(f_stale)[target] - np.asarray(f_fresh)[target]).max()
    assert err_stale > 1.0, "teleport should invalidate cached tiles"
    # ...and a rebuild (t % rebuild_interval == 0) restores correctness
    _, f_rebuilt, st2 = apply_fn(state, tele, params, box, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(f_rebuilt), np.asarray(f_fresh), rtol=1e-4, atol=5e-3)


def test_context_nonlocal_mover_triggers_rebuild(fluid):
    """A mover flagged moves_atoms_nonlocally teleports an atom mid-scan; the
    Context must rebuild provider tiles on firing so subsequent forces match
    a freshly constructed Context at the same coordinates."""
    from timemachine_tpu.integrators import LangevinIntegrator
    from timemachine_tpu.md.context import Context
    from timemachine_tpu.potentials import NonbondedAllPairs

    conf, params, box = fluid
    n = conf.shape[0]

    pot = NonbondedAllPairs(n, beta=BETA, cutoff=CUTOFF)
    pot.configure_pallas(np.asarray(box), np.asarray(conf), interpret=True, kernel="rowscan")
    bp = pot.bind(np.asarray(params))

    class TeleportMover:
        interval = 3
        moves_atoms_nonlocally = True

        def init_state(self):
            return (jnp.zeros((), jnp.int32),)

        def make_move_fn(self, energy_fn):
            def move(st, x, v, b, key):
                x = x.at[5].set(x[5] + jnp.asarray([1.5, 1.6, 1.4], x.dtype))
                return (st[0] + 1,), x, v, b

            return move

    masses = np.full(n, 16.0)
    intg = LangevinIntegrator(300.0, 1e-3, 1.0, masses, seed=3)
    v0 = np.zeros((n, 3), np.float64)
    x64 = np.asarray(conf, np.float64)
    box64 = np.asarray(box, np.float64)

    ctxt = Context(x64, v0, box64, intg, [bp], movers=[TeleportMover()])
    ctxt.multiple_steps(3)  # mover fires at step 3
    x_after, v_after = ctxt.get_x_t(), ctxt.get_v_t()

    ctxt_fresh = Context(x_after, v_after, box64, intg, [bp])
    ctxt_fresh._step = 3
    ctxt.step()
    ctxt_fresh.step()
    # the carried tile list (rebuilt in-jit at mover firing) and the fresh
    # eager build cover the same interactions but may order atoms near cell
    # boundaries differently, so forces agree only up to f32 reduction order;
    # a MISSED rebuild (the failure this test guards) leaves the teleported
    # atom's interactions out entirely and diverges at the 1e-2+ level.
    np.testing.assert_allclose(ctxt.get_x_t(), ctxt_fresh.get_x_t(), rtol=1e-4, atol=1e-4)
