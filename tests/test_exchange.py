"""Water exchange movers: weight math, incremental consistency, acceptance
semantics, and the scan-based production mover.

Parity target: reference tests/test_exchange_mover.py strategy (weights vs
brute force, incremental vs full recompute, ideal-gas occupancy statistics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.md.exchange import exchange_mover as em
from timemachine_tpu.md.exchange.targeted_insertion import TIBDExchangeMove as TIBDScanMove
from timemachine_tpu.md.states import CoordsVelBox
from timemachine_tpu.ops.nonbonded import nonbonded_block

BETA = 2.0
CUTOFF = 1.2
TEMP = 300.0
KT = BOLTZ * TEMP


def make_water_box(n_waters: int, box_width: float, seed: int, charged=True):
    """Rigid TIP3P-ish waters at random placements."""
    rng = np.random.default_rng(seed)
    water_template = np.array([[0.0, 0, 0], [0.09572, 0, 0], [-0.024, 0.0927, 0]])
    coords = []
    for _ in range(n_waters):
        loc = rng.uniform(0, box_width, 3)
        rot = em.random_rotation_matrix(rng)
        coords.append(water_template @ rot.T + loc)
    conf = np.concatenate(coords)
    n = 3 * n_waters
    params = np.zeros((n, 4))
    if charged:
        q = np.sqrt(138.935456)
        params[0::3, 0] = -0.834 * q
        params[1::3, 0] = 0.417 * q
        params[2::3, 0] = 0.417 * q
        params[0::3, 1] = 0.315 / 2
        params[0::3, 2] = np.sqrt(0.635)
    water_idxs = np.arange(n).reshape(n_waters, 3)
    box = np.eye(3) * box_width
    return conf, params, water_idxs, box


def brute_force_weights(conf, params, water_idxs, box):
    """beta * U_i for each water by direct interaction-group evaluation."""
    n = conf.shape[0]
    out = []
    for g in water_idxs:
        others = np.delete(np.arange(n), g)
        u = nonbonded_block(conf[g], conf[others], box, params[g], params[others], BETA, CUTOFF)
        out.append(float(u) / KT)
    return np.array(out)


def test_batch_log_weights_vs_brute_force():
    conf, params, water_idxs, box = make_water_box(20, 2.0, seed=0)
    batch_fn, _ = em.make_weight_fns(params, water_idxs, BETA, CUTOFF, KT)
    weights = np.asarray(batch_fn(conf, box))
    ref = brute_force_weights(conf, params, water_idxs, box)
    np.testing.assert_allclose(weights, ref, rtol=1e-8)


def test_incremental_weights_match_full_recompute():
    conf, params, water_idxs, box = make_water_box(20, 2.0, seed=1)
    batch_fn, incr_fn = em.make_weight_fns(params, water_idxs, BETA, CUTOFF, KT)
    weights = np.asarray(batch_fn(conf, box))

    rng = np.random.default_rng(2)
    for trial in range(5):
        chosen = rng.integers(0, 20)
        new_pos = em.randomly_rotate_and_translate(conf[water_idxs[chosen]], rng.uniform(0, 2.0, 3), rng)
        w_after, new_conf = incr_fn(conf, box, chosen, new_pos, weights)
        w_full = np.asarray(batch_fn(np.asarray(new_conf), box))
        np.testing.assert_allclose(np.asarray(w_after), w_full, rtol=1e-6, atol=1e-8)
        conf = np.asarray(new_conf)
        weights = w_full


def test_bd_exchange_move_preserves_geometry():
    conf, params, water_idxs, box = make_water_box(15, 2.0, seed=3)
    mover = em.BDExchangeMove(BETA, CUTOFF, params, water_idxs, TEMP, seed=4)
    x = CoordsVelBox(conf, np.zeros_like(conf), box)
    d_ref = np.linalg.norm(conf[water_idxs][:, 1] - conf[water_idxs][:, 0], axis=-1)
    for _ in range(20):
        x = mover.move(x)
    # rigid: intramolecular O-H distances unchanged through any accepted moves
    d_new = np.sort(np.linalg.norm(x.coords[water_idxs][:, 1] - x.coords[water_idxs][:, 0], axis=-1))
    np.testing.assert_allclose(d_new, np.sort(d_ref), atol=1e-10)
    assert mover.n_proposed == 20


def test_get_water_groups_partition():
    conf, params, water_idxs, box = make_water_box(25, 2.5, seed=5)
    center = np.array([1.25, 1.25, 1.25])
    inner, outer = em.get_water_groups(conf, box, center, water_idxs, radius=0.8)
    assert len(inner) + len(outer) == 25
    centroids = conf[water_idxs].mean(axis=1)
    for i in inner:
        assert np.linalg.norm(em.delta_r_np(centroids[i], center, box)) < 0.8
    for i in outer:
        assert np.linalg.norm(em.delta_r_np(centroids[i], center, box)) >= 0.8


def test_proposal_probability_corners():
    assert em.compute_proposal_probabilities_given_counts(5, 5) == 0.5
    assert em.compute_proposal_probabilities_given_counts(5, 0) == 1.0
    assert em.compute_proposal_probabilities_given_counts(0, 5) == 1.0
    with pytest.raises(AssertionError):
        em.compute_proposal_probabilities_given_counts(0, 0)


def test_tibd_move_runs_and_moves_waters():
    conf, params, water_idxs, box = make_water_box(20, 2.0, seed=6)
    ligand_idxs = water_idxs[0]  # treat water 0's atoms as the "ligand" center
    sampler_waters = water_idxs[1:]
    mover = em.TIBDExchangeMove(BETA, CUTOFF, params, sampler_waters, TEMP, ligand_idxs, radius=0.7, seed=7)
    x = CoordsVelBox(conf, np.zeros_like(conf), box)
    for _ in range(25):
        x = mover.move(x)
    assert mover.n_proposed == 25
    assert np.all(np.isfinite(x.coords))


def test_tibd_ideal_gas_occupancy():
    """With all interactions off, TIBD equilibrium occupancy of the sphere is
    W * vol_sphere / vol_box (ideal gas)."""
    n_waters = 30
    box_width = 2.2
    conf, params, water_idxs, box = make_water_box(n_waters, box_width, seed=8, charged=False)
    center_atoms = np.array([0, 1, 2])
    sampler_waters = water_idxs[1:]
    radius = 0.7
    mover = em.TIBDExchangeMove(BETA, CUTOFF, params, sampler_waters, TEMP, center_atoms, radius, seed=9)
    x = CoordsVelBox(conf, np.zeros_like(conf), box)

    counts = []
    for step in range(400):
        x = mover.move(x)
        if step >= 100:
            center = x.coords[center_atoms].mean(0)
            inner, _ = em.get_water_groups(x.coords, box, center, sampler_waters, radius)
            counts.append(len(inner))

    vol_sphere = 4 / 3 * np.pi * radius**3
    expected = (n_waters - 1) * vol_sphere / box_width**3
    observed = np.mean(counts)
    # binomial stddev ~ sqrt(W p (1-p)) ~ 2; autocorrelated chain → loose tol
    assert observed == pytest.approx(expected, abs=2.5), (observed, expected)
    assert mover.n_accepted > 0


def test_scan_mover_matches_weight_invariants():
    """Production scan mover: counters advance, geometry stays rigid, and its
    final weights equal a fresh full recompute."""
    conf, params, water_idxs, box = make_water_box(18, 2.0, seed=10)
    ligand_idxs = np.array([0, 1, 2], dtype=np.int32)
    sampler_waters = [g for g in water_idxs[1:]]
    mover = TIBDScanMove(
        n_atoms=conf.shape[0],
        ligand_idxs=ligand_idxs,
        water_idxs=sampler_waters,
        params=params,
        temperature=TEMP,
        beta=BETA,
        cutoff=CUTOFF,
        radius=0.7,
        seed=11,
        n_proposals=50,
        interval=400,
    )
    state = mover.init_state()
    move = mover.make_move_fn(None)
    key = jax.random.key(12)
    new_state, x_new, v_new, box_new = jax.jit(move)(state, jnp.asarray(conf), jnp.zeros_like(conf), jnp.asarray(box), key)

    assert int(new_state.n_proposed) == 50
    assert 0 <= int(new_state.n_accepted) <= 50
    x_new = np.asarray(x_new)
    assert np.all(np.isfinite(x_new))
    # rigid waters
    d_ref = np.sort(np.linalg.norm(conf[water_idxs][:, 2] - conf[water_idxs][:, 0], axis=-1))
    d_new = np.sort(np.linalg.norm(x_new[water_idxs][:, 2] - x_new[water_idxs][:, 0], axis=-1))
    np.testing.assert_allclose(d_new, d_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(box_new), box)

    # ligand untouched
    np.testing.assert_array_equal(x_new[:3], conf[:3])


def test_scan_mover_ideal_gas_occupancy():
    """Equilibrium sphere occupancy for the jitted scan mover (ideal gas)."""
    n_waters = 30
    box_width = 2.2
    conf, params, water_idxs, box = make_water_box(n_waters, box_width, seed=13, charged=False)
    ligand_idxs = np.array([0, 1, 2], dtype=np.int32)
    sampler_waters = [g for g in water_idxs[1:]]
    radius = 0.7
    mover = TIBDScanMove(
        n_atoms=conf.shape[0],
        ligand_idxs=ligand_idxs,
        water_idxs=sampler_waters,
        params=params,
        temperature=TEMP,
        beta=BETA,
        cutoff=CUTOFF,
        radius=radius,
        seed=14,
        n_proposals=200,
        interval=400,
    )
    move = jax.jit(mover.make_move_fn(None))
    state = mover.init_state()
    x = jnp.asarray(conf)
    counts = []
    key = jax.random.key(15)
    for i in range(12):
        key, sub = jax.random.split(key)
        state, x, _, _ = move(state, x, jnp.zeros_like(x), jnp.asarray(box), sub)
        if i >= 2:
            center = np.asarray(x)[ligand_idxs].mean(0)
            inner, _ = em.get_water_groups(np.asarray(x), box, center, np.asarray(sampler_waters), radius)
            counts.append(len(inner))

    vol_sphere = 4 / 3 * np.pi * radius**3
    expected = (n_waters - 1) * vol_sphere / box_width**3
    assert np.mean(counts) == pytest.approx(expected, abs=2.5), (np.mean(counts), expected)
    assert int(state.n_accepted) > 0


def test_scan_mover_state_params_swap_without_retrace():
    """HREX swaps the sampler's per-lambda params through TIBDState: the SAME
    jitted move fn must produce different trajectories for different
    state-carried params (no silent trace-time constant capture)."""
    n_waters, box_width = 24, 1.6
    conf, params, water_idxs, box = make_water_box(n_waters, box_width, seed=5)
    ligand_idxs = water_idxs[0]
    sampler_waters = water_idxs[1:]

    mover = TIBDScanMove(
        n_atoms=conf.shape[0],
        ligand_idxs=ligand_idxs,
        water_idxs=sampler_waters,
        params=params,
        temperature=TEMP,
        beta=BETA,
        cutoff=CUTOFF,
        radius=0.5,
        seed=3,
        n_proposals=50,
        interval=400,
    )
    move = jax.jit(mover.make_move_fn(None))
    x = jnp.asarray(conf)
    v = jnp.zeros_like(x)
    key = jax.random.key(7)

    state_a = mover.init_state()
    # decoupled-ish params: all charges/eps zeroed => ideal-gas acceptance
    params_b = np.zeros_like(params)
    state_b = state_a._replace(params=jnp.asarray(params_b, state_a.params.dtype))

    sa, xa, _, _ = move(state_a, x, v, jnp.asarray(box), key)
    sb, xb, _, _ = move(state_b, x, v, jnp.asarray(box), key)

    # same compiled fn, same key: only the state-carried params differ
    assert not np.allclose(np.asarray(xa), np.asarray(xb))
    # ideal gas accepts (nearly) everything; interacting system does not
    assert int(sb.n_accepted) > int(sa.n_accepted)


def test_scan_mover_matches_prototype_move_for_move():
    """Trajectory-level cross-validation (VERDICT r3 item 9; ref
    tests/test_cuda_targeted_insertion_mover.py strategy): drive the
    production scan mover once, capture its per-proposal trace (selection,
    insertion site, rotation, acceptance uniform), then re-judge the SAME
    proposal stream with the python prototype's independent weight +
    raw-ratio math (exchange_mover.py). Every proposal must agree on the
    region partition, the selected water, the raw log acceptance ratio,
    and the accept decision; the replayed trajectory must land on the
    mover's final coordinates."""
    n_prop = 80
    conf, params, water_idxs, box = make_water_box(18, 2.0, seed=21)
    ligand_idxs = np.array([0, 1, 2], dtype=np.int32)
    sampler_waters = np.asarray([g for g in water_idxs[1:]], dtype=np.int32)
    radius = 0.7
    mover = TIBDScanMove(
        n_atoms=conf.shape[0],
        ligand_idxs=ligand_idxs,
        water_idxs=sampler_waters,
        params=params,
        temperature=TEMP,
        beta=BETA,
        cutoff=CUTOFF,
        radius=radius,
        seed=22,
        n_proposals=n_prop,
        interval=400,
    )
    state = mover.init_state()
    key = jax.random.key(23)
    new_state, x_fin, _, _, recs = mover.move_traced(
        state, jnp.asarray(conf), jnp.zeros_like(conf), jnp.asarray(box), key
    )
    x_fin = np.asarray(x_fin)
    recs = {k: np.asarray(v) for k, v in recs.items()}

    # prototype (spec) machinery on the same system
    blw, inc = em.make_weight_fns(params, sampler_waters, BETA, CUTOFF, KT)
    vol_sphere = (4.0 / 3.0) * np.pi * radius**3
    vol_box = float(np.prod(np.diag(box)))

    x = conf.astype(np.float64).copy()
    weights = np.asarray(blw(x, box))
    n_accepted = 0
    n_checked = 0
    for t in range(n_prop):
        center = np.mean(x[ligand_idxs], axis=0)
        inner, outer = em.get_water_groups(x, box, center, sampler_waters, radius)
        assert len(inner) == recs["n1"][t], t
        i2o = bool(recs["i2o"][t])
        vi_mols, vj_mols = (inner, outer) if i2o else (outer, inner)
        vol_i, vol_j = (vol_sphere, vol_box - vol_sphere) if i2o else (vol_box - vol_sphere, vol_sphere)
        chosen = int(recs["chosen"][t])
        if len(vi_mols) == 0:
            # the mover short-circuits these to reject
            assert not bool(recs["accept"][t]), t
            continue
        assert chosen in vi_mols, (t, chosen, vi_mols)

        # rigid placement from the traced site + rotation
        a_idxs = sampler_waters[chosen]
        w = x[a_idxs]
        new_pos = (w - w.mean(axis=0, keepdims=True)) @ recs["rot"][t].T + recs["site"][t]

        w_after_full, x_new = inc(x, box, chosen, new_pos, weights)
        w_after_full = np.asarray(w_after_full)
        vj_plus_one = np.concatenate([[chosen], vj_mols]).astype(int)
        raw = em.compute_raw_ratio_given_weights(
            weights[vi_mols], w_after_full[vj_plus_one], vi_mols, vj_mols, vol_i, vol_j
        )
        np.testing.assert_allclose(raw, recs["raw_log_p"][t], rtol=1e-8, atol=1e-8, err_msg=str(t))

        accept = (recs["log_u"][t] < min(raw, 0.0)) and len(vi_mols) > 0
        assert accept == bool(recs["accept"][t]), t
        n_checked += 1
        if accept:
            x = np.asarray(x_new)
            weights = w_after_full
            n_accepted += 1

    assert n_checked > 0.9 * n_prop  # the empty-region corner must be rare
    assert n_accepted == int(new_state.n_accepted)
    assert n_accepted > 0  # the stream must exercise accepted moves
    np.testing.assert_allclose(x, x_fin, rtol=0, atol=1e-9)


def test_scan_mover_convergence_two_starts():
    """Physics-level convergence with REAL interactions (ref
    tests/test_examples.py:171-219 buckyball strategy, scaled to the unit
    suite): two opposite initializations — every sampler water packed INSIDE
    the ligand sphere vs every water pushed OUTSIDE it — must relax to the
    same equilibrium sphere occupancy under the production scan mover. The
    ligand carries repulsive LJ so the sphere has genuine excluded volume and
    the equilibrium is interaction-determined, not ideal-gas."""
    n_waters = 24
    box_width = 2.2
    radius = 0.7
    # uncharged LJ waters: gas-like, fast-mixing (charged waters cluster into
    # a droplet whose location is multimodal — unusable at unit-test length)
    conf, params, water_idxs, box = make_water_box(n_waters, box_width, seed=31, charged=False)
    params = params.copy()
    params[3::3, 1] = 0.315 / 2  # LJ on every water oxygen
    params[3::3, 2] = np.sqrt(0.2)
    ligand_idxs = np.array([0, 1, 2], dtype=np.int32)
    # make the "ligand" (first water's atoms) a rigid repulsive blob at the
    # box center: no charge, sizeable LJ
    center0 = np.array([box_width / 2] * 3)
    conf[ligand_idxs] = conf[ligand_idxs] - conf[ligand_idxs].mean(0) + center0
    params[ligand_idxs, 0] = 0.0
    params[ligand_idxs, 1] = 0.35 / 2  # sigma/2
    params[ligand_idxs, 2] = np.sqrt(0.8)  # sqrt(eps)
    sampler_waters = np.asarray([g for g in water_idxs[1:]], dtype=np.int32)

    rng = np.random.default_rng(32)

    def place(inside: bool):
        """Random rigid placements of every sampler water in/out of the sphere."""
        x = conf.copy()
        for g in sampler_waters:
            while True:
                loc = rng.uniform(0, box_width, 3)
                r = np.linalg.norm(em.delta_r_np(loc, center0, box))
                if (r < radius * 0.95) == inside and (inside or r > radius * 1.05):
                    break
            x[g] = em.randomly_rotate_and_translate(conf[g], loc, rng)
        return x

    def trace(x0, seed):
        mover = TIBDScanMove(
            n_atoms=conf.shape[0],
            ligand_idxs=ligand_idxs,
            water_idxs=sampler_waters,
            params=params,
            temperature=TEMP,
            beta=BETA,
            cutoff=CUTOFF,
            radius=radius,
            seed=seed,
            n_proposals=200,
            interval=400,
        )
        move = jax.jit(mover.make_move_fn(None))
        state = mover.init_state()
        x = jnp.asarray(x0)
        key = jax.random.key(seed)
        counts = []
        for _ in range(14):
            key, sub = jax.random.split(key)
            state, x, _, _ = move(state, x, jnp.zeros_like(x), jnp.asarray(box), sub)
            inner, _ = em.get_water_groups(np.asarray(x), box, center0, sampler_waters, radius)
            counts.append(len(inner))
        assert int(state.n_accepted) > 0
        return np.array(counts)

    x_over = place(inside=True)
    x_empty = place(inside=False)
    n0_over, _ = em.get_water_groups(x_over, box, center0, sampler_waters, radius)
    n0_empty, _ = em.get_water_groups(x_empty, box, center0, sampler_waters, radius)
    assert len(n0_over) == n_waters - 1 and len(n0_empty) == 0

    c_over = trace(x_over, seed=33)
    c_empty = trace(x_empty, seed=34)

    # both chains move decisively away from their initializations...
    assert c_over[-7:].mean() < (n_waters - 1) * 0.5
    assert c_empty[-7:].mean() > 0.0
    # ...and meet at the same equilibrium occupancy (loose: short
    # autocorrelated chains)
    assert abs(c_over[-7:].mean() - c_empty[-7:].mean()) < 3.0, (c_over, c_empty)
