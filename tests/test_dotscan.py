"""Dotscan kernel (v5, MXU-assisted) parity vs the rowscan production
kernel, interpret mode on CPU. Covers the dot-identity distances, per-column
row-center image shifts, row-center quantization, and the matmul-form
force/reaction accumulation (ops/pallas/dotscan_kernel.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops.pallas import dotscan_kernel as dk
from timemachine_tpu.ops.pallas.rowscan_kernel import (
    es_energy_force_series,
    make_nonbonded_rowscan_energy_force,
    make_nonbonded_rowscan_md,
    suggest_max_pairs,
)

BETA, CUTOFF = 2.0, 1.2


def lattice_fluid(n, n_side, jitter, seed, spacing=0.31):
    rng = np.random.default_rng(seed)
    pts = np.stack(np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"), -1).reshape(-1, 3) * spacing
    conf = pts[:n] + rng.normal(0, jitter, (n, 3))
    box = np.eye(3) * (n_side * spacing)
    charges = rng.uniform(-0.8, 0.8, n) * np.sqrt(138.935456)
    params = np.stack(
        [charges, rng.uniform(0.05, 0.16, n), rng.uniform(0.05, 0.9, n) ** 0.5, np.zeros(n)], 1
    )
    return conf, params, box


def run_dotscan(conf, params, box, triangular, sort="hilbert"):
    conf32 = jnp.asarray(conf, jnp.float32)
    params32 = jnp.asarray(params, jnp.float32)
    box32 = jnp.asarray(box, jnp.float32)
    n = conf.shape[0]
    mp = dk.suggest_max_pairs(conf, box, CUTOFF, triangular=triangular, sort=sort)
    po, rs, rc, ci, cq, ov = dk.build_dotscan_tiles(
        conf32, params32, box32, CUTOFF, max_pairs=mp, triangular=triangular, sort=sort
    )
    assert int(ov) == 0
    n_pad = po.shape[0]
    inv = jnp.zeros(n, jnp.int32).at[po[:n]].set(jnp.arange(n, dtype=jnp.int32))
    box_diag = jnp.diagonal(box32)
    wrapped = conf32[:, :3] - box_diag * jnp.floor(conf32[:, :3] / box_diag)
    xyzN = wrapped[po]
    valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
    pr = params32[po]
    prowsT = jnp.stack([pr[:, 3], pr[:, 0] * valid, pr[:, 1], 2.0 * pr[:, 2] * valid], 1)
    z1 = jnp.zeros((1, n_pad), jnp.float32)
    atoms8 = jnp.concatenate([xyzN.T, prowsT.T, z1], 0)
    atomsT = jnp.concatenate([xyzN, prowsT, z1.T], 1)
    h, p = es_energy_force_series(BETA, CUTOFF)
    out = dk.dotscan_sweep(
        atoms8, atomsT, rs, rc, ci, cq, dk._scalars(box32, CUTOFF), n_pad // 32, mp, h, p,
        compute_u=True, interpret=True, triangular=triangular,
    )
    return float(jnp.sum(out[:, 0])), -np.asarray(out[inv, 1:4])


@pytest.mark.parametrize("triangular", [True, False])
def test_dotscan_matches_rowscan(triangular):
    n = 18**3  # box 5.58 nm: row half-extents + cutoff clear box/2
    conf, params, box = lattice_fluid(n, 18, 0.05, seed=0, spacing=0.31)
    assert dk.dotscan_valid(conf, box, CUTOFF, sort="hilbert")

    mp = suggest_max_pairs(conf, box, CUTOFF, triangular=True)
    u_ref, f_ref = make_nonbonded_rowscan_energy_force(BETA, CUTOFF, mp, interpret=True, triangular=True)(
        conf, params, box
    )
    u_d, f_d = run_dotscan(conf, params, box, triangular)

    # dot-identity r^2 carries ~1e-6 absolute f32 cancellation error around
    # the row-center frame; energies/forces agree to ~1e-5 relative
    assert u_d == pytest.approx(float(u_ref), rel=2e-5)
    err = np.abs(f_d - np.asarray(f_ref)).max()
    assert err / np.abs(np.asarray(f_ref)).max() < 5e-5


def test_dotscan_4d_lifted_w():
    # decoupled atoms riding the w dimension (alchemical end states) must
    # contribute through the dot-form distances identically
    n = 18**3
    conf, params, box = lattice_fluid(n, 18, 0.04, seed=1, spacing=0.31)
    rng = np.random.default_rng(7)
    params = params.copy()
    params[:, 3] = rng.uniform(0.0, 0.6, n) * (rng.random(n) < 0.1)

    mp = suggest_max_pairs(conf, box, CUTOFF, triangular=True)
    u_ref, f_ref = make_nonbonded_rowscan_energy_force(BETA, CUTOFF, mp, interpret=True, triangular=True)(
        conf, params, box
    )
    u_d, f_d = run_dotscan(conf, params, box, triangular=True)
    assert u_d == pytest.approx(float(u_ref), rel=2e-5)
    err = np.abs(f_d - np.asarray(f_ref)).max()
    assert err / np.abs(np.asarray(f_ref)).max() < 5e-5


def test_dotscan_md_provider_matches_rowscan_provider():
    n = 18**3
    conf, params, box = lattice_fluid(n, 18, 0.05, seed=3, spacing=0.31)
    assert dk.dotscan_valid(conf, box, CUTOFF + 0.1, sort="hilbert")
    mp_r = suggest_max_pairs(conf, box, CUTOFF + 0.1, margin=1.4, triangular=True)
    mp_d = dk.suggest_max_pairs(conf, box, CUTOFF + 0.1, margin=1.4, triangular=True, sort="hilbert")

    init_r, apply_r, energy_r, _, ewp_r, *_ = make_nonbonded_rowscan_md(
        BETA, CUTOFF, mp_r, skin=0.1, interpret=True, triangular=True
    )
    init_d, apply_d, energy_d, _, ewp_d, *_ = dk.make_nonbonded_dotscan_md(
        BETA, CUTOFF, mp_d, skin=0.1, interpret=True, triangular=True, sort="hilbert"
    )
    sr = init_r(conf, params, box)
    sd = init_d(conf, params, box)
    _, f_r, sr = apply_r(sr, conf, params, box, 1)
    _, f_d, sd = apply_d(sd, conf, params, box, 1)
    scale = np.abs(np.asarray(f_r)).max()
    # the MD force path uses the dot-identity r^2 (~1e-6 absolute error),
    # which clash-regime pairs (r << sigma, present in this unminimized
    # lattice) amplify to ~1e-4 relative force error — acceptable Langevin
    # noise; equilibrated geometries sit near ~1e-5
    assert np.abs(np.asarray(f_d) - np.asarray(f_r)).max() / scale < 3e-4

    u_r = float(energy_r(sr, conf, params, box))
    u_d = float(energy_d(sd, conf, params, box))
    assert u_d == pytest.approx(u_r, rel=2e-5)

    # tile-reusing energy under different params (HREX U_kl path)
    p2 = params.copy()
    p2[:, 0] *= 0.8
    assert float(ewp_d(sd, conf, p2, box)) == pytest.approx(float(ewp_r(sr, conf, p2, box)), rel=2e-5)


def test_dotscan_direct_diff_variant_matches():
    """dot_r2=False (direct-difference distances + matmul force
    accumulation) is the probe variant separating the two MXU tricks; it
    must agree with rowscan tightly (exact subtraction)."""
    n = 18**3
    conf, params, box = lattice_fluid(n, 18, 0.05, seed=4, spacing=0.31)
    mp_d = dk.suggest_max_pairs(conf, box, CUTOFF + 0.1, margin=1.4, triangular=True, sort="hilbert")
    mp_r = suggest_max_pairs(conf, box, CUTOFF + 0.1, margin=1.4, triangular=True)
    init_r, apply_r, *_ = make_nonbonded_rowscan_md(BETA, CUTOFF, mp_r, skin=0.1, interpret=True, triangular=True)
    init_d, apply_d, *_ = dk.make_nonbonded_dotscan_md(
        BETA, CUTOFF, mp_d, skin=0.1, interpret=True, triangular=True, dot_r2=False, sort="hilbert"
    )
    sr = init_r(conf, params, box)
    sd = init_d(conf, params, box)
    _, f_r, _ = apply_r(sr, conf, params, box, 1)
    _, f_d, _ = apply_d(sd, conf, params, box, 1)
    scale = np.abs(np.asarray(f_r)).max()
    assert np.abs(np.asarray(f_d) - np.asarray(f_r)).max() / scale < 2e-6


def test_dotscan_valid_rejects_small_box():
    n = 10**3
    conf, params, box = lattice_fluid(n, 10, 0.03, seed=5, spacing=0.31)
    # box edge 3.1 nm: row extents + cutoff exceed box/2 — must fail loudly
    assert not dk.dotscan_valid(conf, box, CUTOFF)


def test_dot_configure_gate_and_provider():
    from timemachine_tpu.potentials import NonbondedAllPairs

    # too-small box: gated fallback to rowscan
    conf_s, _, box_s = lattice_fluid(1100, 11, 0.04, seed=1)
    pot = NonbondedAllPairs(1100, beta=BETA, cutoff=CUTOFF)
    pot.configure_pallas(box_s, conf_s, interpret=True, kernel="dot")
    assert pot.pallas_kernel == "rowscan"

    # valid box: the dotscan MD provider is wired and produces forces that
    # agree with the rowscan energy path's analytic gradient
    n = 20**3  # box 6.2 nm — the production water-box scale
    conf, params, box = lattice_fluid(n, 20, 0.05, seed=2, spacing=0.31)
    pot = NonbondedAllPairs(n, beta=BETA, cutoff=CUTOFF)
    pot.configure_pallas(box, conf, interpret=True, kernel="dot")
    assert pot.pallas_kernel == "dot"
    init_fn, apply_fn = pot._pallas_md[0], pot._pallas_md[1]
    state = init_fn(conf, params, box)
    _, f_d, _ = apply_fn(state, conf, params, box, 1)
    _, f_r = pot._pallas_energy_force(conf, params, box)  # (u, force)
    f_r = np.asarray(f_r)
    scale = np.abs(f_r).max()
    assert np.abs(np.asarray(f_d) - np.asarray(f_r)).max() / scale < 3e-4


def test_dotscan_force_mode_nontriangular_no_self_pair_nan():
    """Force mode (compute_u=False) with dot_r2=True — the default public
    dotscan_sweep combination — must gate out self-pairs despite the ~1e-6
    dot-identity r^2 cancellation error (regression: self-pairs leaked
    through the 1e-7 gate and produced NaN/inf forces)."""
    n = 18**3
    conf, params, box = lattice_fluid(n, 18, 0.05, seed=6, spacing=0.31)
    conf32 = jnp.asarray(conf, jnp.float32)
    params32 = jnp.asarray(params, jnp.float32)
    box32 = jnp.asarray(box, jnp.float32)
    mp = dk.suggest_max_pairs(conf, box, CUTOFF, triangular=False, sort="hilbert")
    po, rs, rc, ci, cq, ov = dk.build_dotscan_tiles(
        conf32, params32, box32, CUTOFF, max_pairs=mp, triangular=False, sort="hilbert"
    )
    assert int(ov) == 0
    n_pad = po.shape[0]
    inv = jnp.zeros(n, jnp.int32).at[po[:n]].set(jnp.arange(n, dtype=jnp.int32))
    box_diag = jnp.diagonal(box32)
    wrapped = conf32[:, :3] - box_diag * jnp.floor(conf32[:, :3] / box_diag)
    xyzN = wrapped[po]
    valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
    pr = params32[po]
    prowsT = jnp.stack([pr[:, 3], pr[:, 0] * valid, pr[:, 1], 2.0 * pr[:, 2] * valid], 1)
    z1 = jnp.zeros((1, n_pad), jnp.float32)
    atoms8 = jnp.concatenate([xyzN.T, prowsT.T, z1], 0)
    atomsT = jnp.concatenate([xyzN, prowsT, z1.T], 1)
    h, p = es_energy_force_series(BETA, CUTOFF)
    out = dk.dotscan_sweep(
        atoms8, atomsT, rs, rc, ci, cq, dk._scalars(box32, CUTOFF), n_pad // 32, mp, h, p,
        compute_u=False, interpret=True, triangular=False, dot_r2=True,
    )
    f_d = -np.asarray(out[inv, 1:4])
    assert np.all(np.isfinite(f_d))

    mp_r = suggest_max_pairs(conf, box, CUTOFF, triangular=True)
    _, f_ref = make_nonbonded_rowscan_energy_force(BETA, CUTOFF, mp_r, interpret=True, triangular=True)(
        conf, params, box
    )
    scale = np.abs(np.asarray(f_ref)).max()
    assert np.abs(f_d - np.asarray(f_ref)).max() / scale < 3e-4


def test_dotscan_provider_poisons_forces_on_invalid_tiles():
    """Tile overflow or an image-bound violation at rebuild time must fail
    loudly (NaN forces -> Context guard), never silently drop interactions."""
    n = 18**3
    conf, params, box = lattice_fluid(n, 18, 0.05, seed=7, spacing=0.31)

    # overflow: deliberately undersized max_pairs
    init_fn, apply_fn, energy_fn, *_ = dk.make_nonbonded_dotscan_md(
        BETA, CUTOFF, max_pairs=8, skin=0.1, interpret=True, triangular=True, sort="hilbert"
    )
    state = init_fn(conf, params, box)
    assert int(state[-4]) > 0  # invalid flag (tiles tuple's last element)
    _, force, _ = apply_fn(state, conf, params, box, 1)  # t=1: no rebuild
    assert np.all(np.isnan(np.asarray(force)))
    assert np.isnan(float(energy_fn(state, conf, params, box)))

    # image-bound violation: rebuild (t=0) against a box shrunk below the
    # row-extent + cutoff soundness bound
    mp = dk.suggest_max_pairs(conf, box, CUTOFF + 0.1, margin=1.4, triangular=True, sort="hilbert")
    init_fn, apply_fn, *_ = dk.make_nonbonded_dotscan_md(
        BETA, CUTOFF, max_pairs=mp, skin=0.1, interpret=True, triangular=True, sort="hilbert"
    )
    state = init_fn(conf, params, box)
    assert int(state[-4]) == 0
    small = 0.45 * box
    _, force, _ = apply_fn(state, conf * 0.45, params, small, 0)
    assert np.all(np.isnan(np.asarray(force)))


def test_dotscan_periodic_centers_handle_boundary_straddle():
    """Chunks straddling the box boundary (any equilibrated fluid) must not
    break the image mapping: periodic (largest-gap) centers + the kernel's
    row-side rounding keep parity with rowscan on a lattice shifted by half
    a box (regression: naive min/max centers read extent ~ box and the old
    configure gate silently fell back to rowscan on ALL production
    systems)."""
    n = 18**3
    conf, params, box = lattice_fluid(n, 18, 0.05, seed=8, spacing=0.31)
    conf = conf + 0.5 * np.diagonal(box)  # straddle every boundary
    assert dk.dotscan_valid(conf, box, CUTOFF, sort="hilbert")

    mp = suggest_max_pairs(conf, box, CUTOFF, triangular=True)
    u_ref, f_ref = make_nonbonded_rowscan_energy_force(BETA, CUTOFF, mp, interpret=True, triangular=True)(
        conf, params, box
    )
    u_d, f_d = run_dotscan(conf, params, box, triangular=True, sort="hilbert")
    assert u_d == pytest.approx(float(u_ref), rel=2e-5)
    assert np.abs(f_d - np.asarray(f_ref)).max() / np.abs(np.asarray(f_ref)).max() < 5e-5


def test_dotscan_snake_sort_at_production_density():
    """At water-like density the snake sort's row chunks satisfy the image
    bound (and its tile census is 12-17% tighter than Hilbert's —
    ARCHITECTURE.md); parity vs rowscan under sort='snake'."""
    n = 22**3
    conf, params, box = lattice_fluid(n, 22, 0.04, seed=9, spacing=0.215)
    assert dk.dotscan_valid(conf, box, CUTOFF, sort="snake")

    mp = suggest_max_pairs(conf, box, CUTOFF, triangular=True)
    u_ref, f_ref = make_nonbonded_rowscan_energy_force(BETA, CUTOFF, mp, interpret=True, triangular=True)(
        conf, params, box
    )
    u_d, f_d = run_dotscan(conf, params, box, triangular=True, sort="snake")
    assert u_d == pytest.approx(float(u_ref), rel=2e-5)
    assert np.abs(f_d - np.asarray(f_ref)).max() / np.abs(np.asarray(f_ref)).max() < 5e-5


def test_dot_configure_gate_prefers_snake_at_density():
    from timemachine_tpu.potentials import NonbondedAllPairs

    n = 22**3
    conf, _, box = lattice_fluid(n, 22, 0.04, seed=10, spacing=0.215)
    pot = NonbondedAllPairs(n, beta=BETA, cutoff=CUTOFF)
    pot.configure_pallas(box, conf, interpret=True, kernel="dot")
    assert pot.pallas_kernel == "dot"
