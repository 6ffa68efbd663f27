"""Quadscan kernel (v4) parity vs the rowscan production kernel, interpret
mode on CPU. Covers the packed-quarter loads, per-entry image shifts, and
the peeled Newton gate (ops/pallas/quadscan_kernel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops.pallas import quadscan_kernel as qk
from timemachine_tpu.ops.pallas.rowscan_kernel import (
    make_nonbonded_rowscan_energy_force,
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


def run_quadscan(conf, params, box, sort, **sweep_kwargs):
    conf32 = jnp.asarray(conf, jnp.float32)
    params32 = jnp.asarray(params, jnp.float32)
    box32 = jnp.asarray(box, jnp.float32)
    n = conf.shape[0]
    mt = qk.suggest_max_tiles(conf, box, CUTOFF, sort=sort)
    po, rs, rc, en, ov = qk.build_quadscan_tiles(conf32, params32, box32, CUTOFF, max_tiles=mt, sort=sort)
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
    h, p = qk.es_energy_force_series(BETA, CUTOFF)
    out = qk.quadscan_sweep(
        atoms8, atomsT, rs, rc, en, qk._scalars(box32, CUTOFF), n_pad // 32, h, p,
        compute_u=True, interpret=True, **sweep_kwargs,
    )
    return float(jnp.sum(out[:, 0])), -np.asarray(out[inv, 1:4])


def test_quadscan_matches_rowscan():
    # water-like density: Hilbert 32-atom chunks are compact enough for the
    # constant-shift invariant (snake's row-spanning chunks never are, so
    # snake is an experiment-only sort for this kernel)
    sort = "hilbert"
    n = 24**3  # full lattice at water-like density, box 5.16 nm
    conf, params, box = lattice_fluid(n, 24, 0.05, seed=0, spacing=0.215)
    assert qk.constant_shift_valid(conf, box, CUTOFF, sort=sort)

    mp = suggest_max_pairs(conf, box, CUTOFF, triangular=True)
    u_ref, f_ref = make_nonbonded_rowscan_energy_force(BETA, CUTOFF, mp, interpret=True, triangular=True)(
        conf, params, box
    )
    u_q, f_q = run_quadscan(conf, params, box, sort)

    assert u_q == pytest.approx(float(u_ref), rel=2e-4)
    err = np.abs(f_q - np.asarray(f_ref)).max()
    assert err / np.abs(np.asarray(f_ref)).max() < 5e-5

    # the wrap-math variant (per-pair minimum image instead of per-entry
    # shifts) must agree bitwise-closely with the shifted variant
    u_w, f_w = run_quadscan(conf, params, box, sort, use_shifts=False)
    assert u_w == pytest.approx(u_q, rel=1e-5)
    # f32: the wrap's round-trip and the shift-add differ by final-ULP dx
    np.testing.assert_allclose(f_w, f_q, rtol=2e-4, atol=0.2)


def test_constant_shift_validity_gate():
    conf, params, box = lattice_fluid(1100, 11, 0.04, seed=0)  # 3.4 nm box: too small
    assert not qk.constant_shift_valid(conf, box, CUTOFF)


def test_quad_configure_falls_back_on_small_box():
    from timemachine_tpu.potentials import NonbondedAllPairs

    conf, params, box = lattice_fluid(1100, 11, 0.04, seed=1)
    pot = NonbondedAllPairs(1100, beta=BETA, cutoff=CUTOFF)
    pot.configure_pallas(box, conf, interpret=True, kernel="quad")
    assert pot.pallas_kernel == "rowscan"  # gated fallback
