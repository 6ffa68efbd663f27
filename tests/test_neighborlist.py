"""Cell-list O(N) nonbonded consistency vs the dense O(N^2) path (the
framework's analog of the reference's tests/test_nblist.py +
test_nonbonded_all_pairs.py consistency matrix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops.neighborlist import (
    build_cell_list,
    choose_capacity,
    choose_grid,
    nonbonded_cell_list_energy,
)
from timemachine_tpu.ops.nonbonded import nonbonded_all_pairs_dense
from timemachine_tpu.potentials import Nonbonded, NonbondedAllPairs

BETA, CUTOFF = 2.0, 1.2


def _random_box_system(rng, n, box_width):
    conf = rng.uniform(0, box_width, (n, 3))
    params = np.column_stack(
        [rng.normal(0, 1.0, n), rng.uniform(0.05, 0.2, n), rng.uniform(0.1, 0.4, n), np.zeros(n)]
    )
    box = np.eye(3) * box_width
    return jnp.asarray(conf), jnp.asarray(params), jnp.asarray(box)


def test_build_cell_list(rng):
    conf, _, box = _random_box_system(rng, 200, 4.8)
    grid = choose_grid(np.diagonal(box), CUTOFF)
    cap = choose_capacity(200, grid)
    table, cell_of_atom, overflow = build_cell_list(conf, box, grid, cap)
    assert int(overflow) == 0
    # every atom appears exactly once
    entries = np.asarray(table).reshape(-1)
    real = entries[entries < 200]
    assert sorted(real.tolist()) == list(range(200))


@pytest.mark.parametrize("n,box_width", [(64, 3.0), (300, 4.0), (512, 5.1)])
def test_cell_list_matches_dense(rng, n, box_width):
    conf, params, box = _random_box_system(rng, n, box_width)
    grid = choose_grid(np.diagonal(box), CUTOFF)
    cap = choose_capacity(n, grid)

    ones = np.ones((n, n))
    u_dense = nonbonded_all_pairs_dense(conf, params, box, ones, ones, BETA, CUTOFF)
    u_tiled, overflow = nonbonded_cell_list_energy(conf, params, box, grid, cap, BETA, CUTOFF)
    assert int(overflow) == 0
    np.testing.assert_allclose(float(u_tiled), float(u_dense), rtol=1e-9)

    # forces agree
    g_dense = jax.grad(lambda c: nonbonded_all_pairs_dense(c, params, box, ones, ones, BETA, CUTOFF))(conf)
    g_tiled = jax.grad(lambda c: nonbonded_cell_list_energy(c, params, box, grid, cap, BETA, CUTOFF)[0])(conf)
    np.testing.assert_allclose(np.asarray(g_tiled), np.asarray(g_dense), rtol=1e-7, atol=1e-9)

    # du/dp agrees (forcefield-training derivative)
    dp_dense = jax.grad(lambda p: nonbonded_all_pairs_dense(conf, p, box, ones, ones, BETA, CUTOFF))(params)
    dp_tiled = jax.grad(lambda p: nonbonded_cell_list_energy(conf, p, box, grid, cap, BETA, CUTOFF)[0])(params)
    np.testing.assert_allclose(np.asarray(dp_tiled), np.asarray(dp_dense), rtol=1e-7, atol=1e-9)


def test_cell_list_with_w_coords(rng):
    """4D-lifted coordinates handled identically."""
    n = 128
    conf, params, box = _random_box_system(rng, n, 4.0)
    params = params.at[: n // 4, 3].set(jnp.asarray(rng.uniform(0, 1.2, n // 4)))
    grid = choose_grid(np.diagonal(box), CUTOFF)
    cap = choose_capacity(n, grid)
    ones = np.ones((n, n))
    u_dense = nonbonded_all_pairs_dense(conf, params, box, ones, ones, BETA, CUTOFF)
    u_tiled, _ = nonbonded_cell_list_energy(conf, params, box, grid, cap, BETA, CUTOFF)
    np.testing.assert_allclose(float(u_tiled), float(u_dense), rtol=1e-9)


def test_cell_list_atom_mask(rng):
    n = 100
    conf, params, box = _random_box_system(rng, n, 4.0)
    mask = np.zeros(n)
    mask[: n // 2] = 1.0
    grid = choose_grid(np.diagonal(box), CUTOFF)
    cap = choose_capacity(n, grid)
    ones = np.ones((n, n))
    u_dense = nonbonded_all_pairs_dense(conf, params, box, ones, ones, BETA, CUTOFF, atom_mask=jnp.asarray(mask))
    u_tiled, _ = nonbonded_cell_list_energy(conf, params, box, grid, cap, BETA, CUTOFF, atom_mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(u_tiled), float(u_dense), rtol=1e-9)


def test_nonbonded_potential_tiled_impl(rng):
    """Nonbonded (AllPairs - exclusions) tiled impl == dense impl."""
    n = 90
    conf, params, box = _random_box_system(rng, n, 4.0)
    # exclusions on some close pairs
    excl = np.array([[i, i + 1] for i in range(0, 30, 3)], dtype=np.int32)
    scales = rng.uniform(0, 1, (len(excl), 2))

    dense_pot = Nonbonded(n, excl, scales, BETA, CUTOFF, impl="dense")
    tiled_pot = Nonbonded(n, excl, scales, BETA, CUTOFF, impl="tiled").configure_tiled(box)
    u_dense = dense_pot(conf, params, box)
    u_tiled = tiled_pot(conf, params, box)
    np.testing.assert_allclose(float(u_tiled), float(u_dense), rtol=1e-9)


def test_compilation_determinism(rng):
    """Regression: jax 0.9.0 XLA:CPU miscompiled vmap-of-gather formulations
    of this kernel NONDETERMINISTICALLY across compilations (answers differed
    by O(1) kJ/mol between executables of the same trace). The chunked-scan
    formulation must produce the eager answer from every fresh compilation."""
    n = 128
    conf, params, box = _random_box_system(rng, n, 4.0)
    grid = choose_grid(np.diagonal(box), CUTOFF)
    cap = choose_capacity(n, grid)
    f = nonbonded_cell_list_energy.__wrapped__
    ref = float(f(conf, params, box, grid, cap, BETA, CUTOFF, None)[0])
    for trial in range(8):
        def wrap(conf, params, box, _salt=trial):
            u, _ = f(conf, params, box, grid, cap, BETA, CUTOFF, None)
            return u + 0.0 * _salt

        v = float(jax.jit(wrap)(conf, params, box))
        np.testing.assert_allclose(v, ref, rtol=1e-12, err_msg=f"compilation {trial} diverged")


def test_cell_list_under_scan_and_npt_box(rng):
    """The tiled energy is jittable inside a scan with a traced, changing box."""
    n = 128
    conf, params, box = _random_box_system(rng, n, 4.0)
    grid = choose_grid(np.diagonal(box), CUTOFF)
    cap = choose_capacity(n, grid)

    @jax.jit
    def scan_energy2(conf, params, box):
        def body(carry, scale):
            u, _ = nonbonded_cell_list_energy(conf * scale, params, box * scale, grid, cap, BETA, CUTOFF)
            return carry + u, u

        total, us = jax.lax.scan(body, 0.0, jnp.array([1.0, 1.01, 0.99]))
        return total, us

    total, us = scan_energy2(conf, params, box)
    assert np.isfinite(float(total))
    ones = np.ones((n, n))
    u_ref = nonbonded_all_pairs_dense(conf * 1.01, params, box * 1.01, ones, ones, BETA, CUTOFF)
    # cross-formulation tolerance: at default XLA opt, fma contraction can
    # flip pairs sitting exactly at the cutoff edge between the cell-list and
    # dense evaluations; truncated (unswitched) LJ makes each flip worth
    # ~1e-3 kJ/mol. Bitwise agreement only holds within one formulation.
    np.testing.assert_allclose(float(us[1]), float(u_ref), rtol=1e-6, atol=0.1)
