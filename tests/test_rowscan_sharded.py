"""Spatial decomposition of the rowscan nonbonded sweep over a device mesh.

Correctness: the sharded sweep (row chunks partitioned over 8 virtual CPU
devices, column reaction forces psum-reduced) must reproduce the
single-device sweep's energies and forces on the same tile lists — this is
the multi-chip scaling path past the single-chip VPU ceiling
(ARCHITECTURE.md round-1 priorities #3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops.pallas.rowscan_kernel import (
    COL,
    ROW,
    _assemble,
    _scalars,
    build_rowscan_tiles,
    es_energy_force_series,
    rowscan_sweep,
    rowscan_sweep_sharded,
    suggest_max_pairs,
)

BETA = 2.0
CUTOFF = 1.2


def waterish(n_atoms, box_width, seed):
    rng = np.random.default_rng(seed)
    conf = rng.uniform(0.0, box_width, size=(n_atoms, 3))
    charges = rng.uniform(-0.8, 0.8, size=n_atoms) * np.sqrt(138.935456)
    sigmas = rng.uniform(0.05, 0.16, size=n_atoms)
    epsilons = rng.uniform(0.05, 0.9, size=n_atoms) ** 0.5
    params = np.stack([charges, sigmas, epsilons, np.zeros(n_atoms)], axis=1)
    return conf, params, np.eye(3) * box_width


@pytest.mark.parametrize("triangular", [False, True])
def test_sharded_sweep_matches_single_device(triangular):
    n_atoms = 1100  # Npad = 1280 -> 40 row chunks, divisible over 8 devices
    conf, params, box = waterish(n_atoms, 3.2, seed=0)
    conf = jnp.asarray(conf, jnp.float32)
    params = jnp.asarray(params, jnp.float32)
    box = jnp.asarray(box, jnp.float32)

    mp = suggest_max_pairs(np.asarray(conf), np.asarray(box), CUTOFF, triangular=triangular)
    pad_order, row_start, row_count, col_ids, overflow = build_rowscan_tiles(
        conf, params, box, CUTOFF, max_pairs=mp, triangular=triangular
    )
    assert int(overflow) == 0
    atoms8 = _assemble(conf, params, box, pad_order, n_atoms)
    n_pad = atoms8.shape[1]
    n_rows = n_pad // ROW
    assert n_rows % 8 == 0
    h_coeffs, p_coeffs = es_energy_force_series(BETA, CUTOFF)
    scal = _scalars(box, CUTOFF)

    single = rowscan_sweep(
        atoms8,
        atoms8.T,
        row_start,
        row_count,
        col_ids,
        scal,
        n_rows=n_rows,
        max_pairs=mp,
        h_coeffs=h_coeffs,
        p_coeffs=p_coeffs,
        compute_u=True,
        interpret=True,
        triangular=triangular,
    )

    from timemachine_tpu.parallel.replica_exchange import make_replica_mesh

    mesh = make_replica_mesh(jax.devices()[:8], axis_name="rows")
    sharded = rowscan_sweep_sharded(
        atoms8,
        atoms8.T,
        row_start,
        row_count,
        col_ids,
        scal,
        n_rows=n_rows,
        h_coeffs=h_coeffs,
        p_coeffs=p_coeffs,
        mesh=mesh,
        axis_name="rows",
        compute_u=True,
        interpret=True,
        triangular=triangular,
    )

    u_single = float(jnp.sum(single[:, 0]))
    u_sharded = float(jnp.sum(sharded[:, 0]))
    assert u_single == pytest.approx(u_sharded, rel=1e-6)
    np.testing.assert_allclose(np.asarray(sharded[:, 1:4]), np.asarray(single[:, 1:4]), rtol=2e-5, atol=2e-4)
    # real interactions present
    assert np.abs(np.asarray(single[:, 1:4])).max() > 1.0
