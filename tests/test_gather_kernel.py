"""Gather-compacted Pallas nonbonded kernel (v3) vs the dense all-pairs oracle.

Runs in interpret mode on CPU (the code path Mosaic compiles on TPU).
Parity target: reference tiled CUDA nonbonded (nonbonded_all_pairs.cu)
validated against timemachine/potentials/nonbonded.py in its tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops.nonbonded import nonbonded_on_specific_pairs
from timemachine_tpu.ops.pallas.gather_kernel import (
    make_nonbonded_gather_energy_force,
    make_nonbonded_gather_md,
    suggest_max_nbrs,
)
from timemachine_tpu.ops.pallas.rowscan_kernel import es_energy_force_series

BETA = 2.0
CUTOFF = 1.2


def dense_poly_u(conf, params, box, mask=None):
    """All-pairs oracle with the SAME Chebyshev electrostatics the kernel uses
    (isolates tiling/compaction errors from the polynomial-fit error)."""
    h_coeffs, _ = es_energy_force_series(BETA, CUTOFF)
    n = conf.shape[0]
    iu = np.triu_indices(n, k=1)
    pairs = np.stack([iu[0], iu[1]], axis=1)
    if mask is not None:
        keep = (mask[pairs[:, 0]] > 0) & (mask[pairs[:, 1]] > 0)
        pairs = pairs[keep]
    vdW, es = nonbonded_on_specific_pairs(
        conf, params, box, jnp.asarray(pairs), BETA, cutoff=CUTOFF, es_poly_coeffs=h_coeffs
    )
    return jnp.sum(vdW) + jnp.sum(es)


def make_waterish_system(n_atoms: int, box_width: float, seed: int):
    """Jittered-lattice fluid: water-like density without sub-0.1 nm clashes
    (uniform-random points can land at ~0.04 nm, where f32 force accumulation
    loses ~1% to cancellation and the f64-oracle comparison turns meaningless)."""
    rng = np.random.default_rng(seed)
    m = int(np.ceil(n_atoms ** (1 / 3)))
    spacing = box_width / m
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), axis=-1).reshape(-1, 3)
    grid = grid[rng.permutation(len(grid))[:n_atoms]]
    conf = (grid + 0.5) * spacing + rng.uniform(-0.3, 0.3, size=(n_atoms, 3)) * spacing
    box = np.eye(3) * box_width
    charges = rng.uniform(-0.8, 0.8, size=n_atoms) * np.sqrt(138.935456)
    sigmas = rng.uniform(0.05, 0.16, size=n_atoms)  # sigma/2
    epsilons = rng.uniform(0.05, 0.9, size=n_atoms) ** 0.5  # sqrt(eps)
    w = np.zeros(n_atoms)
    params = np.stack([charges, sigmas, epsilons, w], axis=1)
    return conf.astype(np.float64), params.astype(np.float64), box


# n_atoms=96: multiple of 32 exercises the no-real-atom-in-pad-slot guarantee
@pytest.mark.parametrize("n_atoms,seed", [(96, 0), (400, 1), (777, 2)])
def test_gather_energy_force_matches_dense(n_atoms, seed):
    conf, params, box = make_waterish_system(n_atoms, 3.2, seed)
    u_ref = float(dense_poly_u(conf, params, box))
    f_ref = np.asarray(-jax.grad(lambda x: dense_poly_u(x, jnp.asarray(params), jnp.asarray(box)))(jnp.asarray(conf)))

    max_nbrs = suggest_max_nbrs(conf, box, CUTOFF)
    ef = make_nonbonded_gather_energy_force(BETA, CUTOFF, max_nbrs, interpret=True)
    u, f = ef(conf, params, box)

    assert float(u) == pytest.approx(u_ref, rel=2e-4), (float(u), u_ref)
    scale = np.maximum(np.abs(f_ref), 1.0)
    np.testing.assert_allclose(np.asarray(f) / scale, f_ref / scale, atol=2e-3)


def test_gather_lifted_w_coordinates():
    """4D-decoupled atoms must see the lifted distance (alchemical parity)."""
    conf, params, box = make_waterish_system(200, 3.0, seed=7)
    params[:30, 3] = np.linspace(0.0, CUTOFF, 30)  # push w toward decoupling

    u_ref = float(dense_poly_u(conf, params, box))
    max_nbrs = suggest_max_nbrs(conf, box, CUTOFF)
    ef = make_nonbonded_gather_energy_force(BETA, CUTOFF, max_nbrs, interpret=True)
    u, _ = ef(conf, params, box)
    assert float(u) == pytest.approx(u_ref, rel=2e-4)


def test_gather_md_provider_skin_rebuild():
    """Provider forces stay exact between rebuilds while atoms drift < skin/2."""
    conf, params, box = make_waterish_system(300, 3.0, seed=4)
    max_nbrs = suggest_max_nbrs(conf, box, CUTOFF + 0.1, margin=1.5)
    init_fn, apply_fn = make_nonbonded_gather_md(BETA, CUTOFF, max_nbrs, skin=0.1, rebuild_interval=5, interpret=True)

    state = init_fn(jnp.asarray(conf), jnp.asarray(params), jnp.asarray(box))
    rng = np.random.default_rng(0)
    x = jnp.asarray(conf)
    for t in range(7):
        _, force, state = apply_fn(state, x, jnp.asarray(params), jnp.asarray(box), jnp.asarray(t))
        f_ref = np.asarray(
            -jax.grad(lambda c: dense_poly_u(c, jnp.asarray(params), jnp.asarray(box)))(x.astype(jnp.float64))
        )
        scale = np.maximum(np.abs(f_ref), 1.0)
        np.testing.assert_allclose(np.asarray(force) / scale, f_ref / scale, atol=2e-3, err_msg=f"step {t}")
        x = x + jnp.asarray(rng.normal(0, 0.004, size=x.shape))  # < skin/2 drift per rebuild window


def test_gather_atom_subset():
    """atom_mask excludes masked atoms from all interactions (local MD path)."""
    conf, params, box = make_waterish_system(256, 3.0, seed=9)
    mask = np.ones(256)
    mask[50:90] = 0.0

    u_ref = float(dense_poly_u(jnp.asarray(conf), jnp.asarray(params), jnp.asarray(box), mask=mask))

    max_nbrs = suggest_max_nbrs(conf, box, CUTOFF, atom_mask=mask)
    ef = make_nonbonded_gather_energy_force(BETA, CUTOFF, max_nbrs, interpret=True, atom_mask=mask)
    u, f = ef(conf, params, box)
    assert float(u) == pytest.approx(u_ref, rel=2e-4)
    np.testing.assert_allclose(np.asarray(f)[50:90], 0.0, atol=1e-6)
