"""Pallas fused nonbonded tile kernel vs the dense all-pairs oracle.

Runs the kernel in interpret mode on CPU (the same code path Mosaic compiles
on TPU). Parity target: the reference's tiled CUDA nonbonded
(`timemachine/cpp/src/nonbonded_all_pairs.cu`) validated against
`timemachine/potentials/nonbonded.py:nonbonded` in its tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.ops.nonbonded import nonbonded_all_pairs_dense as _dense
from timemachine_tpu.ops.pallas.nonbonded_kernel import (
    make_nonbonded_pallas,
    make_nonbonded_pallas_energy_force,
    suggest_max_tiles,
)

BETA = 2.0
CUTOFF = 1.2


def nonbonded_all_pairs_dense(conf, params, box, beta, cutoff):
    n = conf.shape[0]
    ones = jnp.ones((n, n))
    return _dense(conf, params, box, ones, ones, beta=beta, cutoff=cutoff)


def make_waterish_system(n_atoms: int, box_width: float, seed: int):
    """Random dense fluid with water-like parameter magnitudes."""
    rng = np.random.default_rng(seed)
    conf = rng.uniform(0.0, box_width, size=(n_atoms, 3))
    box = np.eye(3) * box_width
    charges = rng.uniform(-0.8, 0.8, size=n_atoms) * np.sqrt(138.935456)
    sigmas = rng.uniform(0.05, 0.16, size=n_atoms)  # sigma/2
    epsilons = rng.uniform(0.05, 0.9, size=n_atoms) ** 0.5  # sqrt(eps)
    w = np.zeros(n_atoms)
    params = np.stack([charges, sigmas, epsilons, w], axis=1)
    return conf.astype(np.float64), params.astype(np.float64), box


@pytest.mark.parametrize("n_atoms,seed", [(96, 0), (400, 1), (777, 2)])
def test_pallas_energy_matches_dense(n_atoms, seed):
    conf, params, box = make_waterish_system(n_atoms, 3.2, seed)
    u_ref = float(nonbonded_all_pairs_dense(conf, params, box, beta=BETA, cutoff=CUTOFF))

    max_tiles = suggest_max_tiles(conf, box, CUTOFF)
    u_fn = make_nonbonded_pallas(BETA, CUTOFF, max_tiles, interpret=True)
    u = float(u_fn(jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32)))

    # f32 kernel vs f64 oracle: relative agreement bounded by f32 accumulation
    assert u == pytest.approx(u_ref, rel=2e-4), (u, u_ref)


def test_pallas_force_matches_dense_grad():
    conf, params, box = make_waterish_system(300, 3.0, seed=3)

    du_dx_ref = np.asarray(
        jax.grad(lambda x: nonbonded_all_pairs_dense(x, params, box, beta=BETA, cutoff=CUTOFF))(conf)
    )

    max_tiles = suggest_max_tiles(conf, box, CUTOFF)
    uf_fn = make_nonbonded_pallas_energy_force(BETA, CUTOFF, max_tiles, interpret=True)
    u, force = uf_fn(jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32))
    du_dx = -np.asarray(force)

    scale = np.abs(du_dx_ref).max()
    np.testing.assert_allclose(du_dx, du_dx_ref, atol=2e-4 * scale)


def test_pallas_custom_vjp_grad():
    """grad through the custom_vjp energy must equal the stashed force."""
    conf, params, box = make_waterish_system(200, 2.8, seed=4)
    max_tiles = suggest_max_tiles(conf, box, CUTOFF)
    u_fn = make_nonbonded_pallas(BETA, CUTOFF, max_tiles, interpret=True)

    confj = jnp.asarray(conf, jnp.float32)
    paramsj = jnp.asarray(params, jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)

    du_dx = np.asarray(jax.grad(u_fn)(confj, paramsj, boxj))
    du_dx_ref = np.asarray(
        jax.grad(lambda x: nonbonded_all_pairs_dense(x, params, box, beta=BETA, cutoff=CUTOFF))(conf)
    )
    scale = np.abs(du_dx_ref).max()
    np.testing.assert_allclose(du_dx, du_dx_ref, atol=2e-4 * scale)


def test_pallas_du_dp():
    """Parameter derivatives (forcefield-fitting path) vs dense autodiff."""
    conf, params, box = make_waterish_system(150, 2.6, seed=5)
    max_tiles = suggest_max_tiles(conf, box, CUTOFF)
    u_fn = make_nonbonded_pallas(BETA, CUTOFF, max_tiles, interpret=True)

    du_dp = np.asarray(
        jax.grad(u_fn, argnums=1)(
            jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32)
        )
    )
    du_dp_ref = np.asarray(
        jax.grad(lambda p: nonbonded_all_pairs_dense(conf, p, box, beta=BETA, cutoff=CUTOFF))(params)
    )
    scale = np.abs(du_dp_ref).max()
    np.testing.assert_allclose(du_dp, du_dp_ref, atol=3e-4 * scale)


def test_pallas_potential_wiring():
    """NonbondedAllPairs.configure_pallas + energy_force_fn agree with the
    dense impl through the descriptor layer."""
    from timemachine_tpu.potentials import NonbondedAllPairs

    conf, params, box = make_waterish_system(256, 2.9, seed=6)
    pot_dense = NonbondedAllPairs(num_atoms=256, beta=BETA, cutoff=CUTOFF)
    u_ref = float(pot_dense(conf, params, box))

    pot = NonbondedAllPairs(num_atoms=256, beta=BETA, cutoff=CUTOFF)
    pot.configure_pallas(box, conf, interpret=True)
    u = float(pot(jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32)))
    assert u == pytest.approx(u_ref, rel=2e-4)

    uf = pot.energy_force_fn()
    u2, f = uf(jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32))
    assert float(u2) == pytest.approx(u_ref, rel=2e-4)
    du_dx_ref = np.asarray(jax.grad(lambda x: pot_dense(x, params, box))(conf))
    scale = np.abs(du_dx_ref).max()
    np.testing.assert_allclose(-np.asarray(f), du_dx_ref, atol=2e-4 * scale)


def test_pallas_lifted_w_coordinates():
    """4D-decoupled atoms (w > 0) handled identically to the dense path."""
    conf, params, box = make_waterish_system(128, 2.5, seed=7)
    params[::5, 3] = 0.4  # lift some atoms into the 4th dimension
    params[::7, 3] = 1.2  # fully decoupled (w = cutoff)

    u_ref = float(nonbonded_all_pairs_dense(conf, params, box, beta=BETA, cutoff=CUTOFF))
    max_tiles = suggest_max_tiles(conf, box, CUTOFF)
    u_fn = make_nonbonded_pallas(BETA, CUTOFF, max_tiles, interpret=True)
    u = float(u_fn(jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32)))
    assert u == pytest.approx(u_ref, rel=3e-4)


def test_pallas_atom_subset():
    """Static atom subsets (host-only all-pairs in host-guest systems,
    ref nonbonded_all_pairs.hpp:27) via invalid rows/cols."""
    from timemachine_tpu.potentials import NonbondedAllPairs

    conf, params, box = make_waterish_system(200, 2.8, seed=11)
    subset = np.sort(np.random.default_rng(3).choice(200, size=150, replace=False)).astype(np.int32)

    pot_ref = NonbondedAllPairs(num_atoms=200, beta=BETA, cutoff=CUTOFF, atom_idxs=subset)
    u_ref = float(pot_ref(conf, params, box))
    du_dx_ref = np.asarray(jax.grad(lambda x: pot_ref(x, params, box))(conf))

    pot = NonbondedAllPairs(num_atoms=200, beta=BETA, cutoff=CUTOFF, atom_idxs=subset)
    pot.configure_pallas(box, conf, interpret=True)
    u = float(pot(jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32)))
    assert u == pytest.approx(u_ref, rel=2e-4)

    uf = pot.energy_force_fn()
    _, f = uf(jnp.asarray(conf, jnp.float32), jnp.asarray(params, jnp.float32), jnp.asarray(box, jnp.float32))
    scale = np.abs(du_dx_ref).max()
    np.testing.assert_allclose(-np.asarray(f), du_dx_ref, atol=2e-4 * scale)
    # excluded atoms feel zero force
    excluded = np.setdiff1d(np.arange(200), subset)
    np.testing.assert_array_equal(np.asarray(f)[excluded], 0.0)
