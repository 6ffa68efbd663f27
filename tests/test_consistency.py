"""Consistency matrix on REAL systems at production parameter distributions
(ref pattern: tests/nonbonded/test_consistency.py, tests/test_determinism.py).

Every production evaluation path of every potential is pinned against the
f64 dense/autodiff oracle on a real solvated-DHFR crop (real protein+water
coordinates, charges, LJ types, exclusions — cropped to whole molecules so
dense O(N²) oracles stay tractable on CPU), across impls and dtypes with an
explicit tolerance table:

| path                     | dtype | tolerance (rel, force ∞-norm)       |
|--------------------------|-------|-------------------------------------|
| dense                    | f64   | oracle                              |
| dense                    | f32   | 2e-4 (f32 pair accumulation)        |
| tiled (neighborlisted)   | f64   | 1e-10 (same math, tile order)       |
| tiled                    | f32   | 2e-4                                |
| pallas rowscan interpret | f32   | 5e-4 (f32 kernel + Chebyshev ES vs  |
|                          |       |  exact erfc — fit err ~1.5e-5 on h) |
| bonded closed-form       | f64   | 1e-9 vs autodiff                    |
| bonded closed-form       | f32   | 1e-4 vs f64 autodiff                |
| contrib-plan assembly    | both  | == scatter assembly to ~1e-7 rel    |

Also: determinism across batch shapes (ref tests/test_determinism.py:22) and
energy-overflow semantics on clashes (ref tests/test_energy_overflows.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu import potentials
from timemachine_tpu.ops import bonded as B
from timemachine_tpu.ops import nonbonded as NB
from timemachine_tpu.ops.assembly import assemble_forces, build_contrib_plan


@pytest.fixture(scope="module")
def dhfr_crop():
    """Whole-molecule crop of the real solvated DHFR system: all atoms of
    molecules whose first atom lies in a 2.8 nm corner sub-box (protein
    excluded — it spans the box; its bonded terms are tested separately on
    the full system). Box is kept, so periodic wrap pairs remain exercised."""
    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    cfg = setup_dhfr_native(waters_first=True)
    nb = cfg.host_system.nonbonded_all_pairs
    n_w = cfg.num_water_atoms

    conf = np.asarray(cfg.conf)
    params = np.asarray(nb.params)
    keep_w = np.nonzero(np.all(conf[0:n_w:3] < 2.8, axis=1))[0]
    atom_idx = (keep_w[:, None] * 3 + np.arange(3)[None, :]).reshape(-1)

    remap = -np.ones(conf.shape[0], dtype=np.int64)
    remap[atom_idx] = np.arange(len(atom_idx))
    exc = np.asarray(nb.potential.exclusion_idxs)
    scales = np.asarray(nb.potential.scale_factors)
    keep_e = np.all(remap[exc] >= 0, axis=1)
    exc_crop = remap[exc[keep_e]].astype(np.int32)
    scales_crop = scales[keep_e]

    return dict(
        conf=conf[atom_idx],
        params=params[atom_idx],
        box=np.asarray(cfg.box),
        exclusion_idxs=exc_crop,
        scale_factors=scales_crop,
        beta=nb.potential.beta,
        cutoff=nb.potential.cutoff,
    )


@pytest.fixture(scope="module")
def dhfr_full():
    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    return setup_dhfr_native(waters_first=True)


def _bind_nonbonded(crop, impl, dtype):
    pot = potentials.Nonbonded(
        crop["conf"].shape[0],
        crop["exclusion_idxs"],
        crop["scale_factors"],
        crop["beta"],
        crop["cutoff"],
    )
    if impl == "tiled":
        pot.set_impl("tiled").configure_tiled(crop["box"], conf=crop["conf"])
    elif impl == "pallas":
        pot.configure_pallas(crop["box"], crop["conf"], interpret=True)
    conf = jnp.asarray(crop["conf"], dtype)
    params = jnp.asarray(crop["params"], dtype)
    box = jnp.asarray(crop["box"], dtype)
    return pot, conf, params, box


@pytest.fixture(scope="module")
def nonbonded_oracle(dhfr_crop):
    pot, conf, params, box = _bind_nonbonded(dhfr_crop, "dense", jnp.float64)
    u = float(pot(conf, params, box))
    du_dx = np.asarray(jax.grad(pot)(conf, params, box))
    return u, du_dx


# ---- Nonbonded impl × dtype matrix on the real crop ------------------------

TOL = {
    ("dense", "f32"): 2e-4,
    ("tiled", "f64"): 1e-10,
    ("tiled", "f32"): 2e-4,
    ("pallas", "f32"): 5e-4,
}


@pytest.mark.parametrize("impl,prec", list(TOL.keys()))
def test_nonbonded_impl_dtype_matrix(dhfr_crop, nonbonded_oracle, impl, prec):
    dtype = jnp.float64 if prec == "f64" else jnp.float32
    u_ref, du_dx_ref = nonbonded_oracle
    scale_f = np.abs(du_dx_ref).max()

    pot, conf, params, box = _bind_nonbonded(dhfr_crop, impl, dtype)
    tol = TOL[(impl, prec)]

    u = float(pot(conf, params, box))
    assert u == pytest.approx(u_ref, rel=tol), (impl, prec, u, u_ref)

    if impl == "pallas":
        # production force path: the fused (u, force) provider
        u2, force = pot.energy_force_fn()(conf, params, box)
        du_dx = -np.asarray(force)
        assert float(u2) == pytest.approx(u_ref, rel=tol)
    else:
        du_dx = np.asarray(jax.grad(pot)(conf, params, box))
    np.testing.assert_allclose(du_dx, du_dx_ref, atol=tol * scale_f, err_msg=f"{impl}/{prec}")


def test_pallas_md_provider_matches_oracle(dhfr_crop, nonbonded_oracle):
    """The stateful MD provider (tile cache + rebuild) on the real crop."""
    u_ref, du_dx_ref = nonbonded_oracle
    pot, conf, params, box = _bind_nonbonded(dhfr_crop, "pallas", jnp.float32)
    init_fn, apply_fn, energy_fn, *_ = pot.md_force_provider()
    state = init_fn(conf, params, box)
    _, force, state = apply_fn(state, conf, params, box, 1)
    np.testing.assert_allclose(-np.asarray(force), du_dx_ref, atol=5e-4 * np.abs(du_dx_ref).max())
    u = float(energy_fn(state, conf, params, box))
    assert u == pytest.approx(u_ref, rel=5e-4)


# ---- bonded closed-form forces on the full real system ---------------------


def _tail_groups(cfg):
    hs = cfg.host_system
    bond_idxs = np.asarray(hs.bond.potential.idxs)
    angle_idxs = np.asarray(hs.angle.potential.idxs)
    nw_b = B._leading_water_bonds(bond_idxs)
    nw_a = B._leading_water_angles(angle_idxs)
    return dict(
        bond=(bond_idxs[2 * nw_b :], np.asarray(hs.bond.params)[2 * nw_b :]),
        angle=(angle_idxs[nw_a:], np.asarray(hs.angle.params)[nw_a:]),
        proper=(np.asarray(hs.proper.potential.idxs), np.asarray(hs.proper.params)),
        improper=(np.asarray(hs.improper.potential.idxs), np.asarray(hs.improper.params)),
    )


CLOSED_FORM = {
    "bond": (B.generic_bond_energy_force, B.harmonic_bond),
    "angle": (B.generic_angle_energy_force, B.harmonic_angle),
    "proper": (B.torsion_energy_force, B.periodic_torsion),
    "improper": (B.torsion_energy_force, B.periodic_torsion),
}


@pytest.mark.parametrize("term", list(CLOSED_FORM.keys()))
@pytest.mark.parametrize("prec", ["f64", "f32"])
def test_bonded_closed_form_matrix(dhfr_full, term, prec):
    """Closed-form (u, force) vs autodiff of the energy fn on the real DHFR
    protein tails, both dtypes."""
    dtype = jnp.float64 if prec == "f64" else jnp.float32
    idxs, params = _tail_groups(dhfr_full)[term]
    assert len(idxs) > 100, f"real system should have a substantial {term} tail"
    ef, u_fn = CLOSED_FORM[term]
    conf64 = jnp.asarray(dhfr_full.conf, jnp.float64)
    box64 = jnp.asarray(dhfr_full.box, jnp.float64)
    u_ref = float(u_fn(conf64, jnp.asarray(params, jnp.float64), box64, idxs))
    du_ref = np.asarray(jax.grad(lambda x: u_fn(x, jnp.asarray(params, jnp.float64), box64, idxs))(conf64))
    scale = np.abs(du_ref).max()

    conf = jnp.asarray(dhfr_full.conf, dtype)
    u, force = ef(conf, jnp.asarray(params, dtype), jnp.asarray(dhfr_full.box, dtype), idxs)
    tol = 1e-9 if prec == "f64" else 1e-4
    assert float(u) == pytest.approx(u_ref, rel=tol)
    # f32: Amber-scale force constants (k ~ 4e5 kJ/mol/nm^2) amplify the
    # (d - b0) cancellation differently in the closed form vs autodiff, so
    # allow a few-hundred-ulp relative slack on large elements as well
    np.testing.assert_allclose(-np.asarray(force), du_ref, rtol=5e-4 if prec == "f32" else 0.0, atol=tol * scale)


@pytest.mark.parametrize("prec", ["f64", "f32"])
def test_contrib_plan_assembly_matches_scatter(dhfr_full, prec):
    """The scatter-free atom-major assembly (ops/assembly.py) == per-term
    scatter assembly on the real protein tails, both dtypes."""
    dtype = jnp.float64 if prec == "f64" else jnp.float32
    groups = _tail_groups(dhfr_full)
    n = dhfr_full.conf.shape[0]
    conf = jnp.asarray(dhfr_full.conf, dtype)
    box = jnp.asarray(dhfr_full.box, dtype)

    f_scatter = jnp.zeros((n, 3), dtype)
    contribs = []
    idx_groups = []
    for term, (idxs, params) in groups.items():
        ef, _ = CLOSED_FORM[term]
        p = jnp.asarray(params, dtype)
        _, f = ef(conf, p, box, idxs)
        f_scatter = f_scatter + f[:, :3]
        fn = {"bond": B.bond_force_contribs, "angle": B.angle_force_contribs}.get(term, B.torsion_force_contribs)
        _, cs = fn(conf, p, idxs)
        contribs.append(cs)
        idx_groups.append(idxs)

    plan = build_contrib_plan(idx_groups, n)
    f_plan = assemble_forces(plan, contribs)
    scale = float(jnp.abs(f_scatter).max())
    tol = 1e-12 if prec == "f64" else 1e-6
    np.testing.assert_allclose(np.asarray(f_plan), np.asarray(f_scatter), atol=tol * scale)


# ---- determinism across batch shapes (ref tests/test_determinism.py:22) ----


def test_determinism_across_batch_shapes(dhfr_crop):
    """Energies must be BITWISE identical evaluated singly, vmapped over a
    batch, and at different positions within a batch."""
    pot, conf, params, box = _bind_nonbonded(dhfr_crop, "tiled", jnp.float32)
    u_fn = jax.jit(lambda x: pot(x, params, box))
    u_single = np.asarray(u_fn(conf))

    batched = jax.jit(jax.vmap(lambda x: pot(x, params, box)))
    rng = np.random.default_rng(5)
    other = jnp.asarray(conf + rng.normal(0, 0.01, conf.shape).astype(np.float32))
    u_b2 = np.asarray(batched(jnp.stack([conf, other])))
    u_b3 = np.asarray(batched(jnp.stack([other, conf, other])))

    assert u_b2[0] == u_single
    assert u_b3[1] == u_single
    assert u_b2[1] == u_b3[0] == u_b3[2]


def test_force_determinism_across_runs(dhfr_crop):
    """Same program, same inputs → bitwise-identical forces across runs
    (the XLA analog of the reference's fixed-point determinism contract)."""
    pot, conf, params, box = _bind_nonbonded(dhfr_crop, "pallas", jnp.float32)
    ef = pot.energy_force_fn()
    u1, f1 = jax.block_until_ready(ef(conf, params, box))
    u2, f2 = jax.block_until_ready(ef(conf, params, box))
    assert np.asarray(u1) == np.asarray(u2)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))


# ---- energy overflow semantics (ref tests/test_energy_overflows.py) --------


def test_clash_energy_is_nonfinite_and_mbar_safe(dhfr_crop):
    """An r→0 clash must surface as a non-finite energy (never a silently
    wrong finite number), and the BAR/MBAR ingestion maps it to +inf."""
    crop = dict(dhfr_crop)
    conf = crop["conf"].copy()
    conf[4] = conf[0] + 1e-12  # overlap two atoms of different molecules
    crop["conf"] = conf
    for impl in ("dense", "tiled"):
        pot, c, p, b = _bind_nonbonded(crop, impl, jnp.float32)
        u = float(pot(c, p, b))
        assert not np.isfinite(u), (impl, u)

    import warnings

    from timemachine_tpu.fe.free_energy import IndeterminateEnergyWarning, estimate_free_energy_bar

    # a u_kln with a NaN (blown-up frame) must be ingested as +inf, not crash
    rng = np.random.default_rng(1)
    u_kln = rng.normal(0, 1.0, (1, 2, 2, 50))
    u_kln[0, 0, 1, 3] = np.nan
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", IndeterminateEnergyWarning)
        result = estimate_free_energy_bar(u_kln, 300.0)
    assert np.isfinite(result.dG)
