"""Local MD: probabilistic region selection, frozen-atom invariants, and the
MDParams.local_md_params sampling path.

Parity target: reference tests/test_local_md.py strategy (selection radius
semantics, frozen atoms bitwise-unmoved, frames from sample())."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timemachine_tpu.fe.model_utils import apply_hmr
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.builders import build_water_system
from timemachine_tpu.md.context import Context
from timemachine_tpu.md.fire import FireMinimizationConfig, fire_minimize_jax


@pytest.fixture(scope="module")
def water_ctxt_factory():
    hc = build_water_system(2.5)
    bps = hc.host_system.get_U_fns()
    box = jnp.asarray(hc.box)
    u_fn = lambda x: sum(bp(x, box) for bp in bps)
    force = jax.jit(lambda x: -jax.grad(u_fn)(x))
    x0 = np.asarray(fire_minimize_jax(jnp.asarray(hc.conf), force, FireMinimizationConfig(200)))
    masses = apply_hmr(hc.masses, hc.host_system.bond.potential.idxs)

    def make():
        intg = LangevinIntegrator(300.0, 2.5e-3, 1.0, masses, seed=4)
        return Context(x0, np.zeros_like(x0), hc.box, intg, bps), hc

    return make


def test_local_md_freezes_far_atoms(water_ctxt_factory):
    ctxt, hc = water_ctxt_factory()
    ctxt.setup_local_md(300.0, freeze_reference=True)
    x_before = ctxt.get_x_t()
    frames, boxes = ctxt.multiple_steps_local(50, np.array([0, 1, 2], dtype=np.int32), k=10_000.0, radius=0.5, seed=5)
    x_after = ctxt.get_x_t()
    assert frames.shape == (1, x_before.shape[0], 3)

    moved = np.linalg.norm(x_after - x_before, axis=1)
    box_diag = np.diagonal(hc.box)
    diff = x_before - x_before[0]
    diff -= box_diag * np.floor(diff / box_diag + 0.5)
    d0 = np.linalg.norm(diff, axis=1)

    assert (moved > 0).sum() > 3  # a local region moved
    # the flat-bottom selection tail decays fast: nothing far away may move
    assert (moved[d0 > 1.5] == 0).all()
    # the chosen reference atom is frozen (replicate the seeded choice)
    ref = np.array([0, 1, 2])[np.random.default_rng(5).integers(3)]
    assert moved[ref] == 0.0


def test_local_md_deterministic(water_ctxt_factory):
    results = []
    for _ in range(2):
        ctxt, _ = water_ctxt_factory()
        ctxt.multiple_steps_local(25, np.array([0, 1, 2], dtype=np.int32), k=10_000.0, radius=0.5, seed=7)
        results.append(ctxt.get_x_t())
    np.testing.assert_array_equal(results[0], results[1])


def test_local_md_selection_varies_with_seed(water_ctxt_factory):
    ctxt, _ = water_ctxt_factory()
    x0 = ctxt.get_x_t()
    ctxt.multiple_steps_local(10, np.arange(30, dtype=np.int32), k=10_000.0, radius=0.5, seed=1)
    x1 = ctxt.get_x_t()
    ctxt2, _ = water_ctxt_factory()
    ctxt2.multiple_steps_local(10, np.arange(30, dtype=np.int32), k=10_000.0, radius=0.5, seed=2)
    x2 = ctxt2.get_x_t()
    # different seeds pick different references/regions
    assert not np.array_equal(x1, x2)
    assert not np.array_equal(x0, x1)


def test_local_md_free_reference(water_ctxt_factory):
    """freeze_reference=False: the reference atom moves too, tethered by the
    log-complement flat-bottom restraint on the frozen shell (ref
    local_md_potentials.cu:77-82); distant atoms still never move."""
    ctxt, hc = water_ctxt_factory()
    x_before = ctxt.get_x_t()
    ctxt.multiple_steps_local(
        50, np.array([0, 1, 2], dtype=np.int32), k=10_000.0, radius=0.5, seed=5, freeze_reference=False
    )
    x_after = ctxt.get_x_t()
    moved = np.linalg.norm(x_after - x_before, axis=1)

    ref = np.array([0, 1, 2])[np.random.default_rng(5).integers(3)]
    assert moved[ref] > 0.0  # the reference is free now
    assert np.all(np.isfinite(x_after))

    box_diag = np.diagonal(hc.box)
    diff = x_before - x_before[ref]
    diff -= box_diag * np.floor(diff / box_diag + 0.5)
    d0 = np.linalg.norm(diff, axis=1)
    # frozen atoms (far outside the radius) still never move
    assert (moved[d0 > 1.5] == 0).all()


def test_sample_with_local_md_params(water_ctxt_factory):
    """LocalMDParams flows through sample_with_context_iter."""
    from timemachine_tpu.fe.free_energy import LocalMDParams, MDParams, sample_with_context_iter

    ctxt, hc = water_ctxt_factory()
    md_params = MDParams(
        n_frames=3,
        n_eq_steps=0,
        steps_per_frame=20,
        seed=3,
        local_md_params=LocalMDParams(local_steps=10, k=10_000.0, min_radius=0.4, max_radius=0.6),
    )
    batches = list(
        sample_with_context_iter(ctxt, md_params, 300.0, np.array([0, 1, 2], dtype=np.int32), batch_size=3)
    )
    coords = np.concatenate([b[0] for b in batches])
    assert coords.shape == (3, hc.conf.shape[0], 3)
    assert np.isfinite(coords).all()


def test_local_md_explicit_selection(water_ctxt_factory):
    """multiple_steps_local_selection: ONLY the caller-chosen atoms move,
    the reference is frozen, everything else is bitwise-unmoved (ref
    Context::multiple_steps_local_selection, context.cu:111-161)."""
    ctxt, hc = water_ctxt_factory()
    x_before = ctxt.get_x_t()

    # select the two water molecules nearest atom 0 (excluding its own)
    box_diag = np.diagonal(hc.box)
    diff = x_before - x_before[0]
    diff -= box_diag * np.floor(diff / box_diag + 0.5)
    d0 = np.linalg.norm(diff, axis=1)
    order = np.argsort(d0)
    sel = np.array([i for i in order if i not in (0, 1, 2)][:6], dtype=np.int32)

    frames, boxes = ctxt.multiple_steps_local_selection(50, 0, sel, store_x_interval=25, radius=0.5, k=10_000.0)
    assert frames.shape == (2, x_before.shape[0], 3)
    x_after = ctxt.get_x_t()
    moved = np.linalg.norm(x_after - x_before, axis=1)

    assert (moved[sel] > 0).all()  # every selected atom moved
    not_sel = np.setdiff1d(np.arange(x_before.shape[0]), sel)
    assert (moved[not_sel] == 0).all()  # everyone else bitwise-unmoved
    assert moved[0] == 0.0  # the reference is frozen

    # the flat-bottom tether holds the free atoms near the reference
    diff_a = ctxt.get_x_t()[sel] - x_before[0]
    diff_a -= box_diag * np.floor(diff_a / box_diag + 0.5)
    assert (np.linalg.norm(diff_a, axis=1) < 0.5 + 0.3).all()


def test_local_md_selection_validation(water_ctxt_factory):
    ctxt, _ = water_ctxt_factory()
    with pytest.raises(ValueError, match="reference_idx"):
        ctxt.multiple_steps_local_selection(10, 0, np.array([0, 4, 5]))
    with pytest.raises(ValueError, match="out of range"):
        ctxt.multiple_steps_local_selection(10, 0, np.array([10**6]))
