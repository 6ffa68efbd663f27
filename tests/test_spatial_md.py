"""Spatially-decomposed MD step (parallel/spatial_md.py): trajectory parity
vs the single-device Context on an 8-virtual-device CPU mesh, and
mesh-size invariance. The step partitions the nonbonded sweep rows, bonded
term lists and exclusion pairs across devices with one force psum per step;
the noise stream matches md/context.py bitwise, so the only divergence is
f32 reduction order."""

import warnings

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.context import Context
from timemachine_tpu.md.utils import sample_velocities
from timemachine_tpu.parallel.spatial_md import make_spatial_md_runner

TEMP, DT, FRICTION = 300.0, 1e-3, 1.0
N_STEPS = 10
SEED = 2026


@pytest.fixture(scope="module")
def water_system():
    from timemachine_tpu.md.builders import build_water_system

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        host_config = build_water_system(2.6)
    # f32 params on both sides so the Context carry stays f32 and its noise
    # stream (dtype-dependent) matches the sharded runner's bitwise
    bps = [bp.potential.bind(np.asarray(bp.params, np.float32)) for bp in host_config.host_system.get_U_fns()]
    masses = np.asarray(host_config.masses)
    x0 = np.asarray(host_config.conf, np.float32)
    box = np.asarray(host_config.box, np.float32)
    v0 = np.asarray(sample_velocities(masses, TEMP, seed=7), np.float32)
    return bps, masses, x0, v0, box


def reference_trajectory(bps, masses, x0, v0, box):
    """Single-device Context on the pallas rowscan path (interpret mode),
    rng_seed matching the sharded runner's base key. The spatial runner
    mirrors the CANONICAL step's noise stream (per-atom noise drawn in
    natural atom order), so the sorted-state fast path — which draws noise
    in pad_order — must be disabled for the reference."""
    import os

    nb = next(bp.potential for bp in bps if hasattr(bp.potential, "configure_pallas"))
    nb.configure_pallas(box, x0, interpret=True)
    intg = LangevinIntegrator(TEMP, DT, FRICTION, masses, seed=SEED)
    prev = os.environ.get("TM_SORTED_MD")
    os.environ["TM_SORTED_MD"] = "0"
    try:
        ctxt = Context(x0, v0, box, intg, bps)
        ctxt.multiple_steps(N_STEPS)
    finally:
        if prev is None:
            del os.environ["TM_SORTED_MD"]
        else:
            os.environ["TM_SORTED_MD"] = prev
    return ctxt.get_x_t(), ctxt.get_v_t()


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_spatial_md_matches_context(water_system, n_dev):
    bps, masses, x0, v0, box = water_system
    x_ref, v_ref = reference_trajectory(bps, masses, x0, v0, box)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("spatial",))
    make_run = make_spatial_md_runner(
        bps, masses, mesh, interpret=True, conf0=x0, box0=box
    )
    run = make_run(TEMP, DT, FRICTION, N_STEPS)
    x_s, v_s, _ = run(x0, v0, box, jax.random.key(SEED))
    x_s, v_s = np.asarray(x_s), np.asarray(v_s)

    assert np.all(np.isfinite(x_s)) and np.all(np.isfinite(v_s))
    # identical noise stream; divergence is f32 reduction order through the
    # force psum, amplified over N_STEPS Langevin steps
    disp = np.abs(x_s - np.asarray(x_ref)).max()
    assert disp < 5e-4, disp
    vel_err = np.abs(v_s - np.asarray(v_ref)).max() / max(np.abs(np.asarray(v_ref)).max(), 1.0)
    assert vel_err < 5e-3, vel_err


def test_spatial_md_mesh_size_consistency(water_system):
    """2-device and 8-device partitions integrate the same trajectory (up to
    reduction order)."""
    bps, masses, x0, v0, box = water_system
    outs = []
    for n_dev in (2, 8):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("spatial",))
        make_run = make_spatial_md_runner(bps, masses, mesh, interpret=True, conf0=x0, box0=box)
        run = make_run(TEMP, DT, FRICTION, N_STEPS)
        x_s, _, _ = run(x0, v0, box, jax.random.key(SEED))
        outs.append(np.asarray(x_s))
    assert np.abs(outs[0] - outs[1]).max() < 5e-4


def test_spatial_md_npt_barostat(water_system):
    """NPT: the replicated volume move sees the partitioned (psum'd)
    rigid-move energy; the box evolves and stays finite, and the adaptive
    state advances on schedule."""
    from timemachine_tpu.md.barostat import MonteCarloBarostat

    bps, masses, x0, v0, box = water_system
    n = x0.shape[0]
    groups = [np.arange(3 * w, 3 * w + 3) for w in range(n // 3)]
    baro = MonteCarloBarostat(n, 1.013, TEMP, groups, interval=3, seed=0)

    mesh = Mesh(np.array(jax.devices()[:4]), ("spatial",))
    make_run = make_spatial_md_runner(bps, masses, mesh, interpret=True, conf0=x0, box0=box)
    run = make_run(TEMP, DT, FRICTION, 9, barostat=baro)
    x_s, v_s, box_s = run(x0, v0, box, jax.random.key(SEED))
    assert np.all(np.isfinite(np.asarray(x_s))) and np.all(np.isfinite(np.asarray(box_s)))
    # 3 volume moves attempted: the box either moved or every move was
    # rejected with the diagonal untouched
    assert np.asarray(box_s).shape == (3, 3)
    ratio = float(np.asarray(box_s)[0, 0] / box[0, 0])
    assert 0.9 < ratio < 1.1


def test_spatial_md_partitions_interaction_group(water_system):
    """RBFE-window shape: an explicit ligand x environment interaction group
    rides along; the spatial runner partitions its ENVIRONMENT columns
    (mask-padded grid) and must match the single-device Context."""
    from timemachine_tpu.potentials import NonbondedInteractionGroup

    bps, masses, x0, v0, box = water_system
    n = x0.shape[0]
    ig = NonbondedInteractionGroup(n, np.arange(6, dtype=np.int32), beta=2.0, cutoff=1.2)
    # reuse the Nonbonded term's per-atom params for the group term
    nb_bp = next(bp for bp in bps if hasattr(bp.potential, "configure_pallas"))
    bps_ig = list(bps) + [ig.bind(np.asarray(nb_bp.params, np.float32))]

    x_ref, v_ref = reference_trajectory(bps_ig, masses, x0, v0, box)

    mesh = Mesh(np.array(jax.devices()[:8]), ("spatial",))
    make_run = make_spatial_md_runner(bps_ig, masses, mesh, interpret=True, conf0=x0, box0=box)
    run = make_run(TEMP, DT, FRICTION, N_STEPS)
    x_s, v_s, _ = run(x0, v0, box, jax.random.key(SEED))
    assert np.abs(np.asarray(x_s) - np.asarray(x_ref)).max() < 5e-4
