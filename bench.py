"""Headline benchmark: apo-MD throughput (ns/day) on a solvated box at
DHFR scale (~23k atoms), NPT, dt = 2.5 fs with HMR — mirroring the
reference's benchmark harness defaults (tests/test_benchmark.py:506-518,
dt/friction/barostat-interval per BASELINE.md).

Runs on whatever accelerator JAX exposes (the real TPU chip under the
driver). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ns/day", "vs_baseline": N}

vs_baseline normalizes against BASELINE_NS_PER_DAY — the reference publishes
no numbers (BASELINE.md), so this is the commonly-reported CUDA throughput
for a ~23k-atom unconstrained HMR system on a modern datacenter GPU.
"""

import argparse
import json
import time

import numpy as np

BASELINE_NS_PER_DAY = 500.0  # assumed CUDA reference (none published; see BASELINE.md)

BENCH_KERNEL = None  # set by --kernel

N_ATOMS_TARGET = 23_000
DT_PS = 2.5e-3
FRICTION = 1.0
TEMP = 300.0
PRESSURE = 1.013
BAROSTAT_INTERVAL = 25


def build_system():
    """Real solvated DHFR (23,558 atoms: 2489-atom protein + 7023 waters,
    equilibrated box from 5dfr_solv_equil.pdb), matching the reference's
    headline benchmark system (tests/test_benchmark.py:506). Parameterized
    natively (cached npz ships in-repo); waters-first ordering so the
    analytic water bonded fast path applies. Falls back to the water-box
    proxy (old metric name) if the DHFR build fails or TM_BENCH_SYSTEM=water."""
    import os

    from timemachine_tpu.fe.model_utils import apply_hmr

    host_config = None
    metric_system = "dhfr"
    if os.environ.get("TM_BENCH_SYSTEM", "dhfr") == "dhfr":
        try:
            from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

            host_config = setup_dhfr_native(waters_first=True)
        except Exception as e:
            print(f"# dhfr build failed ({e!r}); falling back to water box")
    if host_config is None:
        from timemachine_tpu.md.builders import build_water_system

        metric_system = "water"
        box_width = (N_ATOMS_TARGET / 3 / 33.3) ** (1 / 3)
        host_config = build_water_system(box_width)
    bps = host_config.host_system.get_U_fns()

    # production path: fused Pallas tile kernel
    nb = host_config.host_system.nonbonded_all_pairs.potential
    import jax

    if jax.devices()[0].platform == "cpu":
        nb.set_impl("tiled").configure_tiled(host_config.box, conf=host_config.conf)
    else:
        kwargs = {"kernel": BENCH_KERNEL} if BENCH_KERNEL else {}
        # apo systems carry no 4D offsets: drop the per-slot dw math
        w_col = np.asarray(host_config.host_system.nonbonded_all_pairs.params)[:, 3]
        kwargs["rowscan_has_w"] = bool(np.any(w_col != 0.0))
        nb.configure_pallas(host_config.box, host_config.conf, **kwargs)

    bond_idxs = host_config.host_system.bond.potential.idxs
    masses = apply_hmr(host_config.masses, bond_idxs)
    return host_config, bps, masses, metric_system


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="write a jax.profiler trace of the timed region to DIR (view with xprof/tensorboard)")
    parser.add_argument("--kernel", default=None, choices=["dot", "quad", "rowscan", "gather", "v1"],
                        help="override the pallas kernel selection")
    args = parser.parse_args()

    import jax

    from timemachine_tpu.integrators import LangevinIntegrator
    from timemachine_tpu.md.barostat import MonteCarloBarostat
    from timemachine_tpu.md.context import Context
    from timemachine_tpu.md.fire import FireMinimizationConfig
    from timemachine_tpu.md.fire import fire_minimize_jax
    from timemachine_tpu.md.utils import sample_velocities

    global BENCH_KERNEL
    BENCH_KERNEL = args.kernel
    host_config, bps, masses, metric_system = build_system()
    n_atoms = host_config.conf.shape[0]
    box = host_config.box

    dtype = np.float32  # TPU-native precision for the hot loop
    x0 = host_config.conf.astype(dtype)

    # quick clash relaxation (the builder lattice is slightly strained)
    import jax.numpy as jnp

    u_fn = lambda x: sum(bp(x, jnp.asarray(box, dtype)) for bp in bps)
    force = jax.jit(lambda x: -jax.grad(u_fn)(x))
    x0 = np.asarray(fire_minimize_jax(jnp.asarray(x0), force, FireMinimizationConfig(400)))

    intg = LangevinIntegrator(TEMP, DT_PS, FRICTION, masses, seed=2026)
    if host_config.host_topology.group_idxs:
        groups = list(host_config.host_topology.group_idxs)
    else:
        groups = [np.arange(3 * w, 3 * w + 3) for w in range(n_atoms // 3)]
    baro = MonteCarloBarostat(n_atoms, PRESSURE, TEMP, groups, BAROSTAT_INTERVAL, seed=2027)
    v0 = sample_velocities(masses, TEMP, seed=2028).astype(dtype)

    ctxt = Context(x0, v0, box.astype(dtype), intg, bps, movers=[baro])

    n_steps = 1000
    # warmup (compile + equilibrate) — same (interval, n_frames) shape as the
    # timed call so the jitted runner is reused, never recompiled in the
    # timed region
    ctxt.multiple_steps(n_steps)

    if args.profile:
        with jax.profiler.trace(args.profile):
            t0 = time.perf_counter()
            ctxt.multiple_steps(n_steps)
            elapsed = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        ctxt.multiple_steps(n_steps)
        elapsed = time.perf_counter() - t0

    ns_simulated = n_steps * DT_PS / 1000.0
    ns_per_day = ns_simulated / elapsed * 86_400.0

    record = {
        "metric": f"apo_md_{metric_system}_npt_{n_atoms}atoms",
        "value": round(ns_per_day, 3),
        "unit": "ns/day",
        "vs_baseline": round(ns_per_day / BASELINE_NS_PER_DAY, 4),
    }

    # tracked spatial-decomposition surface (VERDICT r3 item 7): compile the
    # sharded spatial step through Mosaic on a 1-device mesh each round and
    # record its D=1 throughput alongside the headline metric. >1-chip rows
    # in ARCHITECTURE.md scaling tables remain cost-model projections; this
    # is the measured single-chip anchor. TM_BENCH_SPATIAL=0 skips.
    import os

    if os.environ.get("TM_BENCH_SPATIAL", "1") != "0" and jax.devices()[0].platform != "cpu":
        try:
            record["spatial_d1_ns_per_day"] = round(bench_spatial_d1(), 3)
        except Exception as e:  # never break the headline metric
            record["spatial_d1_error"] = repr(e)[:200]

    # TPU-native headline #2 (VERDICT r4 item 6): aggregate replica-ns/day of
    # production bisected-ladder HREX at healthy mixing. The full measurement
    # is bench_hrex_production.py --bisect (minutes of ladder derivation +
    # sampling); bench.py ingests its artifact so the driver captures the
    # metric in BENCH_r*.json every round, with the measurement timestamp for
    # freshness.
    try:
        import pathlib

        hrex_path = pathlib.Path(__file__).resolve().parent / "results" / "hrex_production_bisected.json"
        hrex = json.loads(hrex_path.read_text())
        record["hrex_aggregate_replica_ns_day"] = hrex["value"]
        record["hrex_swap_rate"] = hrex["swap_rate"]
        record["hrex_n_states"] = int(hrex["metric"].split("_")[-2].replace("states", ""))
        record["hrex_measured_at"] = hrex.get("timestamp", "round 4 (pre-timestamp artifact)")
    except Exception as e:
        record["hrex_artifact_error"] = repr(e)[:200]

    print(json.dumps(record))


def bench_spatial_d1(n_steps: int = 300):
    """Spatially-decomposed MD step (parallel/spatial_md.py) on a 1-device
    mesh over the 23k-atom water system — the same system
    scripts/probe_spatial_tpu.py measured (59.3 ns/day, round 3)."""
    import jax
    import numpy as np

    from timemachine_tpu.md.builders import build_water_system
    from timemachine_tpu.md.utils import sample_velocities
    from timemachine_tpu.parallel.spatial_md import make_spatial_md_runner

    box_width = (N_ATOMS_TARGET / 3 / 33.3) ** (1 / 3)
    host_config = build_water_system(box_width)
    bps = [bp.potential.bind(np.asarray(bp.params, np.float32)) for bp in host_config.host_system.get_U_fns()]
    x0 = np.asarray(host_config.conf, np.float32)
    box = np.asarray(host_config.box, np.float32)
    v0 = np.asarray(sample_velocities(host_config.masses, TEMP, seed=3), np.float32)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("spatial",))
    make_run = make_spatial_md_runner(bps, host_config.masses, mesh, interpret=False, conf0=x0, box0=box)
    run = make_run(TEMP, DT_PS, FRICTION, n_steps=n_steps)
    x_out, v_out, _ = run(x0, v0, box, jax.random.key(7))  # compile + warm
    jax.block_until_ready(x_out)
    t0 = time.perf_counter()
    x_out, v_out, _ = run(x0, v0, box, jax.random.key(7))
    jax.block_until_ready(x_out)
    dt = (time.perf_counter() - t0) / n_steps
    assert np.all(np.isfinite(np.asarray(x_out)))
    return DT_PS / 1000.0 / (dt / 86_400.0)


if __name__ == "__main__":
    main()
