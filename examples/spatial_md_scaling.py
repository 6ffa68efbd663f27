"""Spatially-decomposed MD over a device mesh — usage demo + scaling probe.

Partitions one solvated system's full force pass (nonbonded sweep rows,
bonded terms, exclusion pairs) across the available devices with a single
force psum per step (parallel/spatial_md.py), and reports steps/s per mesh
size. On a CPU host this exercises the sharding program on virtual devices
(correctness/demo); on a TPU slice the mesh axes map onto ICI and the
timings are meaningful (see ARCHITECTURE.md's scaling table).

Example (8 virtual devices on CPU):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/spatial_md_scaling.py --box-width 2.6 --n-steps 10
"""

import argparse
import time
import warnings


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--box-width", type=float, default=2.6, help="water box width (nm)")
    parser.add_argument("--n-steps", type=int, default=10)
    parser.add_argument("--temperature", type=float, default=300.0)
    parser.add_argument("--dt", type=float, default=1e-3, help="ps")
    parser.add_argument("--mesh-sizes", type=int, nargs="*", default=None,
                        help="device counts to time (default: 1 .. all available, powers of 2)")
    parser.add_argument("--interpret", action="store_true",
                        help="run the pallas kernel in interpret mode (required on CPU)")
    args = parser.parse_args()

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from timemachine_tpu.md.builders import build_water_system
    from timemachine_tpu.md.utils import sample_velocities
    from timemachine_tpu.parallel.spatial_md import make_spatial_md_runner

    devices = jax.devices()
    interpret = args.interpret or devices[0].platform == "cpu"
    sizes = args.mesh_sizes
    if not sizes:
        sizes = [d for d in (1, 2, 4, 8, 16) if d <= len(devices)]

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        host_config = build_water_system(args.box_width)
    bps = [bp.potential.bind(np.asarray(bp.params, np.float32)) for bp in host_config.host_system.get_U_fns()]
    x0 = np.asarray(host_config.conf, np.float32)
    box = np.asarray(host_config.box, np.float32)
    v0 = np.asarray(sample_velocities(host_config.masses, args.temperature, seed=7), np.float32)
    print(f"# {x0.shape[0]} atoms, platform={devices[0].platform}, interpret={interpret}")

    for n_dev in sizes:
        mesh = Mesh(np.array(devices[:n_dev]), ("spatial",))
        make_run = make_spatial_md_runner(
            bps, host_config.masses, mesh, interpret=interpret, conf0=x0, box0=box
        )
        run = make_run(args.temperature, args.dt, 1.0, args.n_steps)
        key = jax.random.key(2026)
        x, v, _ = run(x0, v0, box, key)  # compile + warmup
        t0 = time.perf_counter()
        x, v, _ = run(x0, v0, box, key)
        np.asarray(x)
        elapsed = time.perf_counter() - t0
        assert np.all(np.isfinite(np.asarray(x)))
        print(f"mesh={n_dev}: {args.n_steps / elapsed:.2f} steps/s ({elapsed / args.n_steps * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
