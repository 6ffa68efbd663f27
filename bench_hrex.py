"""Secondary benchmark: replica-parallel HREX throughput.

The reference time-multiplexes HREX replicas on one GPU (one Context,
set_params/set_x_t swaps per frame, host round-trips every iteration —
free_energy.py:1383-1531). Here all K replicas advance simultaneously,
sharded over the device mesh, with swaps decided on device — so aggregate
sampling throughput scales with the number of chips.

Not wired to the driver (bench.py is the headline metric); run manually:

    python bench_hrex.py                  # real devices (1 TPU chip under axon)
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_hrex.py --tiny       # 8 virtual devices

Prints one JSON line with aggregate replica-ns/day across all states.
"""

import argparse
import json
import time

import numpy as np

DT_PS = 2.5e-3
TEMP = 300.0
FRICTION = 1.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_states", type=int, default=8)
    parser.add_argument("--n_iters", type=int, default=20)
    parser.add_argument("--steps_per_iter", type=int, default=100)
    parser.add_argument("--box_width", type=float, default=2.6)
    parser.add_argument("--tiny", action="store_true", help="shrink for virtual-device smoke runs")
    args = parser.parse_args()
    if args.tiny:
        args.box_width, args.n_iters, args.steps_per_iter = 1.6, 3, 10

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin force-registers; env alone doesn't win
        jax.config.update("jax_platforms", "cpu")

    from timemachine_tpu.fe.model_utils import apply_hmr
    from timemachine_tpu.md.builders import build_water_system
    from timemachine_tpu.md.utils import sample_velocities
    from timemachine_tpu.parallel.hrex_sharded import make_replica_mesh, run_hrex_sharded

    host_config = build_water_system(args.box_width)
    n = host_config.conf.shape[0]
    nb_bp = host_config.host_system.nonbonded_all_pairs
    nb = nb_bp.potential
    bps = host_config.host_system.get_U_fns()

    # lambda ladder on the nonbonded charge scale: state k scales charges by
    # sqrt(1 - 0.02 k) — a cheap stand-in for a real alchemical ladder that
    # keeps all replicas' potentials distinct
    K = args.n_states
    base_q = np.asarray(nb_bp.params)
    params_by_state = np.stack(
        [np.concatenate([base_q * np.array([np.sqrt(1 - 0.02 * k), 1, 1, 1]), np.zeros((0, 4))]).reshape(-1)
         for k in range(K)]
    )

    other_bps = [bp for bp in bps if bp.potential is not nb]

    def u_fn(x, box, flat_params):
        p = flat_params.reshape(-1, 4)
        u = nb(x, p, box)
        for bp in other_bps:
            u = u + bp(x, box)
        return u

    masses = apply_hmr(host_config.masses, host_config.host_system.bond.potential.idxs)
    x0 = host_config.conf.astype(np.float32)
    box0 = host_config.box.astype(np.float32)
    xs0 = np.broadcast_to(x0, (K, *x0.shape)).copy()
    vs0 = np.stack([sample_velocities(masses, TEMP, seed=100 + k).astype(np.float32) for k in range(K)])
    boxes0 = np.broadcast_to(box0, (K, 3, 3)).copy()
    neighbor_pairs = np.stack([np.arange(K - 1), np.arange(1, K)], axis=1)

    mesh = make_replica_mesh()
    n_devices = len(jax.devices())

    def run():
        return run_hrex_sharded(
            u_fn, params_by_state, xs0, vs0, boxes0, masses, TEMP, DT_PS, FRICTION,
            n_iters=args.n_iters, steps_per_iter=args.steps_per_iter,
            neighbor_pairs=neighbor_pairs, n_swap_attempts_per_iter=K**3, seed=2026,
            mesh=mesh if K % n_devices == 0 else None,
        )

    res = run()  # compile + warmup
    t0 = time.perf_counter()
    res = run()
    elapsed = time.perf_counter() - t0

    total_steps = K * args.n_iters * args.steps_per_iter
    agg_ns_day = total_steps * DT_PS / 1000.0 / elapsed * 86_400.0
    print(json.dumps({
        "metric": f"hrex_replica_parallel_{n}atoms_{K}states_{n_devices}dev",
        "value": round(agg_ns_day, 3),
        "unit": "aggregate replica ns/day",
        "swap_rate": round(float(np.sum(res.accepted_by_pair_by_iter) / max(np.sum(res.proposed_by_pair_by_iter), 1)), 4),
    }))


if __name__ == "__main__":
    main()
