"""Production-scale replica-parallel HREX benchmark: the REAL hif2a solvent
window ladder (6.4k-atom water box around the single-topology pair, NPT,
barostat, production 400-step segments), driven through the production
runner (parallel/replica_exchange.ReplicaExchangeRunner — the same engine
run_sims_hrex uses). Replaces the round-2 cost-model projection for the
multi-chip HREX parity story with measured single-chip numbers plus mesh
scaling validated separately (VERDICT r2 item 2).

Reference analog: the HREX phase of tests/test_benchmark.py:435-533 /
free_energy.py:1383-1531 (time-multiplexed there; replica-parallel here).

Usage:
    python bench_hrex_production.py [--n_states 8] [--steps_per_iter 400] [--n_iters 5]
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_hrex_production.py --tiny      # virtual-mesh smoke

Prints one JSON line: aggregate replica-ns/day over all states, s/iteration,
per-replica ns/day, swap rate.
"""

import argparse
import json
import os
import time

import numpy as np

DT_PS = 2.5e-3
TEMP = 300.0
SEED = 2026


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_states", type=int, default=8)
    parser.add_argument("--n_iters", type=int, default=5)
    parser.add_argument("--steps_per_iter", type=int, default=400)
    parser.add_argument("--leg", default="solvent", choices=["vacuum", "solvent"])
    parser.add_argument("--tiny", action="store_true", help="vacuum leg, tiny segments (virtual-mesh smoke)")
    parser.add_argument(
        "--bisect", action="store_true",
        help="derive the ladder with the production greedy bisection at "
        "min_overlap=0.667 (short sampling) instead of an even grid — the "
        "reference's window-placement policy (free_energy.py:1383-1531). "
        "Expect healthy (>~0.2) neighbor swap rates; an even grid at K=8 "
        "measured 0.07 in round 3 (VERDICT r3 item 3).",
    )
    parser.add_argument("--max_windows", type=int, default=24, help="bisection window cap")
    args = parser.parse_args()
    if args.tiny:
        args.leg, args.n_iters, args.steps_per_iter = "vacuum", 2, 10

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bench_rbfe import _get_host
    from timemachine_tpu.fe.free_energy import get_context, get_swap_attempts_per_iter_heuristic
    from timemachine_tpu.fe.lambda_schedule import bisection_lambda_schedule
    from timemachine_tpu.fe.rbfe import setup_initial_state
    from timemachine_tpu.fe.single_topology import SingleTopology
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.parallel.replica_exchange import ReplicaExchangeRunner, make_replica_mesh
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    ff = Forcefield.load_default()
    mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
    st = SingleTopology(mol_a, mol_b, core, ff)
    host = _get_host(args.leg, mol_a, mol_b, ff)

    t0 = time.time()
    if args.bisect:
        from timemachine_tpu.fe.free_energy import MDParams, run_sims_bisection

        bisect_md = MDParams(n_frames=5, n_eq_steps=2000, steps_per_frame=200, seed=SEED)
        results, _ = run_sims_bisection(
            [0.0, 1.0],
            lambda lamb: setup_initial_state(st, float(lamb), host, TEMP, SEED),
            bisect_md,
            n_bisections=args.max_windows - 2,
            temperature=TEMP,
            min_overlap=0.667,
        )
        states = list(results[-1].initial_states)
        lambdas = [s.lamb for s in states]
        print(f"# bisected ladder ({len(states)} windows): "
              + " ".join(f"{l:.3f}" for l in lambdas), flush=True)
    else:
        lambdas = bisection_lambda_schedule(args.n_states)
        states = [setup_initial_state(st, float(lamb), host, TEMP, SEED) for lamb in lambdas]
    K = len(states)
    print(f"# built {K} {args.leg} windows ({states[0].x0.shape[0]} atoms) in {time.time()-t0:.0f} s", flush=True)

    context = get_context(states[0])
    params_by_state = [[np.asarray(bp.params) for bp in s.potentials] for s in states]
    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and K % n_dev == 0:
        mesh = make_replica_mesh()
    neighbor_pairs = np.stack([np.arange(K - 1), np.arange(1, K)], axis=1)
    runner = ReplicaExchangeRunner(
        context,
        params_by_state,
        temperature=TEMP,
        neighbor_pairs=neighbor_pairs,
        n_swap_attempts_per_iter=get_swap_attempts_per_iter_heuristic(K),
        max_delta_states=4,
        seed=SEED,
        mesh=mesh,
    )
    runner.initialize(
        [s.x0 for s in states], [s.v0 for s in states], [s.box0 for s in states]
    )

    runner.advance_frame(args.steps_per_iter)  # compile + settle
    t0 = time.perf_counter()
    acc = prop = 0
    acc_by_pair = np.zeros(K - 1)
    prop_by_pair = np.zeros(K - 1)
    for _ in range(args.n_iters):
        r = runner.advance_frame(args.steps_per_iter)
        acc += int(np.sum(r.accepted_by_pair))
        prop += int(np.sum(r.proposed_by_pair))
        acc_by_pair += np.asarray(r.accepted_by_pair, dtype=float)
        prop_by_pair += np.asarray(r.proposed_by_pair, dtype=float)
    elapsed = time.perf_counter() - t0

    s_per_iter = elapsed / args.n_iters
    total_steps = K * args.n_iters * args.steps_per_iter
    agg = total_steps * DT_PS / 1000.0 / elapsed * 86_400.0
    record = {
        "metric": f"hrex_production_{args.leg}_hif2a_{states[0].x0.shape[0]}atoms_{K}states_{n_dev}dev",
        "value": round(agg, 3),
        "unit": "aggregate replica ns/day",
        "s_per_iteration": round(s_per_iter, 3),
        "per_replica_ns_day": round(agg / K, 3),
        "swap_rate": round(acc / max(prop, 1), 4),
        "per_pair_swap_rates": [round(a / max(p, 1.0), 4) for a, p in zip(acc_by_pair, prop_by_pair)],
        "ladder": "bisected(min_overlap=0.667)" if args.bisect else "even_grid",
        "lambdas": [round(float(l), 4) for l in lambdas],
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(record), flush=True)
    if args.bisect and jax.devices()[0].platform != "cpu":
        # refresh the driver-tracked artifact (ingested by bench.py each round)
        import pathlib

        out = pathlib.Path(__file__).resolve().parent / "results" / "hrex_production_bisected.json"
        out.write_text(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
