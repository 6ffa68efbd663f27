"""RBFE-window MD throughput (ns/day) for the HIF2A ligand pair — the
reference benchmark harness's headline RBFE metrics
(ref tests/test_benchmark.py:435-551: benchmark_hif2a / benchmark_solvent /
benchmark_vacuum), measured through this framework's production window path:
SingleTopology -> combine_with_host -> setup_initial_state -> Context.

Legs:
  vacuum   — ligand pair only
  solvent  — 4.0 nm water box (run_solvent's build)
  complex  — the real HIF2A protein (hif2a_nowater_min.pdb, perceived +
             SMIRKS-typed natively) solvated around the pair

Usage:  python bench_rbfe.py [--legs vacuum,solvent,complex] [--lamb 0.0]
Prints one JSON line per leg. Host builds and pre-equilibration are cached
under /tmp (TM_RBFE_BENCH_CACHE_DIR) — the first complex run pays a few
minutes of typing + equilibration.
"""

import argparse
import json
import os
import time

import numpy as np

CACHE_DIR = os.environ.get("TM_RBFE_BENCH_CACHE_DIR", "/tmp/tm_rbfe_bench")

DT_PS = 2.5e-3
TEMP = 300.0
SEED = 2026
N_STEPS = 1000


def _get_host(leg: str, mol_a, mol_b, ff):
    from timemachine_tpu.fe.rbfe import Host
    from timemachine_tpu.md import builders

    if leg == "vacuum":
        return None
    os.makedirs(CACHE_DIR, exist_ok=True)
    cfg_path = os.path.join(CACHE_DIR, f"{leg}_host.npz")
    eq_path = os.path.join(CACHE_DIR, f"{leg}_equil.npz")

    cfg = builders.load_host_config(cfg_path) if os.path.exists(cfg_path) else None
    if cfg is None:
        if leg == "solvent":
            cfg = builders.build_water_system(4.0, ff.water_ff, mols=[mol_a, mol_b])
            cfg.box += np.diag([0.1, 0.1, 0.1])
        else:
            from timemachine_tpu.testsystems.data import path_to_data

            pdb = str(path_to_data("data", "hif2a_nowater_min.pdb"))
            cfg = builders.build_protein_system(pdb, ff.protein_ff, ff.water_ff, mols=[mol_a, mol_b])
            cfg.box += np.diag([0.1, 0.1, 0.1])
        builders.save_host_config(cfg, cfg_path)

    if os.path.exists(eq_path):
        z = np.load(eq_path)
        conf, box = z["conf"], z["box"]
    else:
        from timemachine_tpu.md import minimizer

        t0 = time.time()
        conf, box = minimizer.pre_equilibrate_host([mol_a, mol_b], cfg, ff)
        print(f"# {leg}: pre-equilibrated in {time.time() - t0:.0f} s", flush=True)
        np.savez_compressed(eq_path, conf=conf, box=box)

    return Host(cfg.host_system, cfg.masses, conf, box, cfg.num_water_atoms, cfg.host_topology)


def bench_leg(leg: str, lamb: float):
    from timemachine_tpu.fe.free_energy import get_context
    from timemachine_tpu.fe.rbfe import setup_initial_state
    from timemachine_tpu.fe.single_topology import SingleTopology
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    ff = Forcefield.load_default()
    mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
    st = SingleTopology(mol_a, mol_b, core, ff)
    host = _get_host(leg, mol_a, mol_b, ff)

    state = setup_initial_state(st, lamb, host, TEMP, SEED)
    ctxt = get_context(state)
    n_atoms = state.x0.shape[0]

    ctxt.multiple_steps(N_STEPS)  # compile + settle; same shape as the timed call
    t0 = time.perf_counter()
    ctxt.multiple_steps(N_STEPS)
    elapsed = time.perf_counter() - t0

    ns_per_day = (N_STEPS * DT_PS / 1000.0) / elapsed * 86_400.0
    print(
        json.dumps(
            {
                "metric": f"rbfe_window_{leg}_hif2a_{n_atoms}atoms_lamb{lamb:g}",
                "value": round(ns_per_day, 3),
                "unit": "ns/day",
            }
        ),
        flush=True,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--legs", default="vacuum,solvent,complex")
    parser.add_argument("--lamb", type=float, default=0.0)
    args = parser.parse_args()
    for leg in args.legs.split(","):
        bench_leg(leg.strip(), args.lamb)


if __name__ == "__main__":
    main()
