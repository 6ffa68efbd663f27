"""Split the solvent RBFE-window step cost by potential subset (dt=0, same
methodology as probe_dhfr.py). Uses the cached bench_rbfe solvent host.

    nohup timeout 3600 python scripts/probe_window.py > /tmp/probe_window.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_state():
    from bench_rbfe import _get_host
    from timemachine_tpu.fe.rbfe import setup_initial_state
    from timemachine_tpu.fe.single_topology import SingleTopology
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    ff = Forcefield.load_default()
    mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
    st = SingleTopology(mol_a, mol_b, core, ff)
    host = _get_host("solvent", mol_a, mol_b, ff)
    return setup_initial_state(st, 0.0, host, 300.0, 2026)


def run(state, variant):
    import jax

    from timemachine_tpu.fe.free_energy import get_context
    from timemachine_tpu.integrators import LangevinIntegrator

    bps = list(state.potentials)
    names = [type(bp.potential).__name__ for bp in bps]
    if variant == "nb_only":
        keep = [i for i, nm in enumerate(names) if nm == "Nonbonded"]
    elif variant == "no_nb":
        keep = [i for i, nm in enumerate(names) if nm != "Nonbonded"]
    else:
        keep = list(range(len(bps)))
    bps = [bps[i] for i in keep]

    intg = state.integrator
    frozen = LangevinIntegrator(intg.temperature, 0.0, intg.friction, intg.masses, intg.seed)
    from dataclasses import replace

    st2 = replace(state, potentials=bps, integrator=frozen, barostat=state.barostat)
    ctxt = get_context(st2)
    n_steps = 1000
    ctxt.multiple_steps(n_steps)
    t0 = time.perf_counter()
    ctxt.multiple_steps(n_steps)
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{variant:10s} kept={ [names[i] for i in keep] } {dt*1e3:7.3f} ms/step", flush=True)


def main():
    state = build_state()
    for variant in ("full", "nb_only", "no_nb"):
        run(state, variant)


if __name__ == "__main__":
    main()
