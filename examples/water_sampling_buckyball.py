"""Targeted-insertion water sampling on the reference's REAL buckyball
systems (VERDICT r4 item 4).

Loads the pre-equilibrated pure-water boxes
(/root/reference/timemachine/testsystems/water_exchange/bb_{K}_waters.pdb,
2077 waters, 4.0 nm box, exactly K waters inside the C90-buckyball cavity
region) and the espaloma-charged C90 buckyball
(bb_centered_espaloma.sdf, charges read from atom.dprop.PartialCharge),
then alternates NPT MD batches with production TIBD exchange moves targeted
at the buckyball cavity — the reference's examples/water_sampling_mc.py
nightly workflow (ref tests/test_examples.py:173-218). Per the reference's
README, the espaloma-charged buckyball equilibrates at 1-2 interior waters:
starting from K=0 (empty) and K=6 (overfilled) must converge to the same
occupancy band.

Usage:
  python examples/water_sampling_buckyball.py \
      --water_pdb /root/reference/timemachine/testsystems/water_exchange/bb_6_waters.pdb \
      --ligand_sdf /root/reference/timemachine/testsystems/water_exchange/bb_centered_espaloma.sdf \
      --iterations 40 --md_steps_per_batch 1000 --mc_proposals_per_batch 2000 \
      --out_json occupancy_trace.json
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np

DEFAULT_BB_RADIUS = 0.46  # ref examples/water_sampling_common.py:20


def compute_occupancy(x_t, box_t, ligand_idxs, water_oxygens, threshold):
    """Number of sampler-water oxygens within threshold of the ligand
    centroid (ref water_sampling_common.py:74-85, counted per water)."""
    from timemachine_tpu.md.exchange.exchange_mover import delta_r_np

    centroid = np.mean(x_t[ligand_idxs], axis=0)
    dijs = np.linalg.norm(delta_r_np(centroid[None, :], x_t[water_oxygens], box_t), axis=-1)
    return int(np.sum(dijs < threshold))


def build_buckyball_state(water_pdb: str, ligand_sdf: str, seed: int, use_hmr: bool = True):
    """InitialState for the coupled (λ=0) buckyball-in-water system, ligand
    appended after the waters (ref examples/water_sampling_common.py
    get_initial_state)."""
    from timemachine_tpu.chem import read_sdf
    from timemachine_tpu.constants import DEFAULT_PRESSURE, DEFAULT_TEMP
    from timemachine_tpu.fe import model_utils
    from timemachine_tpu.fe.free_energy import AbsoluteFreeEnergy, InitialState
    from timemachine_tpu.fe.topology import BaseTopology
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.integrators import LangevinIntegrator
    from timemachine_tpu.md.barostat import MonteCarloBarostat
    from timemachine_tpu.md.barostat.utils import get_bond_list, get_group_indices
    from timemachine_tpu.md.builders import build_water_system_from_pdb
    from timemachine_tpu.potentials import HarmonicBond, get_potential_by_type

    host_config = build_water_system_from_pdb(water_pdb)
    host_config.box += np.diag([0.1, 0.1, 0.1])  # clash slack (ref :90)

    mol = read_sdf(ligand_sdf)[0]
    ff = Forcefield.load_precomputed_default()
    afe = AbsoluteFreeEnergy(mol, BaseTopology(mol, ff))
    ubps, params, masses = afe.prepare_host_edge(ff, host_config, lamb=0.0)
    bps = [ubp.bind(p) for ubp, p in zip(ubps, params)]
    x0 = afe.prepare_combined_coords(host_coords=host_config.conf)
    v0 = np.zeros_like(x0)

    bond_pot = get_potential_by_type(ubps, HarmonicBond)
    if use_hmr:
        final_masses = model_utils.apply_hmr(masses, bond_pot.idxs)
        dt = 2.5e-3
    else:
        final_masses = masses
        dt = 1e-3
    groups = get_group_indices(get_bond_list(bond_pot), len(masses))
    barostat = MonteCarloBarostat(len(masses), DEFAULT_PRESSURE, DEFAULT_TEMP, groups, 25, seed + 1)
    integrator = LangevinIntegrator(DEFAULT_TEMP, dt, 1.0, final_masses, seed)

    n_lig = mol.num_atoms
    ligand_idxs = np.arange(len(x0) - n_lig, len(x0), dtype=np.int32)
    return InitialState(
        bps, integrator, barostat, x0, v0, host_config.box, 0.0, ligand_idxs, np.array([], dtype=np.int32)
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--water_pdb", required=True)
    parser.add_argument("--ligand_sdf", required=True)
    parser.add_argument("--iterations", type=int, default=40)
    parser.add_argument("--md_steps_per_batch", type=int, default=1000)
    parser.add_argument("--mc_proposals_per_batch", type=int, default=2000)
    parser.add_argument("--equilibration_steps", type=int, default=5000)
    parser.add_argument("--seed", type=int, default=2024)
    parser.add_argument("--radius", type=float, default=DEFAULT_BB_RADIUS)
    parser.add_argument("--out_json", default=None)
    args = parser.parse_args()

    from timemachine_tpu.fe.free_energy import MDParams, WaterSamplingParams, get_context

    state = build_buckyball_state(args.water_pdb, args.ligand_sdf, args.seed)
    md_params = MDParams(
        n_frames=args.iterations,
        n_eq_steps=args.equilibration_steps,
        steps_per_frame=args.md_steps_per_batch,
        seed=args.seed,
        water_sampling_params=WaterSamplingParams(
            interval=args.md_steps_per_batch,
            n_proposals=args.mc_proposals_per_batch,
            batch_size=min(250, args.mc_proposals_per_batch),
            radius=args.radius,
        ),
    )
    ctxt = get_context(state, md_params)

    n_water_atoms = len(state.x0) - len(state.ligand_idxs)
    water_oxygens = np.arange(0, n_water_atoms, 3)

    occ0 = compute_occupancy(state.x0, state.box0, state.ligand_idxs, water_oxygens, args.radius)
    print(f"{len(state.x0)} atoms; initial occupancy {occ0} waters", flush=True)

    if args.equilibration_steps:
        ctxt.multiple_steps(args.equilibration_steps, store_x_interval=0)

    trace = []
    t0 = time.time()
    for it in range(args.iterations):
        ctxt.multiple_steps(args.md_steps_per_batch, store_x_interval=0)
        x_t, box_t = np.asarray(ctxt.get_x_t()), np.asarray(ctxt.get_box())
        assert np.all(np.isfinite(x_t)), "simulation exploded"
        occ = compute_occupancy(x_t, box_t, state.ligand_idxs, water_oxygens, args.radius)
        trace.append(occ)
        print(f"iter {it}: occupancy {occ} ({(time.time() - t0) / (it + 1):.1f} s/iter)", flush=True)

    result = dict(
        water_pdb=str(args.water_pdb),
        initial_occupancy=occ0,
        occupancy_trace=trace,
        radius=args.radius,
        iterations=args.iterations,
        md_steps_per_batch=args.md_steps_per_batch,
        mc_proposals_per_batch=args.mc_proposals_per_batch,
        seed=args.seed,
        wall_s=round(time.time() - t0, 1),
    )
    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
