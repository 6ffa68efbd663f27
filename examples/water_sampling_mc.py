"""Water sampling demonstration: TIBD exchange moves + MD on a solvated box,
tracking sphere occupancy and density.

Parity target: reference examples/water_sampling_mc.py (buckyball/BRD4 PDB
systems there; here the native water builder provides the host so the demo
runs without OpenMM).
"""

# allow running as a script from anywhere without installing the package
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse

import numpy as np

from timemachine_tpu.constants import AVOGADRO, DEFAULT_TEMP
from timemachine_tpu.fe.model_utils import apply_hmr
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.builders import build_water_system
from timemachine_tpu.md.context import Context
from timemachine_tpu.md.exchange.exchange_mover import delta_r_np
from timemachine_tpu.md.exchange.targeted_insertion import TIBDExchangeMove


def compute_density(n_waters, box):
    """kg/m^3 (ref water_sampling_common.py:66-71)."""
    box_vol = np.prod(np.diag(box))
    return n_waters * 18.01528 * 1e27 / (box_vol * AVOGADRO * 1000)


def compute_occupancy(x_t, box_t, center_idxs, threshold):
    """Waters within threshold of the centroid of center_idxs
    (ref water_sampling_common.py:74-85)."""
    centroid = np.mean(x_t[center_idxs], axis=0)
    dijs = np.linalg.norm(delta_r_np(centroid[None, :], x_t, box_t), axis=-1)
    return int(np.sum(dijs < threshold))


def main():
    parser = argparse.ArgumentParser(description="Water sampling with targeted-insertion MC")
    parser.add_argument("--box_width", type=float, default=2.6)
    parser.add_argument("--radius", type=float, default=0.6)
    parser.add_argument("--n_iterations", type=int, default=20)
    parser.add_argument("--md_steps_per_batch", type=int, default=100)
    parser.add_argument("--mc_proposals_per_batch", type=int, default=200)
    parser.add_argument("--seed", type=int, default=2024)
    args = parser.parse_args()

    host_config = build_water_system(args.box_width)
    n = host_config.conf.shape[0]
    bps = host_config.host_system.get_U_fns()
    water_idxs = np.arange(n).reshape(-1, 3)
    center_idxs = np.array([0, 1, 2], dtype=np.int32)

    print(f"{n} atoms; initial density {compute_density(n // 3, host_config.box):.1f} kg/m^3")

    mover = TIBDExchangeMove(
        n_atoms=n,
        ligand_idxs=center_idxs,
        water_idxs=[g for g in water_idxs[1:]],
        params=np.asarray(host_config.host_system.nonbonded_all_pairs.params),
        temperature=DEFAULT_TEMP,
        beta=2.0,
        cutoff=1.2,
        radius=args.radius,
        seed=args.seed,
        n_proposals=args.mc_proposals_per_batch,
        interval=args.md_steps_per_batch,
    )

    masses = apply_hmr(host_config.masses, host_config.host_system.bond.potential.idxs)
    intg = LangevinIntegrator(DEFAULT_TEMP, 2.5e-3, 1.0, masses, seed=args.seed + 1)
    ctxt = Context(host_config.conf, np.zeros((n, 3)), host_config.box, intg, bps, movers=[mover])

    for it in range(args.n_iterations):
        ctxt.multiple_steps(args.md_steps_per_batch)
        occ = compute_occupancy(ctxt.get_x_t(), ctxt.get_box(), center_idxs, args.radius)
        st = ctxt._mover_states[0]
        print(
            f"iter {it:3d} | occupancy {occ:3d} | water moves {int(st.n_accepted)}/{int(st.n_proposed)} "
            f"| density {compute_density(n // 3, ctxt.get_box()):.1f} kg/m^3"
        )


if __name__ == "__main__":
    main()
