"""Shared helpers for the water-sampling examples
(ref examples/water_sampling_common.py).

The reference demos load a buckyball-in-water PDB; here the probe cavity is
built natively: an embedded ligand (default: adamantane-like cage via SMILES)
solvated by the native water builder, decoupled via the 4D lambda coordinate.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import numpy as np

from timemachine_tpu.constants import AVOGADRO
from timemachine_tpu.md.exchange.exchange_mover import delta_r_np

DEFAULT_BB_RADIUS = 0.46  # ref water_sampling_common.py:20


def compute_density(n_waters, box):
    """kg/m^3 (ref water_sampling_common.py:66-71)."""
    box_vol = np.prod(np.diag(box))
    return n_waters * 18.01528 * 1e27 / (box_vol * AVOGADRO * 1000)


def compute_occupancy(x_t, box_t, ligand_idxs, threshold):
    """Number of atoms within threshold of the ligand centroid
    (ref water_sampling_common.py:74-85)."""
    centroid = np.mean(x_t[ligand_idxs], axis=0)
    dijs = np.linalg.norm(delta_r_np(centroid[None, :], x_t, box_t), axis=-1)
    return int(np.sum(dijs < threshold))


def build_probe_in_water(smiles="C1C2CC3CC1CC(C2)C3", box_width=3.0, seed=2024):
    """Embedded probe molecule solvated in a native water box. Returns
    (mol, host_config)."""
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.chem.embed import embed_mol
    from timemachine_tpu.md.builders import build_water_system

    mol = mol_from_smiles(smiles, add_hs=True, name="probe")
    embed_mol(mol, seed=seed)
    host_config = build_water_system(box_width, mols=[mol])
    return mol, host_config
