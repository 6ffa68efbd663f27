"""Exchange-move helpers (ref timemachine/md/exchange/utils.py)."""

import numpy as np

from timemachine_tpu.fe.utils import get_romol_conf


def get_radius_of_mol_pair(mol_a, mol_b) -> float:
    """Half the max pairwise distance across both mols' conformers
    (ref exchange/utils.py:8-14)."""
    conf = np.concatenate([get_romol_conf(mol_a), get_romol_conf(mol_b)])
    diameter = np.max(np.linalg.norm(conf[:, None, :] - conf[None, :, :], axis=-1))
    return diameter / 2
