"""Exchange-move helpers (ref timemachine/md/exchange/utils.py)."""

import numpy as np
from scipy.spatial.distance import pdist

from timemachine_tpu.fe.utils import get_romol_conf


def get_radius_of_mol_pair(mol_a, mol_b) -> float:
    """Half the diameter (max pairwise atom distance) of the two mols'
    conformers taken together (ref exchange/utils.py:8-14)."""
    conf = np.concatenate([get_romol_conf(mol_a), get_romol_conf(mol_b)])
    return 0.5 * float(pdist(conf).max())
