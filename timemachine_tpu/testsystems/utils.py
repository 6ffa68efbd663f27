"""(ref timemachine/testsystems/utils.py)"""

from typing import Optional

from timemachine_tpu.fe.utils import get_mol_name, read_sdf
from timemachine_tpu.testsystems.data import path_to_data


def fetch_freesolv(n_mols: Optional[int] = None, exclude_mols: Optional[set] = None) -> list:
    """The (optionally truncated/filtered) FreeSolv set (ref utils.py:9-31)."""
    mols = read_sdf(path_to_data("freesolv", "freesolv.sdf"))
    exclude_mols = exclude_mols or set()
    filtered = [mol for mol in mols if get_mol_name(mol) not in exclude_mols]
    return filtered[:n_mols]
