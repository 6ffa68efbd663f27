"""(ref timemachine/md/barostat/utils.py) — canonical impls in md/utils.py."""

from timemachine_tpu.md.utils import compute_box_center, compute_box_volume, get_bond_list, get_group_indices

__all__ = ["compute_box_center", "compute_box_volume", "get_bond_list", "get_group_indices"]
