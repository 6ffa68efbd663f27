"""(ref timemachine/md/barostat/moves.py) — canonical impls in md/barostat.py
(MonteCarloBarostat, CentroidRescaler) and md/moves.py (NPTMove)."""

from timemachine_tpu.md.barostat import CentroidRescaler, MonteCarloBarostat, scatter_idxs_from_group_idxs
from timemachine_tpu.md.moves import NPTMove

__all__ = ["CentroidRescaler", "MonteCarloBarostat", "NPTMove", "scatter_idxs_from_group_idxs"]
