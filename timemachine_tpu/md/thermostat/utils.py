"""(ref timemachine/md/thermostat/utils.py)"""

from timemachine_tpu.md.utils import sample_velocities

__all__ = ["sample_velocities"]
