"""Simulation state containers (ref timemachine/md/states.py:5)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np


class CoordsVelBox(NamedTuple):
    coords: jax.Array | np.ndarray
    velocities: jax.Array | np.ndarray
    box: jax.Array | np.ndarray
