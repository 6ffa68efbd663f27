"""Per-component batched energy evaluation over trajectories.

Parity target: reference timemachine/fe/energy_decomposition.py, with the
CUDA `execute_batch` replaced by a jitted scan over frames (chunked to bound
memory) — the u_kln workhorse of the analysis stage."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Generic, Sequence, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.constants import BOLTZ, DEFAULT_TEMP

Frames = TypeVar("Frames")


@dataclass
class EnergyDecomposedState(Generic[Frames]):
    """Samples (frames, boxes) + per-component reduced energy functions."""

    frames: Frames
    boxes: list
    batch_u_fns: Sequence[Callable]


def make_batch_u_fn(potential, params, kBT: float, chunk_size: int = 50):
    """(frames, boxes) -> reduced energies, evaluated as a jitted lax.map.
    NaN energies (overflow semantics) pass through for the caller to inf-mask."""
    params_j = jnp.asarray(params)

    @jax.jit
    def batched(xs, boxes):
        def one(args):
            x, box = args
            return potential(x, params_j, box)

        return jax.lax.map(one, (xs, boxes))

    def batch_u_fn(xs, boxes):
        xs = np.asarray(xs)
        boxes = np.asarray(boxes)
        us = []
        for start in range(0, len(xs), chunk_size):
            us.append(np.asarray(batched(jnp.asarray(xs[start : start + chunk_size]), jnp.asarray(boxes[start : start + chunk_size]))))
        return np.concatenate(us) / kBT

    return batch_u_fn


def get_batch_u_fns(pots, params, temperature: float = DEFAULT_TEMP):
    """(ref energy_decomposition.py:28-69)"""
    kBT = temperature * BOLTZ
    assert len(pots) == len(params)
    return [make_batch_u_fn(pot, p, kBT) for pot, p in zip(pots, params)]


def compute_energy_decomposed_u_kln(states: list) -> np.ndarray:
    """u_kln_by_component[comp, k, l, n]: sample n of state k under energy
    fn l (ref energy_decomposition.py:72-108)."""
    k_states = len(states)
    n_frames = len(states[0].frames)
    n_components = len(states[0].batch_u_fns)
    for state in states:
        assert len(state.frames) == n_frames
        assert len(state.batch_u_fns) == n_components

    u_kln = np.zeros((n_components, k_states, k_states, n_frames))
    for k in range(k_states):
        xs, boxes = np.array(states[k].frames), states[k].boxes
        for l in range(k_states):
            for comp in range(n_components):
                u_kln[comp, k, l] = states[l].batch_u_fns[comp](xs, boxes)
    return u_kln
