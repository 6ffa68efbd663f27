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


_batched_u_cache: dict = {}


def _batched_u_for(potential):
    """One jitted batched-energy program per POTENTIAL (params is a traced
    argument): building a fresh jit per (potential, params) pair — one per
    lambda window — accumulates unbounded compile caches over long schedules
    (observed mmap exhaustion after ~10 bisections)."""
    if potential not in _batched_u_cache:

        @jax.jit
        def batched(xs, boxes, p):
            def one(args):
                x, box = args
                return potential(x, p, box)

            return jax.lax.map(one, (xs, boxes))

        _batched_u_cache[potential] = batched
    return _batched_u_cache[potential]


def make_batch_u_fn(potential, params, kBT: float, chunk_size: int = 50):
    """(frames, boxes) -> reduced energies, evaluated as a jitted lax.map.
    NaN energies (overflow semantics) pass through for the caller to inf-mask.
    The final chunk is padded to chunk_size so every call shares one compiled
    shape."""
    params_j = jnp.asarray(params)
    batched = _batched_u_for(potential)

    def batch_u_fn(xs, boxes):
        xs = np.asarray(xs)
        boxes = np.asarray(boxes)
        us = []
        for start in range(0, len(xs), chunk_size):
            xs_c = xs[start : start + chunk_size]
            boxes_c = boxes[start : start + chunk_size]
            n_real = len(xs_c)
            # Corrupt-frame poisoning (ref fixed_point.hpp overflow->NaN and
            # free_energy.py:843-855 NaN->+inf in MBAR): the energy kernels
            # use where-guards for d==0 gradient safety, which also swallow
            # NaN coordinates into finite energies — restore NaN semantics
            # here, the layer whose output feeds MBAR.
            bad = ~np.isfinite(xs_c).all(axis=(1, 2))
            # a non-finite box is just as corrupt as non-finite coords: the
            # kernels' where-guards could fold it into a finite energy
            bad |= ~np.isfinite(boxes_c).reshape(len(boxes_c), -1).all(axis=1)
            if bad.any():
                xs_c = np.where(bad[:, None, None], 0.0, xs_c)  # keep math finite
                boxes_c = np.where(bad[:, None, None], np.eye(3, dtype=boxes_c.dtype) * 10.0, boxes_c)
            if n_real < chunk_size:  # pad to the shared shape
                xs_c = np.concatenate([xs_c, np.repeat(xs_c[-1:], chunk_size - n_real, axis=0)])
                boxes_c = np.concatenate([boxes_c, np.repeat(boxes_c[-1:], chunk_size - n_real, axis=0)])
            out = np.asarray(batched(jnp.asarray(xs_c), jnp.asarray(boxes_c), params_j))
            out = out[:n_real]
            if bad.any():
                out = np.where(bad, np.nan, out)
            us.append(out)
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
