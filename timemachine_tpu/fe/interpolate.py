"""Alignment + interpolation of per-term parameters between end states.

Parity target: reference timemachine/fe/interpolate.py — align (idxs, params)
sets by key (filling defaults for terms present in only one state), then
interpolate inside per-term λ windows (`pad`)."""

from __future__ import annotations

from collections.abc import Iterable
from functools import partial
from typing import Callable

import jax.numpy as jnp


class DuplicateAlignmentKeysError(RuntimeError):
    pass


def to_hashable(x):
    return tuple(to_hashable(e) for e in x) if isinstance(x, Iterable) else x


def align_idxs_and_params(
    src_idxs,
    src_params,
    dst_idxs,
    dst_params,
    make_default: Callable,
    key: Callable = lambda idxs, _: idxs,
    get_idxs: Callable = lambda key: key,
    validate_idxs: Callable = lambda _: None,
):
    """Align two (idxs, params) sets on a key; missing entries are filled by
    make_default applied to the opposite end state's params
    (ref interpolate.py:22-109). Returns set of (idxs, src_params, dst_params)."""
    for all_idxs in (src_idxs, dst_idxs):
        for idxs in all_idxs:
            validate_idxs(idxs)

    def make_kv(all_idxs, all_params):
        kvs = [(to_hashable(key(idxs, params)), params) for idxs, params in zip(all_idxs, all_params)]
        ks = [k for k, _ in kvs]
        if len(set(ks)) < len(ks):
            raise DuplicateAlignmentKeysError()
        return dict(kvs)

    src_kv = make_kv(src_idxs, src_params)
    dst_kv = make_kv(dst_idxs, dst_params)

    return {
        (
            get_idxs(k),
            to_hashable(src_kv[k]) if k in src_kv else make_default(dst_kv[k]),
            to_hashable(dst_kv[k]) if k in dst_kv else make_default(src_kv[k]),
        )
        for k in set(src_kv) | set(dst_kv)
    }


def assert_canonical_bond(bond):
    assert bond[0] < bond[-1]


align_harmonic_bond_idxs_and_params = partial(
    align_idxs_and_params,
    make_default=lambda p: (0, p[1]),
    validate_idxs=assert_canonical_bond,
)
align_harmonic_angle_idxs_and_params = partial(align_idxs_and_params, make_default=lambda p: (0, p[1], 0))
align_nonbonded_idxs_and_params = partial(align_idxs_and_params, make_default=lambda _: (0, 0, 0, 0))
align_chiral_atom_idxs_and_params = partial(align_idxs_and_params, make_default=lambda _: 0)
align_proper_idxs_and_params = partial(
    align_idxs_and_params,
    make_default=lambda p: (0, p[1], p[2]),
    key=lambda idxs, p: (idxs, p[1], p[2]),  # align on idxs + (phase, period)
    get_idxs=lambda key: key[0],
)
align_improper_idxs_and_params = partial(align_idxs_and_params, make_default=lambda p: (0, p[1], p[2]))


def align_chiral_bond_idxs_and_params(src_idxs, src_params, src_signs, dst_idxs, dst_params, dst_signs):
    return {
        (idxs, sign, p1, p2)
        for idxs, (sign, p1), (_, p2) in align_idxs_and_params(
            src_idxs,
            list(zip(src_signs, src_params)),
            dst_idxs,
            list(zip(dst_signs, dst_params)),
            make_default=lambda p: (p[0], 0),
            key=lambda idxs, p: (idxs, p[0]),
            get_idxs=lambda key: key[0],
        )
    }


def linear_interpolation(src_params, dst_params, lamb):
    return (1 - lamb) * src_params + lamb * dst_params


def log_linear_interpolation(src_params, dst_params, lamb, min_value):
    """Linear in log space; clipped below at min_value so a 0 force constant
    interpolates stably (ref interpolate.py:156-170)."""
    src_params = jnp.maximum(src_params, min_value)
    dst_params = jnp.maximum(dst_params, min_value)
    return jnp.exp(linear_interpolation(jnp.log(src_params), jnp.log(dst_params), lamb))


def pad(f, src_params, dst_params, lamb, lambda_min, lambda_max):
    """Apply f on the rescaled interval (lambda_min, lambda_max); pin to the
    end-state values outside it (ref interpolate.py:173-186)."""
    return jnp.where(
        lamb <= lambda_min,
        src_params,
        jnp.where(
            lambda_max <= lamb,
            dst_params,
            f(src_params, dst_params, (lamb - lambda_min) / (lambda_max - lambda_min)),
        ),
    )
