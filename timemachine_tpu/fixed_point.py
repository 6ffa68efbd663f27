"""Fixed-point <-> float converters (ref timemachine/lib/fixed_point.py and
cpp/src/fixed_point.hpp:5-26).

The reference accumulates forces into uint64 fixed point (x 2^FIXED_BITS)
to make GPU reductions bitwise deterministic. On TPU this framework does not
need fixed-point accumulation — XLA reductions are deterministic for a fixed
(program, topology) — but the converters are kept so analysis code and tests
that reason about the reference's overflow -> NaN -> +inf MBAR semantics
(free_energy.py:843-855 in the reference) can round-trip values identically.
"""

import numpy as np

FIXED_BITS = 36
FIXED_EXPONENT = 2**FIXED_BITS


def fixed_to_float(v):
    """uint64 fixed-point -> float64 (ref fixed_point.hpp FIXED_TO_FLOAT).

    Host-side numpy on purpose: must be 64-bit regardless of jax_enable_x64."""
    return np.float64(np.asarray(v, dtype=np.uint64).astype(np.int64)) / FIXED_EXPONENT


def float_to_fixed(v):
    """float -> uint64 fixed-point (ref k_fixed_point.cuh FLOAT_TO_FIXED)."""
    return np.asarray(np.float64(v) * FIXED_EXPONENT, dtype=np.int64).astype(np.uint64)
