"""Small shared utilities (parity: reference timemachine/utils.py)."""

from __future__ import annotations

from typing import Iterator, Sequence


def batches(n: int, batch_size: int) -> Iterator[int]:
    """Sizes of consecutive batches covering n items (ref utils.py:6)."""
    assert n >= 0
    assert batch_size > 0
    quot, rem = divmod(n, batch_size)
    for _ in range(quot):
        yield batch_size
    if rem:
        yield rem


def not_ragged(xss: Sequence[Sequence]) -> bool:
    return all(len(xs) == len(xss[0]) for xs in xss)


def pairwise_transform_and_combine(xs, transform, combine):
    out = xs[0]
    for x in xs[1:]:
        out = combine(out, transform(x))
    return out
