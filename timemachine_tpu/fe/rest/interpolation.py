"""λ-schedules on [0, 1] for REST energy scaling.

Capability target: reference timemachine/fe/rest/interpolation.py (Linear /
Quadratic / Exponential / Symmetric families).

Unified here instead of one class per shape: every supported schedule is a
linear blend under a monotone warp w,

    f(x) = w⁻¹((1 − x)·w(src) + x·w(dst))

with w = identity ("linear"), sqrt ("quadratic" — expanding the square
reproduces the reference's single-root quadratic a·(x+b)²), or log
("exponential" — src·(dst/src)^x). The symmetric variant folds λ about 0.5
(f(1 − |2λ − 1|)), giving f(0) = f(1) = src and f(0.5) = dst.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Union

import numpy as np

InterpolationFxnName = Literal["linear", "quadratic", "exponential"]

_WARPS = {
    "linear": (lambda v: v, lambda v: v),
    "quadratic": (np.sqrt, np.square),
    "exponential": (np.log, np.exp),
}


@dataclass(frozen=True)
class Schedule:
    """Warped linear blend from src (x=0) to dst (x=1); endpoints exact."""

    shape: InterpolationFxnName
    src: float
    dst: float

    def __post_init__(self):
        if self.shape not in _WARPS:
            raise ValueError(f"{self.shape} is invalid")
        if self.shape in ("quadratic", "exponential") and not (
            np.all(np.asarray(self.src) > 0) and np.all(np.asarray(self.dst) > 0)
        ):
            raise ValueError(f"{self.shape} schedule requires positive endpoints")

    def __call__(self, x):
        warp, unwarp = _WARPS[self.shape]
        x = np.asarray(x)
        blended = unwarp((1.0 - x) * warp(np.asarray(self.src)) + x * warp(np.asarray(self.dst)))
        # pin endpoints exactly (warp/unwarp roundoff-free at 0 and 1)
        return np.where(x == 0.0, self.src, np.where(x == 1.0, self.dst, blended))


@dataclass(frozen=True)
class Symmetric:
    """Fold the argument about 0.5: g(x) = f(1 − |2x − 1|), so g(0) = g(1)
    = f(0) and g(0.5) = f(1)."""

    f: "InterpolationFxn"

    @property
    def src(self):
        return self.f.src

    @property
    def dst(self):
        return self.f.src

    def __call__(self, x):
        x = np.asarray(x)
        return self.f(1.0 - np.abs(2.0 * x - 1.0))


InterpolationFxn = Union[Schedule, Symmetric]


def Linear(src, dst) -> Schedule:
    return Schedule("linear", src, dst)


def Quadratic(src, dst) -> Schedule:
    return Schedule("quadratic", src, dst)


def Exponential(src, dst) -> Schedule:
    return Schedule("exponential", src, dst)


def get_interpolation_fxn(name: InterpolationFxnName, src, dst) -> Schedule:
    return Schedule(name, src, dst)
