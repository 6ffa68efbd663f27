"""Interpolation functions specialized to [0, 1] (ref timemachine/fe/rest/interpolation.py)."""

from dataclasses import dataclass
from typing import Generic, Literal, Protocol, TypeVar

import numpy as np
from numpy.typing import ArrayLike, NDArray


class InterpolationFxn(Protocol):
    @property
    def src(self) -> ArrayLike: ...

    @property
    def dst(self) -> ArrayLike: ...

    def __call__(self, x: ArrayLike) -> NDArray: ...


@dataclass(frozen=True)
class Linear:
    """f(0) = src, f(1) = dst, linear (ref interpolation.py:22-47)."""

    src: ArrayLike
    dst: ArrayLike

    def __call__(self, x: ArrayLike) -> NDArray:
        src = np.asarray(self.src)
        dst = np.asarray(self.dst)
        x = np.asarray(x)
        return (dst - src) * x + src


@dataclass(frozen=True)
class Quadratic:
    """Single-root quadratic through (0, src), (1, dst)
    (ref interpolation.py:50-88)."""

    src: ArrayLike
    dst: ArrayLike

    def __post_init__(self):
        assert np.all(np.asarray(self.src) != np.asarray(self.dst))

    def __call__(self, x: ArrayLike) -> NDArray:
        src = np.asarray(self.src)
        dst = np.asarray(self.dst)
        x = np.asarray(x)
        a = src + dst - 2.0 * np.sqrt(src * dst)
        b = (src + np.sqrt(src * dst)) / (dst - src)
        # exact endpoints (avoid roundoff at 0 and 1)
        return np.where(x == 0.0, self.src, np.where(x == 1.0, self.dst, a * (x + b) ** 2))


@dataclass(frozen=True)
class Exponential:
    """f(x) = src * (dst/src)^x (ref interpolation.py:91-116)."""

    src: ArrayLike
    dst: ArrayLike

    def __call__(self, x: ArrayLike) -> NDArray:
        src = np.asarray(self.src)
        dst = np.asarray(self.dst)
        x = np.asarray(x)
        return src * np.exp(np.log(dst / src) * x)


F = TypeVar("F", bound=InterpolationFxn)


@dataclass(frozen=True)
class Symmetric(Generic[F]):
    """Symmetric(f)(x) == Symmetric(f)(1 − x); hits f's dst at x = 0.5
    (ref interpolation.py:122-156)."""

    f: F

    @property
    def src(self):
        return self.f.src

    @property
    def dst(self):
        return self.f.src

    def __call__(self, x: ArrayLike) -> NDArray:
        x = np.asarray(x)
        return np.where(x < 0.5, self.f(2.0 * x), self.f(2.0 * (1.0 - x)))


InterpolationFxnName = Literal["linear", "quadratic", "exponential"]


def get_interpolation_fxn(name: InterpolationFxnName, src: ArrayLike, dst: ArrayLike) -> InterpolationFxn:
    """(ref interpolation.py:167-177)"""
    if name == "linear":
        return Linear(src, dst)
    if name == "quadratic":
        return Quadratic(src, dst)
    if name == "exponential":
        return Exponential(src, dst)
    raise ValueError(f"{name} is invalid")
