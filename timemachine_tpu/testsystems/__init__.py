"""Canned test systems (ref timemachine/testsystems/__init__.py).

Benchmark data files (ligands_40.sdf, freesolv.sdf, 5dfr_solv_equil.pdb) are
public datasets shipped with the reference; they are read from the mounted
reference checkout when present rather than duplicated into this repo."""

from . import gaussian1d  # noqa: F401

try:  # data-dependent modules degrade gracefully when the data is absent
    from . import ligands, relative  # noqa: F401
    from .utils import fetch_freesolv  # noqa: F401

    __all__ = ["fetch_freesolv", "gaussian1d", "ligands", "relative"]
except Exception:  # pragma: no cover
    __all__ = ["gaussian1d"]
