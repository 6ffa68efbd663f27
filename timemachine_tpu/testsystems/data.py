"""Locate public benchmark data files (ref timemachine/testsystems/data/).

The reference checkout's data directory is used directly when mounted;
set TIMEMACHINE_TPU_DATA to point elsewhere."""

import os
from pathlib import Path

_CANDIDATES = [
    os.environ.get("TIMEMACHINE_TPU_DATA"),
    "/root/reference/timemachine/testsystems",
]


def data_dir() -> Path:
    for c in _CANDIDATES:
        if c and Path(c).exists():
            return Path(c)
    raise FileNotFoundError(
        "benchmark data directory not found; set TIMEMACHINE_TPU_DATA to a checkout of the public test data"
    )


def path_to_data(*parts) -> Path:
    p = data_dir().joinpath(*parts)
    if not p.exists():
        raise FileNotFoundError(str(p))
    return p
