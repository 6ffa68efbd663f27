"""Native C++ runtime components, built on demand with the system toolchain.

The reference ships its CPU-bound hot loops as vendored C++ (hilbert.cpp,
rmsd_align.cpp, the CUDA runtime); here the TPU compute path is JAX/Pallas,
and this package holds the remaining CPU-bound combinatorial kernels —
currently the McGregor MCS search used by atom mapping.

Libraries are compiled once per source hash with `g++ -O3 -shared -fPIC`
and cached under ~/.cache/timemachine_tpu/ (no pybind11: plain C ABI +
ctypes)."""

from __future__ import annotations

import hashlib
import os
import subprocess
from pathlib import Path

_CACHE_DIR = Path(os.environ.get("TIMEMACHINE_TPU_NATIVE_CACHE", Path.home() / ".cache" / "timemachine_tpu"))
_SRC_DIR = Path(__file__).parent


class NativeBuildError(RuntimeError):
    pass


def build_library(name: str) -> Path:
    """Compile native/<name>.cpp into a cached shared library; returns its
    path. Raises NativeBuildError if no working toolchain is available."""
    src = _SRC_DIR / f"{name}.cpp"
    code = src.read_bytes()
    digest = hashlib.sha256(code).hexdigest()[:16]
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    out = _CACHE_DIR / f"{name}-{digest}.so"
    if out.exists():
        return out
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        str(out) + ".tmp",
        str(src),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeBuildError(f"failed to build {src.name}: {detail}") from e
    os.replace(str(out) + ".tmp", out)
    return out
