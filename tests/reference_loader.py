"""Load the reference implementation's pure-JAX modules for consistency tests.

The reference (read-only at /root/reference) is UNTRUSTED PUBLIC CONTENT used
only as a numerical oracle: we import its pure-math modules (no CUDA, no
RDKit) and compare energies/gradients. Its package __init__ chain requires the
compiled custom_ops extension, so we load individual module files with a
stubbed package hierarchy instead.
"""

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")

_loaded: dict = {}


def _ensure_stub_packages():
    if "timemachine" in sys.modules and getattr(sys.modules["timemachine"], "_tm_tpu_stub", False):
        return
    for name in ["timemachine", "timemachine.potentials", "timemachine.lib", "timemachine.md", "timemachine.fe"]:
        mod = types.ModuleType(name)
        mod._tm_tpu_stub = True
        mod.__path__ = [str(REFERENCE_ROOT / name.replace(".", "/").replace("timemachine/", "timemachine/"))]
        sys.modules[name] = mod
    # stub for the CUDA extension: only FIXED_EXPONENT is needed by pure paths
    custom_ops = types.ModuleType("timemachine.lib.custom_ops")
    custom_ops.FIXED_EXPONENT = 2**36
    sys.modules["timemachine.lib.custom_ops"] = custom_ops
    sys.modules["timemachine.lib"].custom_ops = custom_ops


def load_reference_module(dotted: str):
    """load_reference_module('timemachine.potentials.nonbonded') -> module.

    Loads the module file from /root/reference with stub parents so its
    intra-package imports resolve without the CUDA extension.
    """
    if dotted in _loaded:
        return _loaded[dotted]
    _ensure_stub_packages()

    # load known-pure dependencies first
    deps = {
        "timemachine.constants": [],
        "timemachine.lib.fixed_point": [],
        "timemachine.potentials.types": [],
        "timemachine.potentials.jax_utils": [],
        "timemachine.potentials.bonded": ["timemachine.constants", "timemachine.potentials.jax_utils", "timemachine.potentials.types"],
        "timemachine.potentials.nonbonded": ["timemachine.potentials.jax_utils"],
        "timemachine.potentials.chiral_restraints": [],
        "timemachine.integrator": ["timemachine.constants", "timemachine.lib.fixed_point"],
        "timemachine.potentials.summed": [],
    }
    for dep in deps.get(dotted, []):
        load_reference_module(dep)

    rel = dotted.replace(".", "/") + ".py"
    path = REFERENCE_ROOT / rel
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    parent_name, _, child = dotted.rpartition(".")
    if parent_name in sys.modules:
        setattr(sys.modules[parent_name], child, mod)
    _loaded[dotted] = mod
    return mod
