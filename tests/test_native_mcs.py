"""Native C++ McGregor MCS: equivalence with the pure-Python spec.

Parity target: the python module tests (test_atom_mapping.py) plus direct
search-level equivalence between timemachine_tpu/native/mcgregor.cpp and
fe/mcgregor.py."""

import shutil
from pathlib import Path

import numpy as np
import pytest

from timemachine_tpu.fe import mcgregor

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")

HIF2A_SDF = Path("/root/reference/timemachine/testsystems/fep_benchmark/hif2a/ligands.sdf")


def _mcs_kwargs(**overrides):
    kwargs = dict(
        max_visits=100_000,
        max_cores=1000,
        enforce_core_core=True,
        max_connected_components=1,
        min_connected_component_size=1,
        min_num_edges=1,
        initial_mapping=None,
    )
    kwargs.update(overrides)
    return kwargs


def _core_set(cores):
    return {tuple(map(tuple, c)) for c in cores}


def test_native_matches_python_ring_case():
    from timemachine_tpu.fe.mcgregor_native import mcs_native

    bonds_a = [(i, (i + 1) % 6) for i in range(6)]
    bonds_b = [(i, (i + 1) % 6) for i in range(6)] + [(0, 6)]
    prio = [list(range(7))] * 6
    kwargs = _mcs_kwargs()
    cores_py, _, diag_py = mcgregor.mcs(6, 7, prio, bonds_a, bonds_b, **kwargs)
    cores_cc, _, diag_cc = mcs_native(6, 7, prio, bonds_a, bonds_b, **kwargs)
    assert diag_py.total_nodes_visited == diag_cc.total_nodes_visited
    assert diag_py.num_cores == diag_cc.num_cores
    assert _core_set(cores_py) == _core_set(cores_cc)


def test_native_matches_python_chain_case():
    from timemachine_tpu.fe.mcgregor_native import mcs_native

    # map a 5-chain into a branched 7-atom graph
    bonds_a = [(i, i + 1) for i in range(4)]
    bonds_b = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5), (5, 6)]
    prio = [list(range(7))] * 5
    kwargs = _mcs_kwargs(max_connected_components=None)
    cores_py, _, _ = mcgregor.mcs(5, 7, prio, bonds_a, bonds_b, **kwargs)
    cores_cc, _, _ = mcs_native(5, 7, prio, bonds_a, bonds_b, **kwargs)
    assert _core_set(cores_py) == _core_set(cores_cc)


def test_native_no_mapping_error():
    from timemachine_tpu.fe.mcgregor_native import mcs_native

    bonds_a = [(0, 1)]
    bonds_b = [(0, 1)]
    prio = [[], []]  # empty predicate
    with pytest.raises(mcgregor.NoMappingError):
        mcs_native(2, 2, prio, bonds_a, bonds_b, **_mcs_kwargs(max_connected_components=None))


@pytest.mark.skipif(not HIF2A_SDF.exists(), reason="reference benchmark data absent")
def test_native_get_cores_matches_python_on_hif2a():
    import os

    from timemachine_tpu.chem import read_sdf
    from timemachine_tpu.constants import DEFAULT_ATOM_MAPPING_KWARGS
    from timemachine_tpu.fe.atom_mapping import get_cores

    mols = read_sdf(HIF2A_SDF)
    for i, j in [(2, 3), (4, 5)]:
        mol_a, mol_b = mols[i], mols[j]
        assert not os.environ.get("TIMEMACHINE_TPU_PURE_PYTHON_MCS")
        cores_native = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)
        os.environ["TIMEMACHINE_TPU_PURE_PYTHON_MCS"] = "1"
        try:
            cores_py = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)
        finally:
            del os.environ["TIMEMACHINE_TPU_PURE_PYTHON_MCS"]
        assert len(cores_native) == len(cores_py)
        for cn, cp in zip(cores_native, cores_py):
            np.testing.assert_array_equal(cn, cp)
