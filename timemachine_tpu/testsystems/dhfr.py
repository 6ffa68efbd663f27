"""Solvated DHFR (~23k atoms) benchmark system (ref timemachine/testsystems/dhfr.py).

The reference parameterizes 5dfr_solv_equil.pdb through OpenMM's
amber99sbildn; protein parameterization is gated on OpenMM availability
(md/builders.py build_protein_system). `setup_dhfr_scale_waterbox` provides
the dependency-free ~23k-atom benchmark host used by bench.py."""

import numpy as np

from timemachine_tpu.md import builders
from timemachine_tpu.testsystems.data import path_to_data


def setup_dhfr(cutoff: float = 1.0):
    """(host_fns, host_masses, host_coords, box) for solvated DHFR
    (ref dhfr.py:9-23). Requires OpenMM for amber99sbildn parameterization."""
    try:
        import openmm  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "setup_dhfr requires OpenMM for protein parameterization; "
            "use setup_dhfr_scale_waterbox for the dependency-free benchmark host"
        ) from e
    pdb_path = path_to_data("data", "5dfr_solv_equil.pdb")
    host_config = builders.build_protein_system(str(pdb_path), "amber99sbildn", "tip3p")
    return host_config.host_system.get_U_fns(), host_config.masses, host_config.conf, host_config.box


def setup_dhfr_scale_waterbox(n_atoms_target: int = 23_000):
    """DHFR-scale water box: same atom count as the reference's headline
    benchmark system, no protein dependency. Returns a HostConfig."""
    box_width = (n_atoms_target / 3 / 33.3) ** (1 / 3)
    return builders.build_water_system(box_width)
