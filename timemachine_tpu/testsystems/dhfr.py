"""Solvated DHFR (23,558 atoms) benchmark system (ref timemachine/testsystems/dhfr.py).

The reference parameterizes 5dfr_solv_equil.pdb through OpenMM's
amber99sbildn (dhfr.py:9-23). This framework builds the SAME solvated
protein system natively: the protein graph is perceived from the PDB
(chem/pdb.py), parameterized with the shipped reconstructed amber99sb set
(ff/params/amber99sb.xml via ff/amber_xml.py — Amber host physics, no
OpenMM), and the 7023 pre-equilibrated waters + CRYST1 box are kept as
shipped. The system composition (protein + equilibrated solvent, atom
count, box) and the host physics class match the reference benchmark's
(ILDN chi corrections excepted — see scripts/gen_amber99sb.py).

`setup_dhfr_scale_waterbox` remains as the pure-water fallback host."""

import os

import numpy as np

from timemachine_tpu.md import builders
from timemachine_tpu.testsystems.data import path_to_data

_REPO_CACHE = os.path.join(os.path.dirname(__file__), "cache", "dhfr_native.npz")
_NATIVE_CACHE = os.environ.get(
    "TM_DHFR_CACHE", _REPO_CACHE if os.path.exists(_REPO_CACHE) else "/tmp/tm_dhfr_native.npz"
)


def setup_dhfr(cutoff: float = 1.0):
    """(host_fns, host_masses, host_coords, box) for solvated DHFR
    (ref dhfr.py:9-23): OpenMM/amber99sbildn when available, the native
    SMIRNOFF-host build otherwise."""
    try:
        import openmm  # noqa: F401
    except ImportError:
        cfg = setup_dhfr_native()
        return cfg.host_system.get_U_fns(), cfg.masses, cfg.conf, cfg.box
    pdb_path = path_to_data("data", "5dfr_solv_equil.pdb")
    host_config = builders.build_protein_system(str(pdb_path), "amber99sbildn", "tip3p")
    return host_config.host_system.get_U_fns(), host_config.masses, host_config.conf, host_config.box


def setup_dhfr_native(waters_first: bool = False, cache_path: str = _NATIVE_CACHE) -> builders.HostConfig:
    """Native solvated-DHFR HostConfig. The one-time SMIRKS typing + charge
    pass over the 2489-atom protein takes a few minutes, so the parameterized
    arrays are cached to `cache_path` (set TM_DHFR_CACHE to relocate,
    empty to disable).

    waters_first=True returns the apo-benchmark ordering (solvent leading,
    via builders.permute_host_config_atoms) that enables the analytic water
    bonded fast path in the MD Context."""
    cfg = builders.load_host_config(cache_path) if cache_path and os.path.exists(cache_path) else None
    if cfg is None:
        import warnings

        pdb_path = str(path_to_data("data", "5dfr_solv_equil.pdb"))
        with warnings.catch_warnings():
            warnings.simplefilter("default")
            cfg = builders.build_protein_system(pdb_path, "amber99sbildn", "tip3p")
        if cache_path:
            builders.save_host_config(cfg, cache_path)
    if waters_first:
        n = cfg.conf.shape[0]
        n_p = n - cfg.num_water_atoms
        perm = np.concatenate([np.arange(n_p, n), np.arange(n_p)])
        cfg = builders.permute_host_config_atoms(cfg, perm)
    return cfg


def setup_dhfr_scale_waterbox(n_atoms_target: int = 23_000):
    """DHFR-scale water box: same atom count as the reference's headline
    benchmark system, no protein dependency. Returns a HostConfig."""
    box_width = (n_atoms_target / 3 / 33.3) ** (1 / 3)
    return builders.build_water_system(box_width)
