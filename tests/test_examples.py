"""Every example CLI runs as a subprocess at toy scale (the reference keeps
the same guarantee in tests/test_examples.py:37-70 — examples are product
surface, not documentation).

Marked nightly: each example compiles its own jit programs in a fresh
process (~1-5 min each on CPU)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = REPO / "examples"
HIF2A_SDF = "/root/reference/timemachine/testsystems/fep_benchmark/hif2a/ligands.sdf"

pytestmark = pytest.mark.nightly


def run_example(name: str, cli_args: list[str], timeout: float = 1500) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / name), *cli_args],
        env=env,
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, f"{name} failed:\nstdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    return proc


def test_biphenyl_torsion_sampling_hrex():
    run_example(
        "biphenyl_torsion_sampling_hrex.py",
        ["--n_states", "3", "--n_frames", "4", "--steps_per_frame", "10", "--seed", "2026"],
    )


def test_water_sampling_mc():
    run_example(
        "water_sampling_mc.py",
        [
            "--box_width", "2.6",
            "--n_iterations", "2",
            "--md_steps_per_batch", "10",
            "--mc_proposals_per_batch", "20",
            "--seed", "2026",
        ],
    )


def test_water_sampling_buckyball(tmp_path):
    """The REAL reference buckyball system end-to-end at smoke scale
    (espaloma-charged C90 + 2077-water PDB box, production TIBD mover)."""
    wx = "/root/reference/timemachine/testsystems/water_exchange"
    if not Path(wx).exists():
        pytest.skip("reference water_exchange data absent")
    out = tmp_path / "bb.json"
    run_example(
        "water_sampling_buckyball.py",
        [
            "--water_pdb", f"{wx}/bb_6_waters.pdb",
            "--ligand_sdf", f"{wx}/bb_centered_espaloma.sdf",
            "--iterations", "2",
            "--md_steps_per_batch", "5",
            "--mc_proposals_per_batch", "20",
            "--equilibration_steps", "0",
            "--out_json", str(out),
        ],
    )
    d = json.loads(out.read_text())
    assert d["initial_occupancy"] == 6
    assert len(d["occupancy_trace"]) == 2


def test_water_sampling_hrex():
    run_example(
        "water_sampling_hrex.py",
        [
            "--box_width", "2.6",
            "--n_windows", "2",
            "--n_frames", "3",
            "--steps_per_frame", "10",
            "--n_eq_steps", "20",
            "--water_sampling_interval", "10",
            "--n_proposals", "20",
            "--seed", "2026",
        ],
    )


@pytest.mark.skipif(not Path(HIF2A_SDF).exists(), reason="reference benchmark data absent")
def test_run_rbfe_legs_vacuum(tmp_path):
    run_example(
        "run_rbfe_legs.py",
        [
            "--sdf_path", HIF2A_SDF,
            "--mol_a", "338",
            "--mol_b", "43",
            "--legs", "vacuum",
            "--n_eq_steps", "100",
            "--n_frames", "4",
            "--steps_per_frame", "20",
            "--n_windows", "3",
            "--seed", "2026",
            "--output_dir", str(tmp_path),
        ],
        timeout=2400,
    )


@pytest.mark.skipif(not Path(HIF2A_SDF).exists(), reason="reference benchmark data absent")
def test_relative_free_energy_solvent(tmp_path):
    run_example(
        "relative_free_energy.py",
        [
            "--ligands", HIF2A_SDF,
            "--mol_a_name", "338",
            "--mol_b_name", "43",
            "--protein", "none",
            "--n_frames", "3",
            "--n_eq_steps", "50",
            "--steps_per_frame", "10",
            "--n_windows", "2",
            "--seed", "2026",
            "--legs", "solvent",
            "--output_dir", str(tmp_path),
        ],
        timeout=3600,  # CPU solvent leg: host pre-equilibration dominates
    )


def test_run_smc_on_freesolv(tmp_path):
    freesolv = Path("/root/reference/timemachine/testsystems/freesolv/freesolv.sdf")
    if not freesolv.exists():
        pytest.skip("freesolv data absent")
    run_example(
        "run_smc_on_freesolv.py",
        [
            "--n_walkers", "4",
            "--n_windows", "4",
            "--n_md_steps", "5",
            "--n_mols", "1",
            "--seed", "2026",
            "--result_path", str(tmp_path),
        ],
        timeout=2400,
    )


def test_spatial_md_scaling():
    env_extra = {"XLA_FLAGS": os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"}
    env = dict(os.environ)
    env.update(env_extra)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / "spatial_md_scaling.py"),
         "--box-width", "2.6", "--n-steps", "4", "--mesh-sizes", "1", "8"],
        env=env, cwd=str(REPO), capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, f"spatial_md_scaling failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    assert "mesh=8" in proc.stdout
