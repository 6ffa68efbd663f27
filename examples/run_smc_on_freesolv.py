"""Absolute hydration free energies on FreeSolv via SMC.

Parity target: reference examples/run_smc_on_freesolv.py.
"""

# allow running as a script from anywhere without installing the package
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import functools
import pickle
from pathlib import Path

import numpy as np
from scipy.special import logsumexp

from timemachine_tpu.constants import BOLTZ, KCAL_TO_KJ
from timemachine_tpu.fe.absolute_hydration import set_up_ahfe_system_for_smc
from timemachine_tpu.fe.utils import get_mol_name
from timemachine_tpu.ff import Forcefield
from timemachine_tpu.md.smc import (
    fixed_find_next_lambda,
    get_endstate_samples_from_smc_result,
    sequential_monte_carlo,
)
from timemachine_tpu.parallel.client import DevicePoolClient, FileClient, get_device_count
from timemachine_tpu.testsystems import fetch_freesolv

temperature = 300


def parse_options():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_walkers", type=int, default=100)
    parser.add_argument("--n_windows", type=int, default=100)
    parser.add_argument("--n_md_steps", type=int, default=100)
    parser.add_argument("--resample_thresh", type=float, default=0.6)
    parser.add_argument("--debug_mode", type=bool, default=False)
    parser.add_argument("--n_mols", type=int)
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--result_path", type=str, default=".")
    parser.add_argument("--exclude_mols", type=str, nargs="+", default=[])
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--ff", type=str, default=None)
    return parser.parse_args()


def get_result_path(mol_id: str) -> str:
    return f"summary_smc_result_{mol_id}.pkl"


def save_smc_result(file_client, mol, smc_result, cmd_args, save_full_trajectories=False):
    """(ref run_smc_on_freesolv.py:76-128)"""
    summary = dict(
        mol=mol,
        cmd_args=cmd_args,
        initial_samples_refined=smc_result["initial_samples_refined"],
        initial_log_weights=smc_result["log_weights_traj"][0],
        final_samples_refined=smc_result["final_samples_refined"],
        final_log_weights=smc_result["log_weights_traj"][-1],
        ancestry_traj=smc_result["ancestry_traj"],
        incremental_log_weights_traj=smc_result["incremental_log_weights_traj"],
    )
    if save_full_trajectories:
        summary["initial_samples"] = smc_result["traj"][0]
        summary["final_samples"] = smc_result["traj"][-1]
    file_client.store(get_result_path(get_mol_name(mol)), pickle.dumps(summary))
    if save_full_trajectories:
        file_client.store(f"full_smc_traj_{get_mol_name(mol)}.pkl", pickle.dumps(smc_result))


def run_on_freesolv_mol(file_client, mol, ff, cmd_args) -> str:
    name = get_mol_name(mol)
    expt_dg = mol.props.get("dG", "n/a")
    print(f"running on molecule {name}, dG={expt_dg} kcal/mol")

    samples, lambdas, propagate, log_prob, resample = set_up_ahfe_system_for_smc(
        mol,
        cmd_args.n_walkers,
        cmd_args.n_windows,
        cmd_args.n_md_steps,
        cmd_args.resample_thresh,
        seed=cmd_args.seed,
        ff=ff,
    )
    find_next = functools.partial(fixed_find_next_lambda, log_prob=log_prob, lambdas=lambdas)
    smc_result = sequential_monte_carlo(samples, propagate, log_prob, resample, find_next)

    log_weights = smc_result["log_weights_traj"][-1]
    reduced_dG = -logsumexp(log_weights - np.log(len(log_weights)))
    dG = reduced_dG * (BOLTZ * temperature) / KCAL_TO_KJ
    print(f"predicted: {dG:.3f} kcal/mol; experimental: {expt_dg} kcal/mol")

    initial_refined, final_refined = get_endstate_samples_from_smc_result(smc_result, propagate, lambdas)
    smc_result["initial_samples_refined"] = initial_refined
    smc_result["final_samples_refined"] = final_refined

    save_smc_result(file_client, mol, smc_result, cmd_args, save_full_trajectories=cmd_args.debug_mode)
    return get_result_path(name)


def main():
    cmd_args = parse_options()
    mols = fetch_freesolv(n_mols=cmd_args.n_mols, exclude_mols=set(cmd_args.exclude_mols))

    Path(cmd_args.result_path).mkdir(exist_ok=True, parents=True)
    n_devices = cmd_args.n_devices or get_device_count()
    client = DevicePoolClient(n_devices)
    client.verify()
    file_client = FileClient(Path(cmd_args.result_path))
    print(f"using {n_devices} devices")

    ff = Forcefield.load_from_file(cmd_args.ff) if cmd_args.ff else Forcefield.load_default()
    futures = [client.submit(run_on_freesolv_mol, file_client, mol, ff, cmd_args) for mol in mols]
    paths = [fut.result() for fut in futures]
    print("results:", paths)


if __name__ == "__main__":
    main()
