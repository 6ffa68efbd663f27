import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import warnings; warnings.simplefilter("ignore")
import numpy as np

T0=time.time()
def tick(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)

from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology
from timemachine_tpu.ff import Forcefield
from timemachine_tpu.fe.free_energy import MDParams, HREXParams
from timemachine_tpu.fe.rbfe import run_vacuum

mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
ff = Forcefield.load_default()
md_params = MDParams(n_frames=60, n_eq_steps=2000, steps_per_frame=200, seed=2026,
                     hrex_params=HREXParams(n_frames_bisection=20))
res_fwd = run_vacuum(mol_a, mol_b, core, ff, None, md_params=md_params, n_windows=12, min_overlap=0.667)
dg_fwd = float(np.sum(res_fwd.final_result.dGs)); err_fwd = float(np.linalg.norm(res_fwd.final_result.dG_errs))
tick(f"fwd dG = {dg_fwd:.2f} +- {err_fwd:.2f} kJ/mol ({len(res_fwd.final_result.initial_states)} windows)")

core_rev = core[:, ::-1]
res_rev = run_vacuum(mol_b, mol_a, core_rev, ff, None, md_params=md_params, n_windows=12, min_overlap=0.667)
dg_rev = float(np.sum(res_rev.final_result.dGs)); err_rev = float(np.linalg.norm(res_rev.final_result.dG_errs))
tick(f"rev dG = {dg_rev:.2f} +- {err_rev:.2f} kJ/mol ({len(res_rev.final_result.initial_states)} windows)")

cycle = dg_fwd + dg_rev
cycle_err = float(np.sqrt(err_fwd**2 + err_rev**2))
tick(f"CYCLE CLOSURE: {cycle:.2f} +- {cycle_err:.2f} kJ/mol (should be ~0 within ~2-3 sigma)")
