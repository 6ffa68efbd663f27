"""First complex-leg RBFE executed end-to-end ON TPU with the shipped Amber
host physics (round 5): the real hif2a pair on the real hif2a receptor
(ref testsystems/data/hif2a_nowater_min.pdb) through the production
run_complex driver (native protein build -> solvation -> FIRE+pre-equil ->
bisection -> replica-parallel HREX -> pair BAR) at smoke settings.

This is a PLUMBING-AT-SCALE record (finite dGs, healthy diagnostics), not
an accuracy claim — complex legs need production sampling for that.
-> results/rbfe_complex_smoke.json

Run: timeout 3600 python scripts/rbfe_complex_smoke.py
"""

import json
import os
import sys
import time
import warnings
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

RESULTS_DIR = Path(__file__).resolve().parent.parent / "results"
PROTEIN = "/root/reference/timemachine/testsystems/data/hif2a_nowater_min.pdb"


def main():
    from timemachine_tpu.fe.free_energy import HREXParams, MDParams
    from timemachine_tpu.fe.rbfe import run_complex
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    import jax

    mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
    md_params = MDParams(
        n_frames=20, n_eq_steps=2000, steps_per_frame=200, seed=2026,
        hrex_params=HREXParams(n_frames_bisection=5),
    )
    t0 = time.time()
    result, host_config = run_complex(
        mol_a, mol_b, core, Forcefield.load_default(), PROTEIN,
        md_params=md_params, n_windows=6, min_cutoff=None,
    )
    fr = result.final_result
    diag = getattr(result, "hrex_diagnostics", None)
    swap = None
    if diag is not None and getattr(diag, "cumulative_swap_acceptance_rates", None) is not None:
        rates = np.asarray(diag.cumulative_swap_acceptance_rates)
        if rates.size:
            swap = [round(float(r), 4) for r in np.atleast_1d(rates[-1])]
    out = dict(
        kind="rbfe_complex_smoke",
        protein="hif2a_nowater_min.pdb (native amber99sb host physics)",
        n_atoms=int(host_config.conf.shape[0] + mol_a.num_atoms + mol_b.num_atoms),
        platform=str(jax.devices()[0].platform),
        settings=dict(n_frames=20, n_eq_steps=2000, steps_per_frame=200, n_windows=6),
        dg_kj=round(float(np.sum(fr.dGs)), 3),
        err_kj=round(float(np.linalg.norm(fr.dG_errs)), 3),
        dgs_kj=[round(float(d), 3) for d in fr.dGs],
        overlaps=[round(float(o), 4) for o in fr.overlaps] if fr.overlaps is not None else None,
        final_swap_rates=swap,
        wall_s=round(time.time() - t0, 1),
    )
    RESULTS_DIR.mkdir(exist_ok=True)
    (RESULTS_DIR / "rbfe_complex_smoke.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
