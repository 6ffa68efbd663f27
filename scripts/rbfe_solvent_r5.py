"""First solvated RBFE accuracy artifacts (VERDICT r4 item 2).

1. hif2a edge, SOLVENT leg, both directions (A→B and B→A) through the
   production bisection+HREX driver: the cycle (dG_fwd + dG_rev) must close
   to zero within error — exercising the rowscan hot path at condensed-phase
   scale, the barostat, bisected window placement and replica-parallel HREX
   on real water. -> results/rbfe_hif2a_solvent.json
2. One eg5 benchmark-set edge (first congeneric pair), solvent leg, one
   direction with per-window diagnostics. -> results/rbfe_eg5_solvent.json

Reference analogs: /root/reference/tests/test_hrex_rbfe.py (fixed-output dG
pins on these sets), timemachine/testsystems/fep_benchmark/.

Run: nohup python scripts/rbfe_solvent_r5.py > /tmp/rbfe_solvent_r5.log 2>&1 &
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

SETTINGS = dict(n_frames=60, n_eq_steps=5000, steps_per_frame=400, n_windows=16, min_overlap=0.667)


def _platform():
    import jax

    return str(jax.devices()[0].platform)


def leg_result(res):
    fr = res.final_result
    diag = getattr(res, "hrex_diagnostics", None)
    swap = None
    if diag is not None and getattr(diag, "cumulative_swap_acceptance_rates", None) is not None:
        rates = np.asarray(diag.cumulative_swap_acceptance_rates)
        if rates.size:
            swap = [float(r) for r in np.atleast_1d(rates[-1])]
    return dict(
        dg_kj=float(np.sum(fr.dGs)),
        err_kj=float(np.linalg.norm(fr.dG_errs)),
        dgs_kj=[round(float(d), 3) for d in fr.dGs],
        dg_errs_kj=[round(float(e), 3) for e in fr.dG_errs],
        overlaps=[round(float(o), 4) for o in fr.overlaps] if fr.overlaps is not None else None,
        lambdas=[round(float(s.lamb), 4) for s in fr.initial_states],
        final_swap_rates=swap,
    )


def main():
    import argparse

    from timemachine_tpu.fe.free_energy import HREXParams, MDParams
    from timemachine_tpu.fe.rbfe import run_solvent
    from timemachine_tpu.ff import Forcefield

    parser = argparse.ArgumentParser()
    parser.add_argument("--eg5_only", action="store_true", help="skip the hif2a cycle")
    args = parser.parse_args()

    ff = Forcefield.load_default()
    s = SETTINGS
    md_params = MDParams(
        n_frames=s["n_frames"], n_eq_steps=s["n_eq_steps"], steps_per_frame=s["steps_per_frame"],
        seed=2026, hrex_params=HREXParams(n_frames_bisection=20),
    )

    # -- 1. hif2a solvent cycle ---------------------------------------------
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
    out_path = RESULTS_DIR / "rbfe_hif2a_solvent.json"
    out = dict(kind="rbfe_hif2a_solvent_cycle", settings=s, platform=_platform())

    if args.eg5_only:
        run_eg5(ff, md_params, s)
        return

    t0 = time.time()
    res_fwd, _ = run_solvent(mol_a, mol_b, core, ff, None, md_params=md_params,
                             n_windows=s["n_windows"], min_overlap=s["min_overlap"])
    out["fwd"] = leg_result(res_fwd)
    out["fwd"]["wall_s"] = round(time.time() - t0, 1)
    print(f"hif2a solvent fwd: {out['fwd']['dg_kj']:.2f} ± {out['fwd']['err_kj']:.2f} kJ/mol "
          f"({out['fwd']['wall_s']} s)", flush=True)
    out_path.write_text(json.dumps(out, indent=1))

    t1 = time.time()
    res_rev, _ = run_solvent(mol_b, mol_a, core[:, ::-1], ff, None, md_params=md_params,
                             n_windows=s["n_windows"], min_overlap=s["min_overlap"])
    out["rev"] = leg_result(res_rev)
    out["rev"]["wall_s"] = round(time.time() - t1, 1)
    out["cycle_kj"] = out["fwd"]["dg_kj"] + out["rev"]["dg_kj"]
    out["cycle_err_kj"] = float(np.hypot(out["fwd"]["err_kj"], out["rev"]["err_kj"]))
    out["wall_s"] = round(time.time() - t0, 1)
    print(f"hif2a solvent cycle: {out['cycle_kj']:.2f} ± {out['cycle_err_kj']:.2f} kJ/mol", flush=True)
    out_path.write_text(json.dumps(out, indent=1))

    run_eg5(ff, md_params, s)


def run_eg5(ff, md_params, s):
    """One eg5 benchmark-set edge, solvent leg, one direction. The pair is
    the first congeneric pair with MATCHED formal charge (single topology
    requires net-charge-conserving edges; eg5 ligands 0/1 differ 0 vs +1)."""
    from timemachine_tpu.chem import read_sdf
    from timemachine_tpu.constants import DEFAULT_ATOM_MAPPING_KWARGS
    from timemachine_tpu.fe.atom_mapping import get_cores
    from timemachine_tpu.fe.rbfe import run_solvent

    eg5 = read_sdf("/root/reference/timemachine/testsystems/fep_benchmark/eg5/ligands.sdf")
    ma = mb = core_eg5 = None
    for i in range(len(eg5)):
        for j in range(i + 1, min(i + 4, len(eg5))):
            if eg5[i].total_charge() != eg5[j].total_charge():
                continue
            try:
                cores = get_cores(eg5[i], eg5[j], **DEFAULT_ATOM_MAPPING_KWARGS)
            except Exception:
                continue
            if cores and len(cores[0]) >= 10:
                ma, mb, core_eg5 = eg5[i], eg5[j], cores[0]
                break
        if ma is not None:
            break
    assert ma is not None, "no mappable same-charge eg5 pair found"
    print(f"eg5 edge: {ma.name} -> {mb.name} (core {len(core_eg5)})", flush=True)
    t2 = time.time()
    res_eg5, _ = run_solvent(ma, mb, core_eg5, ff, None, md_params=md_params,
                             n_windows=s["n_windows"], min_overlap=s["min_overlap"])
    eg5_out = dict(
        kind="rbfe_eg5_solvent_edge",
        mol_a=ma.name, mol_b=mb.name,
        settings=s, platform=_platform(),
        leg=leg_result(res_eg5),
        wall_s=round(time.time() - t2, 1),
    )
    print(f"eg5 {ma.name}->{mb.name} solvent: {eg5_out['leg']['dg_kj']:.2f} ± "
          f"{eg5_out['leg']['err_kj']:.2f} kJ/mol", flush=True)
    (RESULTS_DIR / "rbfe_eg5_solvent.json").write_text(json.dumps(eg5_out, indent=1))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
