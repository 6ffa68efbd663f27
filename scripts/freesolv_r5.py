"""Round-5 FreeSolv work (VERDICT r4 item 3):

Phase A — diagnose the mobley_1034539 outlier (hexachlorobiphenyl PCB,
  expt -3.04 kcal/mol, r4 calc +1.37): discriminate sampling vs protocol vs
  decoupling by re-running at (a) 16 windows / 1x sampling and (b) 8
  windows / 3x sampling / fresh seed, recording per-pair BAR overlaps.
  -> results/freesolv_outlier_diag.json

Phase B — widen the AHFE subset from 8 to 20 molecules at the r4 settings
  (8 windows x 50 frames x 200 steps, box 3.0 nm), reusing the 8 existing
  TPU rows and appending 12 new ones, now with per-molecule min pair
  overlap recorded. -> results/freesolv_ahfe.json

Reference analog: examples/run_smc_on_freesolv.py + testsystems/freesolv
(/root/reference/timemachine/testsystems/freesolv/freesolv.sdf).

Run: nohup python scripts/freesolv_r5.py > /tmp/freesolv_r5.log 2>&1 &
Incremental: each finished molecule is flushed to disk immediately.
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

AHFE_SETTINGS = dict(n_frames=50, n_eq_steps=5000, steps_per_frame=200, n_windows=8, box_width=3.0)

OUTLIER = "mobley_1034539"
N_MOLS = 20


def _platform():
    import jax

    return str(jax.devices()[0].platform)


def run_one(mol, ff, *, n_frames, n_eq_steps, steps_per_frame, n_windows, box_width, seed):
    from timemachine_tpu.constants import KCAL_TO_KJ
    from timemachine_tpu.fe.absolute_hydration import estimate_absolute_free_energy
    from timemachine_tpu.fe.free_energy import MDParams
    from timemachine_tpu.md import builders

    md_params = MDParams(n_frames=n_frames, n_eq_steps=n_eq_steps, steps_per_frame=steps_per_frame, seed=seed)
    t0 = time.time()
    host_config = builders.build_water_system(box_width, ff.water_ff, mols=[mol])
    host_config.box += np.diag([0.1, 0.1, 0.1])
    result = estimate_absolute_free_energy(
        mol, ff, host_config, md_params=md_params, prefix="solvent", n_windows=n_windows
    )
    fr = result.final_result
    dg_kj = float(np.sum(fr.dGs))
    err_kj = float(np.linalg.norm(fr.dG_errs))
    return dict(
        calc_kj=dg_kj,
        calc_err_kj=err_kj,
        calc_kcal=dg_kj / KCAL_TO_KJ,
        overlaps=[round(float(o), 4) for o in fr.overlaps],
        min_overlap=round(float(np.min(fr.overlaps)), 4),
        wall_s=round(time.time() - t0, 1),
        seed=seed,
        n_windows=n_windows,
        n_frames=n_frames,
    )


def phase_a(mols_by_name, ff):
    out_path = RESULTS_DIR / "freesolv_outlier_diag.json"
    if out_path.exists():
        done = {r.get("label") for r in json.loads(out_path.read_text())["runs"]}
        if {"16w_1x_seed2026", "8w_3x_seed2027", "16w_3x_seed2027"} <= done:
            print("phase A already complete; skipping", flush=True)
            return
    mol = mols_by_name[OUTLIER]
    diag = dict(
        kind="freesolv_outlier_diagnosis",
        mol=OUTLIER,
        formula="C12H4Cl6 (hexachlorobiphenyl PCB)",
        expt_kcal=float(mol.props["dG"]),
        r4_calc_kcal=1.373,
        platform=_platform(),
        runs=[],
    )
    s = AHFE_SETTINGS
    variants = [
        # protocol hypothesis: double the window count at r4 sampling
        dict(label="16w_1x_seed2026", n_frames=s["n_frames"], n_eq_steps=s["n_eq_steps"],
             steps_per_frame=s["steps_per_frame"], n_windows=16, box_width=s["box_width"], seed=2026),
        # sampling hypothesis: 3x frames + 3x equilibration, fresh seed
        dict(label="8w_3x_seed2027", n_frames=3 * s["n_frames"], n_eq_steps=3 * s["n_eq_steps"],
             steps_per_frame=s["steps_per_frame"], n_windows=8, box_width=s["box_width"], seed=2027),
        # both
        dict(label="16w_3x_seed2027", n_frames=3 * s["n_frames"], n_eq_steps=3 * s["n_eq_steps"],
             steps_per_frame=s["steps_per_frame"], n_windows=16, box_width=s["box_width"], seed=2027),
    ]
    for v in variants:
        label = v.pop("label")
        try:
            row = run_one(mol, ff, **v)
            row["label"] = label
            print(f"{OUTLIER} {label}: {row['calc_kcal']:+.2f} kcal/mol "
                  f"(err {row['calc_err_kj']:.1f} kJ, min_overlap {row['min_overlap']})", flush=True)
        except Exception as e:
            row = dict(label=label, error=repr(e))
            print(f"{OUTLIER} {label}: FAILED {e!r}", flush=True)
        diag["runs"].append(row)
        out_path.write_text(json.dumps(diag, indent=1))


def phase_b(mols, ff):
    from timemachine_tpu.fe.utils import get_mol_name

    out_path = RESULTS_DIR / "freesolv_ahfe.json"
    existing = json.loads(out_path.read_text())
    done = {r["mol"] for r in existing["rows"]}
    s = AHFE_SETTINGS
    for mol in mols[:N_MOLS]:
        name = get_mol_name(mol)
        if name in done:
            continue
        row = dict(mol=name, expt_kcal=float(mol.props["dG"]),
                   expt_err_kcal=float(mol.props.get("dG_err", 0.0)))
        try:
            r = run_one(mol, ff, n_frames=s["n_frames"], n_eq_steps=s["n_eq_steps"],
                        steps_per_frame=s["steps_per_frame"], n_windows=s["n_windows"],
                        box_width=s["box_width"], seed=2026)
            r.pop("seed"), r.pop("n_windows"), r.pop("n_frames")
            row.update(r)
            print(f"{name}: calc {row['calc_kcal']:+.2f} kcal/mol (expt {row['expt_kcal']:+.2f}, "
                  f"min_overlap {row['min_overlap']})", flush=True)
        except Exception as e:
            row["error"] = repr(e)
            print(f"{name}: FAILED {e!r}", flush=True)
        existing["rows"].append(row)
        existing["n_mols"] = len(existing["rows"])
        out_path.write_text(json.dumps(existing, indent=1))


def main():
    from timemachine_tpu.fe.utils import get_mol_name
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.testsystems import fetch_freesolv

    ff = Forcefield.load_default()
    mols = fetch_freesolv(n_mols=N_MOLS)
    mols_by_name = {get_mol_name(m): m for m in mols}
    print(f"platform={_platform()} mols={list(mols_by_name)}", flush=True)
    phase_a(mols_by_name, ff)
    phase_b(mols, ff)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
