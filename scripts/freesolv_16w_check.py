"""Validate the FreeSolv protocol diagnosis beyond the single outlier
(round 5 follow-up): re-run the 5 worst deviators of the 20-molecule
8-window artifact at 16 windows (same sampling, same seed) and record how
the systematic under-solvation bias moves. If the diagnosis is right
(coarse ladder -> positive bias), the 16-window estimates shift negative,
toward experiment. -> results/freesolv_16w_check.json

Run: nohup python scripts/freesolv_16w_check.py > /tmp/freesolv_16w.log 2>&1 &
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
N_WORST = 5


def main():
    from freesolv_r5 import AHFE_SETTINGS, _platform, run_one
    from timemachine_tpu.fe.utils import get_mol_name
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.testsystems import fetch_freesolv

    base = json.loads((RESULTS_DIR / "freesolv_ahfe.json").read_text())
    rows = [r for r in base["rows"] if "error" not in r]
    worst = sorted(rows, key=lambda r: -abs(r["calc_kcal"] - r["expt_kcal"]))[:N_WORST]
    names = [r["mol"] for r in worst]
    print("worst deviators:", names, flush=True)

    ff = Forcefield.load_default()
    mols = {get_mol_name(m): m for m in fetch_freesolv()}
    s = AHFE_SETTINGS
    out_path = RESULTS_DIR / "freesolv_16w_check.json"
    out = dict(kind="freesolv_16w_protocol_check", platform=_platform(),
               settings={**s, "n_windows": 16}, rows=[])
    if out_path.exists():
        out = json.loads(out_path.read_text())
    done = {r["mol"] for r in out["rows"]}

    for r8 in worst:
        name = r8["mol"]
        if name in done:
            continue
        row = dict(mol=name, expt_kcal=r8["expt_kcal"], calc_8w_kcal=round(r8["calc_kcal"], 3))
        try:
            r = run_one(mols[name], ff, n_frames=s["n_frames"], n_eq_steps=s["n_eq_steps"],
                        steps_per_frame=s["steps_per_frame"], n_windows=16,
                        box_width=s["box_width"], seed=2026)
            row.update(calc_16w_kcal=round(r["calc_kcal"], 3), calc_err_kj=round(r["calc_err_kj"], 3),
                       min_overlap=r["min_overlap"], wall_s=r["wall_s"])
            print(f"{name}: 8w {row['calc_8w_kcal']:+.2f} -> 16w {row['calc_16w_kcal']:+.2f} "
                  f"(expt {row['expt_kcal']:+.2f})", flush=True)
        except Exception as e:
            row["error"] = repr(e)
            print(f"{name}: FAILED {e!r}", flush=True)
        out["rows"].append(row)
        out_path.write_text(json.dumps(out, indent=1))

    ok = [r for r in out["rows"] if "error" not in r]
    if ok:
        d8 = np.array([r["calc_8w_kcal"] - r["expt_kcal"] for r in ok])
        d16 = np.array([r["calc_16w_kcal"] - r["expt_kcal"] for r in ok])
        out["bias_8w"] = round(float(d8.mean()), 3)
        out["bias_16w"] = round(float(d16.mean()), 3)
        out["rmsd_8w"] = round(float(np.sqrt((d8 ** 2).mean())), 3)
        out["rmsd_16w"] = round(float(np.sqrt((d16 ** 2).mean())), 3)
        out_path.write_text(json.dumps(out, indent=1))
        print(f"bias {out['bias_8w']:+.2f} -> {out['bias_16w']:+.2f}; "
              f"rmsd {out['rmsd_8w']:.2f} -> {out['rmsd_16w']:.2f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
