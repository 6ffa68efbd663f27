"""Regression pins on the shipped accuracy artifacts (results/*.json,
RESULTS.md) — the in-repo analog of the reference's fixed_output dG pins
(ref tests/test_hrex_rbfe.py). These do NOT re-run the simulations (hours
of TPU); they pin the committed artifacts so a regression that silently
degrades or deletes the accuracy record fails CI, and so the rendered
RESULTS.md stays consistent with the data it claims to summarize."""

import json
from pathlib import Path

import numpy as np
import pytest

RESULTS = Path(__file__).resolve().parent.parent / "results"
KCAL = 4.184


def _load(name):
    p = RESULTS / name
    if not p.exists():
        pytest.skip(f"{name} not generated in this checkout")
    return json.loads(p.read_text())


def test_cycle_artifact_pinned():
    """hif2a vacuum cycle closure at 3x sampling: consistent with zero
    within max(3 sigma, 6 kJ/mol) — the nightly bound of
    tests/test_rbfe_cycle.py applied to the committed artifact."""
    d = _load("cycle_hif2a_vacuum.json")
    assert d["settings"]["n_windows"] == 12
    assert d["settings"]["n_frames"] >= 60
    bound = max(3.0 * d["cycle_err_kj"], 6.0)
    assert abs(d["cycle_kj"]) < bound, (d["cycle_kj"], bound)
    # each leg individually converged to a sane magnitude for this edge
    assert abs(d["dg_fwd_kj"]) < 60.0
    assert abs(d["dg_rev_kj"]) < 60.0


def test_cycle_platform_consistency():
    """TPU f32 and CPU f64 closures agree within 3 sigma at matched
    settings (the round-3 'platform swing' resolution)."""
    t = _load("cycle_hif2a_vacuum_tpu3x.json")
    c = _load("cycle_hif2a_vacuum_cpu3x.json")
    assert t["settings"] == c["settings"]
    diff = t["cycle_kj"] - c["cycle_kj"]
    err = float(np.hypot(t["cycle_err_kj"], c["cycle_err_kj"]))
    assert abs(diff) < 3.0 * err + 1.0, (diff, err)


def test_freesolv_ahfe_artifact_pinned():
    """FreeSolv AHFE subset (TPU): every molecule produced a finite dG with
    a finite error bar, and the subset RMSD vs experiment stays under
    2.5 kcal/mol at the recorded reduced settings (production AM1BCC/GAFF
    -class methods sit at ~1.1-1.5 at full sampling; 8 windows x 50 frames
    carries a sampling penalty)."""
    d = _load("freesolv_ahfe.json")
    rows = [r for r in d["rows"] if "error" not in r]
    assert len(rows) >= 18  # widened to 20 molecules in round 5
    devs = []
    for r in rows:
        assert np.isfinite(r["calc_kcal"]) and np.isfinite(r["calc_err_kj"])
        assert r["calc_err_kj"] < 10.0, r  # BAR error sane
        devs.append(r["calc_kcal"] - r["expt_kcal"])
    rmsd = float(np.sqrt(np.mean(np.square(devs))))
    assert rmsd < 2.5, rmsd
    # tightened r5 (measured n=20: RMSD 2.15, corr 0.87, bias +1.64): the
    # calc track must follow the expt track closely — the residual error is a
    # near-uniform under-solvation shift from the reduced protocol, so
    # correlation is the sensitive regression surface, and the bias bound
    # catches decoupling-direction bugs the RMSD bound alone would miss
    calc = np.array([r["calc_kcal"] for r in rows])
    expt = np.array([r["expt_kcal"] for r in rows])
    assert np.corrcoef(calc, expt)[0, 1] > 0.7
    assert 0.0 < np.mean(devs) < 2.5, np.mean(devs)


def test_freesolv_16w_protocol_check():
    """The 16-window re-run of the worst 8-window deviators must confirm the
    protocol diagnosis: mean signed deviation (under-solvation bias) shrinks
    when the ladder doubles at identical sampling."""
    p = RESULTS / "freesolv_16w_check.json"
    if not p.exists():
        pytest.skip("16-window check not produced in this checkout")
    d = json.loads(p.read_text())
    if "bias_16w" not in d:
        pytest.skip("16-window check incomplete")
    assert d["bias_16w"] < d["bias_8w"] - 0.5, (d["bias_8w"], d["bias_16w"])
    assert d["rmsd_16w"] < d["rmsd_8w"], d


def test_rbfe_hif2a_solvent_artifact():
    """First solvated RBFE accuracy artifact (VERDICT r4 item 2): the hif2a
    solvent-leg cycle closes within 3 sigma + 2 kJ/mol, every window pair
    kept overlap above the bisection floor, and HREX mixed."""
    p = RESULTS / "rbfe_hif2a_solvent.json"
    if not p.exists():
        pytest.skip("solvent RBFE artifact not produced in this checkout")
    d = json.loads(p.read_text())
    assert "cycle_kj" in d, "cycle incomplete"
    assert abs(d["cycle_kj"]) < 3.0 * d["cycle_err_kj"] + 2.0, (d["cycle_kj"], d["cycle_err_kj"])
    for leg in ("fwd", "rev"):
        assert np.isfinite(d[leg]["dg_kj"]) and d[leg]["err_kj"] < 10.0
        assert min(d[leg]["overlaps"]) > 0.1, d[leg]["overlaps"]
        if d[leg].get("final_swap_rates"):
            assert float(np.mean(d[leg]["final_swap_rates"])) > 0.15


def test_rbfe_eg5_solvent_artifact():
    """A benchmark-set edge produced a solvated dG with sane diagnostics;
    the value is regression-pinned against drift once measured."""
    p = RESULTS / "rbfe_eg5_solvent.json"
    if not p.exists():
        pytest.skip("eg5 solvent artifact not produced in this checkout")
    d = json.loads(p.read_text())
    lg = d["leg"]
    assert np.isfinite(lg["dg_kj"]) and lg["err_kj"] < 10.0
    assert min(lg["overlaps"]) > 0.1


def test_rbfe_complex_smoke_artifact():
    """The complex leg executes end-to-end ON TPU at real scale (14k atoms,
    native amber99sb host physics): plumbing pins only — finite dGs and
    diagnostics present. NOT an accuracy claim (6 windows x 20 frames has
    ~zero overlap by design; the artifact says so). The run also regression-
    guards the r5 fix for the dense-N² pre-equilibration TPU worker crash."""
    p = RESULTS / "rbfe_complex_smoke.json"
    if not p.exists():
        pytest.skip("complex smoke not produced in this checkout")
    d = json.loads(p.read_text())
    assert d["platform"] == "tpu"
    assert d["n_atoms"] > 10_000
    assert np.all(np.isfinite(d["dgs_kj"]))
    assert len(d["overlaps"]) == len(d["dgs_kj"])


def test_training_demo_artifact():
    """Forcefield training end-to-end (VERDICT r4 item 7): gradient steps
    through the sampled-endpoint reweighting estimator recover a 25%
    charge-scale perturbation (scripts/training_demo.py; ref
    reweighting.py:144-226, loss.py). Pins: loss decreases by >100x within
    each sampling round's budget, the trained scale returns to 1 within 2%,
    and the predicted Δf lands within 3 sigma + 0.1 kBT of the label."""
    d = _load("training_demo.json")
    assert d["scale_init"] == pytest.approx(1.25)
    assert abs(d["scale_final"] - 1.0) < 0.02
    first, last = d["rounds"][0], d["rounds"][-1]
    assert np.isfinite(first["loss_start"]) and first["loss_start"] > 1.0
    assert last["loss_end"] < first["loss_start"] / 100.0
    tol = 3.0 * d["label_err_kbt"] + 0.1
    assert abs(last["pred_df_kbt"] - d["label_df_kbt"]) < tol


def test_results_md_rendered_consistent():
    """RESULTS.md exists and its headline numbers match the JSON artifacts
    (the render is data-dependent — ADVICE r3: no hardcoded conclusions)."""
    md = Path(__file__).resolve().parent.parent / "RESULTS.md"
    if not md.exists():
        pytest.skip("RESULTS.md not rendered in this checkout")
    text = md.read_text()
    d = _load("cycle_hif2a_vacuum.json")
    assert f"{d['cycle_kj']:+.2f}" in text
    a = _load("freesolv_ahfe.json")
    devs = [r["calc_kcal"] - r["expt_kcal"] for r in a["rows"] if "error" not in r]
    rmsd = float(np.sqrt(np.mean(np.square(devs))))
    assert f"{rmsd:.2f}" in text
