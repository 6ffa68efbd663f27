"""Certification harness for the reconstructed amber99sb host physics
(VERDICT r4 item 1).

Three layers:
1. The value-for-value diff harness itself is validated in-suite: shipped
   vs itself certifies clean; a perturbed copy is caught (so the external
   certification, when run, is trustworthy).
2. The external certification runs whenever an authoritative amber99sb
   ffxml is supplied (TM_AMBER_REFERENCE_XML) — the analog of
   test_smirnoff_converter.py's upstream-XML pin. No authoritative Amber
   source data exists in this build environment (zero egress, no
   OpenMM/AmberTools; verified round 5), so in-repo CI the test reports
   SKIPPED with that reason rather than silently passing.
3. The recall-uncertain entries in scripts/gen_amber99sb.py are
   impact-BOUNDED: re-assigning hif2a with each entry swung across its
   plausible alternative value must move per-atom forces and total bonded
   energy by less than thresholds that would matter for complex-leg RBFE.

Reference physics target: /root/reference/timemachine/md/builders.py:197.
"""

import os
import re
from pathlib import Path

import numpy as np
import pytest

from timemachine_tpu.chem.pdb import parse_pdb, protein_mol_from_pdb
from timemachine_tpu.ff.amber_xml import AmberForceField, assign_protein_parameters
from timemachine_tpu.ff.params import AMBER99SB_XML

DATA = "/root/reference/timemachine/testsystems/data"

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from certify_amber99sb import certify  # noqa: E402


def test_certify_harness_self_clean():
    """Shipped vs itself must certify with zero mismatches."""
    assert certify(str(AMBER99SB_XML), str(AMBER99SB_XML), out=lambda *_: None) == 0


def test_certify_harness_detects_perturbations(tmp_path):
    """The harness must catch a single changed value in any section."""
    text = AMBER99SB_XML.read_text()

    def perturbed(pattern, repl):
        p = tmp_path / "mod.xml"
        new, n = re.subn(pattern, repl, text, count=1)
        assert n == 1, pattern
        p.write_text(new)
        return str(p)

    # one angle k, one bond length, one template charge, one torsion k
    cases = [
        (r'(<Angle [^/]*?k=")([0-9.]+)', lambda m: m.group(1) + str(float(m.group(2)) * 1.01)),
        (r'(<Bond [^/]*?length=")([0-9.]+)', lambda m: m.group(1) + str(float(m.group(2)) + 0.001)),
        (r'(charge=")(-?0\.4157)', lambda m: m.group(1) + "-0.4000"),
        (r'(<Proper [^/]*?k1=")([0-9.]+)', lambda m: m.group(1) + str(float(m.group(2)) + 0.5)),
    ]
    for pattern, repl in cases:
        mod = perturbed(pattern, repl)
        assert certify(str(AMBER99SB_XML), mod, out=lambda *_: None) > 0, pattern


@pytest.mark.skipif(
    not os.environ.get("TM_AMBER_REFERENCE_XML"),
    reason="no authoritative amber99sb ffxml available in this environment "
    "(zero egress; supply one via TM_AMBER_REFERENCE_XML to certify)",
)
def test_certify_against_authoritative_source():
    ref = os.environ["TM_AMBER_REFERENCE_XML"]
    assert os.path.exists(ref)
    n_bad = certify(str(AMBER99SB_XML), ref)
    assert n_bad == 0, f"{n_bad} values differ from the authoritative source"


# -- layer 3: bound the recall-uncertain entries ------------------------------

# (class triple) -> alternative (k kcal/mol/rad^2, theta0 deg) spanning the
# plausible range documented in scripts/gen_amber99sb.py:191-259
UNCERTAIN_ANGLE_ALTERNATIVES = {
    ("CT", "N", "H"): (50.0, 118.04),  # shipped 38.0 (the flagged alternative)
    ("C", "OH", "HO"): (35.0, 113.00),  # shipped 50.0
    ("CN", "CB", "C*"): (63.0, 106.00),  # shipped theta0 108.80
    ("H5", "CR", "NA"): (35.0, 120.00),  # shipped 30.0
    ("H5", "CR", "NB"): (35.0, 120.00),  # shipped 30.0
}

KCAL = 4.184


def _canon(key):
    a, b, c = key
    return min((a, b, c), (c, b, a))


def _bonded_snapshot(ff, st, mol):
    import jax.numpy as jnp

    from timemachine_tpu.ops import bonded

    ap = assign_protein_parameters(st, mol, ff)
    x = jnp.asarray(mol.get_conf())
    box = jnp.eye(3) * 100.0
    import jax

    def u(x):
        return bonded.harmonic_angle(x, jnp.asarray(ap.angle_params), box, jnp.asarray(ap.angle_idxs))

    e, g = jax.value_and_grad(u)(x)
    return float(e), np.asarray(g)


def test_recall_uncertain_entries_bounded_impact():
    """Swinging every recall-uncertain angle entry to its alternative value
    at once must not move hif2a bonded physics materially: the max per-atom
    force change stays far below MAX_FORCE_NORM and the energy shift per
    affected angle stays at the sub-kT level. This bounds (not certifies)
    the residual fidelity risk of the reconstruction."""
    st = parse_pdb(f"{DATA}/hif2a_nowater_min.pdb")
    mol = protein_mol_from_pdb(st)

    base = AmberForceField.parse(str(AMBER99SB_XML))
    e0, g0 = _bonded_snapshot(base, st, mol)

    mod = AmberForceField.parse(str(AMBER99SB_XML))
    canon_alt = {_canon(k): v for k, v in UNCERTAIN_ANGLE_ALTERNATIVES.items()}
    n_hit = 0
    for key in list(mod.angle_params):
        alt = canon_alt.get(_canon(key))
        if alt is not None:
            k_alt, t0_alt = alt
            # same unit conversion as the generator: K_amber*2 -> openmm k
            mod.angle_params[key] = (2.0 * k_alt * KCAL, np.deg2rad(t0_alt))
            n_hit += 1
    assert n_hit >= 4, "uncertain entries not found in shipped XML"

    e1, g1 = _bonded_snapshot(mod, st, mol)

    from timemachine_tpu.constants import MAX_FORCE_NORM

    dg = np.linalg.norm(g1 - g0, axis=1)
    de = abs(e1 - e0)
    # count of angles using the uncertain classes (H-N backbone amides
    # dominate: ~1 per residue)
    n_res = len(st.residues)
    # measured r5 on hif2a (112 residues): de = 10.6 kJ/mol total =
    # 0.094 kJ/mol per residue (~kT/26), max per-atom |dF| = 290 kJ/mol/nm
    # (1.4% of MAX_FORCE_NORM), mean |dF| = 8.4
    assert dg.max() < 0.05 * MAX_FORCE_NORM, dg.max()
    assert de / n_res < 0.5, (de, n_res)  # ≪ kT per residue even worst-case
