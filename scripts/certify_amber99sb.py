"""Value-for-value certification of the shipped amber99sb.xml against an
authoritative external source (VERDICT r4 item 1).

The shipped ff/params/amber99sb.xml is a reconstruction from the published
parm94/parm99/ff99SB tables (scripts/gen_amber99sb.py documents provenance
and its recall-uncertain entries). The authoritative machine-readable
sources (AmberTools parm99.dat + frcmod.ff99SB, or OpenMM's
amber99sb[ildn].xml built from them) are NOT redistributable inside this
build environment (zero network egress, no OpenMM/AmberTools install), so
this harness consumes one supplied by the user:

    python scripts/certify_amber99sb.py /path/to/amber99sb.xml
    TM_AMBER_REFERENCE_XML=/path/to/amber99sb.xml pytest \
        tests/test_amber_certification.py

It parses both files through the SAME production parser (ff/amber_xml.py)
and diffs every section value-for-value: atom types (mass, LJ), bond,
angle, proper and improper tables (order- and direction-insensitive), and
residue template charges atom-for-atom. Exit code 0 ⇔ certified identical
within tolerance. This is the amber analog of
tests/test_smirnoff_converter.py::test_convert_smirnoff_xml_reproduces_shipped_ff
(there the upstream openff XML ships inside the reference checkout; no
Amber source data exists anywhere in this environment — verified round 5).

Reference target physics: /root/reference/timemachine/md/builders.py:197
(amber99sbildn via OpenMM).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL_REL = 5e-5  # unit-conversion roundoff headroom
TOL_CHARGE = 2e-4  # published charge tables are 4-decimal


def _canon_bond(key):
    return tuple(sorted(key))


def _canon_angle(key):
    a, b, c = key
    return min((a, b, c), (c, b, a))


def _canon_torsion(key):
    return min(tuple(key), tuple(reversed(key)))


def _close(a, b, tol=TOL_REL):
    scale = max(abs(a), abs(b), 1e-12)
    return abs(a - b) <= tol * scale + 1e-9


def certify(shipped_path: str, reference_path: str, out=print) -> int:
    """Returns the number of mismatched values (0 = certified)."""
    from timemachine_tpu.ff.amber_xml import AmberForceField

    ship = AmberForceField.parse(shipped_path)
    ref = AmberForceField.parse(reference_path)
    n_bad = 0

    def bad(msg):
        nonlocal n_bad
        n_bad += 1
        out(f"MISMATCH {msg}")

    # -- atom types: mass + LJ (per class, since type==class here) ----------
    ship_classes = set(ship.type_class.values())
    for t, (sig, eps) in sorted(ref.type_lj.items()):
        cls = ref.type_class.get(t, t)
        if cls not in ship_classes:
            bad(f"type {cls}: missing from shipped")
            continue
        # find shipped type of that class
        s_t = next(st for st, sc in ship.type_class.items() if sc == cls)
        s_sig, s_eps = ship.type_lj.get(s_t, (None, None))
        if s_sig is None or not (_close(sig, s_sig) and _close(eps, s_eps)):
            bad(f"LJ {cls}: shipped ({s_sig}, {s_eps}) vs reference ({sig}, {eps})")
        if not _close(ref.type_mass.get(t, -1.0), ship.type_mass.get(s_t, -2.0), 1e-3):
            bad(f"mass {cls}: shipped {ship.type_mass.get(s_t)} vs reference {ref.type_mass.get(t)}")

    # -- bonds / angles ------------------------------------------------------
    ship_bonds = {_canon_bond(k): v for k, v in ship.bond_params.items()}
    for k, (kf, r0) in sorted(ref.bond_params.items()):
        sv = ship_bonds.get(_canon_bond(k))
        if sv is None:
            bad(f"bond {k}: missing from shipped")
        elif not (_close(kf, sv[0]) and _close(r0, sv[1])):
            bad(f"bond {k}: shipped {sv} vs reference ({kf}, {r0})")

    ship_angles = {_canon_angle(k): v for k, v in ship.angle_params.items()}
    for k, (kf, t0) in sorted(ref.angle_params.items()):
        sv = ship_angles.get(_canon_angle(k))
        if sv is None:
            bad(f"angle {k}: missing from shipped")
        elif not (_close(kf, sv[0]) and _close(t0, sv[1])):
            bad(f"angle {k}: shipped {sv} vs reference ({kf}, {t0})")

    # -- torsions ------------------------------------------------------------
    def torsion_table(propers):
        table = {}
        for classes, terms in propers:
            key = _canon_torsion(classes)
            table[key] = sorted((n, round(ph, 4), k) for (k, ph, n) in terms if k != 0.0)
        return table

    ship_prop = torsion_table(ship.propers)
    for key, terms in sorted(torsion_table(ref.propers).items()):
        sv = ship_prop.get(key)
        if sv is None:
            if terms:  # all-zero reference rows are placeholders
                bad(f"proper {key}: missing from shipped")
            continue
        if len(sv) != len(terms) or any(
            not (a[0] == b[0] and _close(a[1], b[1], 1e-3) and _close(a[2], b[2])) for a, b in zip(sv, terms)
        ):
            bad(f"proper {key}: shipped {sv} vs reference {terms}")

    ship_imp = {tuple(c): sorted(t) for c, t in ship.impropers}
    for classes, terms in sorted((tuple(c), sorted(t)) for c, t in ref.impropers):
        sv = ship_imp.get(classes)
        if sv is None:
            bad(f"improper {classes}: missing from shipped")
        elif not all(
            _close(a[0], b[0]) and _close(a[1], b[1], 1e-3) and a[2] == b[2] for a, b in zip(sv, terms)
        ):
            bad(f"improper {classes}: shipped {sv} vs reference {terms}")

    # -- residue template charges -------------------------------------------
    for name, rtpl in sorted(ref.residues.items()):
        stpl = ship.residues.get(name)
        if stpl is None:
            bad(f"residue {name}: missing from shipped")
            continue
        ship_q = dict(zip(stpl.atom_names, stpl.atom_charges))
        for aname, q in zip(rtpl.atom_names, rtpl.atom_charges):
            sq = ship_q.get(aname)
            if sq is None:
                bad(f"residue {name}.{aname}: atom missing from shipped")
            elif abs(sq - q) > TOL_CHARGE:
                bad(f"residue {name}.{aname}: shipped q {sq} vs reference {q}")

    out(f"{'CERTIFIED' if n_bad == 0 else 'FAILED'}: {n_bad} mismatched values")
    return n_bad


def main():
    from timemachine_tpu.ff.params import AMBER99SB_XML

    ref = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("TM_AMBER_REFERENCE_XML")
    if not ref or not os.path.exists(ref):
        print("usage: certify_amber99sb.py <authoritative amber99sb ffxml>")
        print("(or set TM_AMBER_REFERENCE_XML)")
        sys.exit(2)
    sys.exit(1 if certify(str(AMBER99SB_XML), ref) else 0)


if __name__ == "__main__":
    main()
