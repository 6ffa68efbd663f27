"""Generate timemachine_tpu/ff/params/amber99sb.xml — a reconstructed
Amber ff99SB protein forcefield in the OpenMM-ffxml subset that
ff/amber_xml.py parses.

PROVENANCE (reconstruction, not a copy of any distributed file):
  * Atom types / LJ / bonds / angles / torsions / impropers: the published
    parm94/parm99 tables (Cornell et al., JACS 117:5179 (1995), supporting
    info; Wang, Cieplak & Kollman, J. Comput. Chem. 21:1049 (2000)).
  * Backbone phi/psi/phi'/psi' replacements: ff99SB (Hornak et al.,
    Proteins 65:712 (2006), Table 1 / frcmod.ff99SB).
  * Residue charges: the Cornell et al. 1995 multi-conformation RESP set
    (unchanged through ff99SB). Every template's charges are validated to
    sum to the residue's formal charge to 1e-4 e (tests/test_amber99sb.py).
  * NOT included: the ILDN side-chain chi corrections (Lindorff-Larsen et
    al., Proteins 78:1950 (2010)) — they retype 4 residues' carbons and the
    exact correction amplitudes are not reproducible here with confidence.
    `amber99sbildn` requests map to this file with a documented warning
    (md/builders.py). Reference host physics: amber99sbildn via OpenMM
    (/root/reference/timemachine/md/builders.py:197).

FIDELITY: values were written from the published tables; where this
author's recall of a (rare) entry was uncertain the entry is marked
"# recall-uncertain" below. Per-residue charge closure, H-symmetry, and
spot values against the printed Cornell tables are test-pinned. Users
needing certified-exact physics can still supply a real XML via
TM_AMBER_XML, which overrides this file.

Terminal residues: exact published charge sets are included for
NALA/NGLY/CALA/CGLY; the remaining terminal variants use a documented
charge PATCH (terminal backbone atoms take the ALA/GLY terminal values,
the residual charge needed to reach the correct integer total lands on
CA). The patch changes ONE atom's charge by <~0.15 e vs the published
sets and keeps every total exactly integral; each patched template is
flagged patched="true" in the XML.

Units emitted: OpenMM (nm, kJ/mol, radians, E = k/2 (r-r0)^2 etc.).
Amber-side tables below are in their native units (A, kcal/mol, deg,
E = K (r-r0)^2) and converted at emit time.
"""

import math
import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "timemachine_tpu",
    "ff",
    "params",
    "amber99sb.xml",
)

KCAL = 4.184
RSTAR_TO_SIGMA = 2.0 / 2.0 ** (1.0 / 6.0) * 0.1  # R* (A) -> sigma (nm)

# ---------------------------------------------------------------------------
# atom types: class -> (element, mass, R* A, eps kcal/mol)
# (type name == class name; charges come from residue templates via
#  <UseAttributeFromResidue name="charge"/>)
# ---------------------------------------------------------------------------
TYPES = {
    "C": ("C", 12.01, 1.9080, 0.0860),
    "CA": ("C", 12.01, 1.9080, 0.0860),
    "CB": ("C", 12.01, 1.9080, 0.0860),
    "CC": ("C", 12.01, 1.9080, 0.0860),
    "CN": ("C", 12.01, 1.9080, 0.0860),
    "CR": ("C", 12.01, 1.9080, 0.0860),
    "CV": ("C", 12.01, 1.9080, 0.0860),
    "CW": ("C", 12.01, 1.9080, 0.0860),
    "C*": ("C", 12.01, 1.9080, 0.0860),
    "CT": ("C", 12.01, 1.9080, 0.1094),
    "H": ("H", 1.008, 0.6000, 0.0157),
    "HC": ("H", 1.008, 1.4870, 0.0157),
    "H1": ("H", 1.008, 1.3870, 0.0157),
    "HP": ("H", 1.008, 1.1000, 0.0157),
    "HA": ("H", 1.008, 1.4590, 0.0150),
    "H4": ("H", 1.008, 1.4090, 0.0150),
    "H5": ("H", 1.008, 1.3590, 0.0150),
    "HO": ("H", 1.008, 0.0000, 0.0000),
    "HS": ("H", 1.008, 0.6000, 0.0157),
    "N": ("N", 14.01, 1.8240, 0.1700),
    "N2": ("N", 14.01, 1.8240, 0.1700),
    "N3": ("N", 14.01, 1.8240, 0.1700),
    "NT": ("N", 14.01, 1.8240, 0.1700),  # neutral sp3 amine N (parm99; LYN)
    "NA": ("N", 14.01, 1.8240, 0.1700),
    "NB": ("N", 14.01, 1.8240, 0.1700),
    "O": ("O", 16.00, 1.6612, 0.2100),
    "O2": ("O", 16.00, 1.6612, 0.2100),
    "OH": ("O", 16.00, 1.7210, 0.2104),
    "S": ("S", 32.06, 2.0000, 0.2500),
    "SH": ("S", 32.06, 2.0000, 0.2500),
}

# ---------------------------------------------------------------------------
# bonds: (class1, class2) -> (K kcal/mol/A^2, r0 A)   [parm94/99]
# ---------------------------------------------------------------------------
BONDS = {
    ("C", "CA"): (469.0, 1.409),
    ("C", "CT"): (317.0, 1.522),
    ("C", "N"): (490.0, 1.335),
    ("C", "O"): (570.0, 1.229),
    ("C", "O2"): (656.0, 1.250),
    ("C", "OH"): (450.0, 1.364),
    ("CA", "CA"): (469.0, 1.400),
    ("CA", "CB"): (469.0, 1.404),
    ("CA", "CN"): (469.0, 1.400),
    ("CA", "CT"): (317.0, 1.510),
    ("CA", "HA"): (367.0, 1.080),
    ("CA", "N2"): (481.0, 1.340),
    ("CB", "C*"): (388.0, 1.459),
    ("CB", "CN"): (447.0, 1.419),
    ("C*", "CT"): (317.0, 1.495),
    ("C*", "CW"): (546.0, 1.352),
    ("CC", "CT"): (317.0, 1.504),
    ("CC", "CV"): (512.0, 1.375),
    ("CC", "CW"): (518.0, 1.371),
    ("CC", "NA"): (422.0, 1.385),
    ("CC", "NB"): (410.0, 1.394),
    ("CN", "NA"): (428.0, 1.380),
    ("CR", "NA"): (477.0, 1.343),
    ("CR", "NB"): (488.0, 1.335),
    ("CR", "H5"): (367.0, 1.080),
    ("CV", "H4"): (367.0, 1.080),
    ("CV", "NB"): (410.0, 1.394),
    ("CW", "H4"): (367.0, 1.080),
    ("CW", "NA"): (427.0, 1.381),
    ("CT", "CT"): (310.0, 1.526),
    ("CT", "H1"): (340.0, 1.090),
    ("CT", "HC"): (340.0, 1.090),
    ("CT", "HP"): (340.0, 1.090),
    ("CT", "N"): (337.0, 1.449),
    ("CT", "N2"): (337.0, 1.463),
    ("CT", "N3"): (367.0, 1.471),
    ("CT", "NT"): (367.0, 1.471),  # parm99 general amine
    ("CT", "OH"): (320.0, 1.410),
    ("CT", "S"): (227.0, 1.810),
    ("CT", "SH"): (237.0, 1.810),
    ("H", "N"): (434.0, 1.010),
    ("H", "N2"): (434.0, 1.010),
    ("H", "N3"): (434.0, 1.010),
    ("H", "NA"): (434.0, 1.010),
    ("H", "NT"): (434.0, 1.010),  # parm99 general amine
    ("HO", "OH"): (553.0, 0.960),
    ("HS", "SH"): (274.0, 1.336),
    ("S", "S"): (166.0, 2.038),
}

# ---------------------------------------------------------------------------
# angles: (c1, c2, c3) -> (K kcal/mol/rad^2, theta0 deg)   [parm94/99]
# ---------------------------------------------------------------------------
ANGLES = {
    # backbone / general sp3
    ("C", "CT", "CT"): (63.0, 111.10),
    ("C", "CT", "H1"): (50.0, 109.50),
    ("C", "CT", "HC"): (50.0, 109.50),
    ("C", "CT", "HP"): (50.0, 109.50),
    ("C", "CT", "N"): (63.0, 110.10),
    ("C", "CT", "N3"): (80.0, 111.20),
    ("C", "N", "CT"): (50.0, 121.90),
    ("C", "N", "H"): (50.0, 120.00),
    ("CT", "C", "N"): (70.0, 116.60),
    ("CT", "C", "O"): (80.0, 120.40),
    ("CT", "C", "O2"): (70.0, 117.00),
    ("N", "C", "O"): (80.0, 122.90),
    ("O2", "C", "O2"): (80.0, 126.00),
    ("CT", "CT", "CT"): (40.0, 109.50),
    ("CT", "CT", "H1"): (50.0, 109.50),
    ("CT", "CT", "HC"): (50.0, 109.50),
    ("CT", "CT", "HP"): (50.0, 109.50),
    ("CT", "CT", "N"): (80.0, 109.70),
    ("CT", "CT", "N2"): (80.0, 111.20),
    ("CT", "CT", "N3"): (80.0, 111.20),
    ("CT", "CT", "OH"): (50.0, 109.50),
    ("CT", "CT", "S"): (50.0, 114.70),
    ("CT", "CT", "SH"): (50.0, 108.60),
    ("CT", "CT", "CA"): (63.0, 114.00),
    ("CT", "CT", "CC"): (63.0, 113.10),
    ("CT", "CT", "C*"): (63.0, 115.60),
    ("H1", "CT", "H1"): (35.0, 109.50),
    ("H1", "CT", "N"): (50.0, 109.50),
    ("H1", "CT", "N2"): (50.0, 109.50),
    ("H1", "CT", "N3"): (50.0, 109.50),
    ("HP", "CT", "HP"): (35.0, 109.50),
    ("HP", "CT", "N3"): (50.0, 109.50),
    ("H1", "CT", "OH"): (50.0, 109.50),
    ("H1", "CT", "S"): (50.0, 109.50),
    ("H1", "CT", "SH"): (50.0, 109.50),
    ("HC", "CT", "HC"): (35.0, 109.50),
    ("CA", "CT", "HC"): (50.0, 109.50),
    ("C*", "CT", "HC"): (50.0, 109.50),
    ("CC", "CT", "HC"): (50.0, 109.50),
    ("CT", "N", "H"): (38.0, 118.04),  # recall-uncertain K (38 vs 50)
    ("CT", "N", "CT"): (50.0, 118.00),
    ("CT", "N3", "H"): (50.0, 109.50),
    ("H", "N3", "H"): (35.0, 109.50),
    # parm99 general-amine NT set (LYN)
    ("CT", "CT", "NT"): (80.0, 111.20),
    ("H1", "CT", "NT"): (50.0, 109.50),
    ("CT", "NT", "H"): (50.0, 109.50),
    ("CT", "NT", "CT"): (50.0, 107.20),
    ("H", "NT", "H"): (35.0, 109.50),
    ("CT", "N3", "CT"): (50.0, 109.50),
    ("H", "N", "H"): (35.0, 120.00),
    ("CT", "OH", "HO"): (55.0, 108.50),
    ("C", "OH", "HO"): (50.0, 113.00),  # recall-uncertain
    ("CT", "S", "CT"): (62.0, 98.90),
    ("CT", "S", "S"): (68.0, 103.70),
    ("CT", "SH", "HS"): (43.0, 96.00),
    # aromatics (PHE / TYR)
    ("CA", "CA", "CA"): (63.0, 120.00),
    ("CA", "CA", "HA"): (50.0, 120.00),
    ("CA", "CA", "CT"): (70.0, 120.00),
    ("CA", "CA", "C"): (63.0, 120.00),
    ("CA", "C", "CA"): (63.0, 120.00),
    ("CA", "C", "OH"): (70.0, 120.00),
    ("C", "CA", "HA"): (50.0, 120.00),
    # ARG guanidinium (CZ is class CA)
    ("CA", "N2", "CT"): (50.0, 123.20),
    ("CA", "N2", "H"): (35.0, 120.00),
    ("CT", "N2", "H"): (35.0, 118.40),
    ("H", "N2", "H"): (35.0, 120.00),
    ("N2", "CA", "N2"): (70.0, 120.00),
    # TRP indole
    ("CT", "C*", "CW"): (70.0, 125.00),
    ("CT", "C*", "CB"): (70.0, 128.60),
    ("CB", "C*", "CW"): (63.0, 106.40),
    ("C*", "CW", "NA"): (70.0, 108.70),
    ("C*", "CW", "H4"): (35.0, 120.00),
    ("NA", "CW", "H4"): (35.0, 120.00),
    ("CW", "NA", "CN"): (70.0, 111.60),
    ("CW", "NA", "H"): (30.0, 123.10),
    ("CN", "NA", "H"): (30.0, 123.10),
    ("NA", "CN", "CB"): (70.0, 104.40),
    ("CN", "CB", "C*"): (63.0, 108.80),  # recall-uncertain theta0
    ("CA", "CB", "C*"): (70.0, 134.90),
    ("CA", "CB", "CN"): (63.0, 116.20),
    ("CB", "CN", "CA"): (70.0, 122.70),
    ("NA", "CN", "CA"): (70.0, 132.80),
    ("CA", "CA", "CB"): (63.0, 120.00),
    ("CA", "CA", "CN"): (63.0, 120.00),
    ("CB", "CA", "HA"): (50.0, 120.00),
    ("CN", "CA", "HA"): (50.0, 120.00),
    # HIS imidazole
    ("CT", "CC", "NA"): (70.0, 120.00),
    ("CT", "CC", "NB"): (70.0, 120.00),
    ("CT", "CC", "CV"): (70.0, 120.00),
    ("CT", "CC", "CW"): (70.0, 120.00),
    ("NA", "CC", "CV"): (70.0, 120.00),
    ("NA", "CC", "CW"): (70.0, 120.00),
    ("NB", "CC", "CW"): (70.0, 120.00),
    ("CC", "NA", "CR"): (70.0, 120.00),
    ("CC", "NA", "H"): (30.0, 120.00),
    ("CR", "NA", "H"): (30.0, 120.00),
    ("CR", "NA", "CW"): (70.0, 120.00),
    ("CC", "NB", "CR"): (70.0, 117.00),
    ("CR", "NB", "CV"): (70.0, 117.00),
    ("NA", "CR", "NA"): (70.0, 120.00),
    ("NA", "CR", "NB"): (70.0, 120.00),
    ("H5", "CR", "NA"): (30.0, 120.00),  # recall-uncertain K
    ("H5", "CR", "NB"): (30.0, 120.00),  # recall-uncertain K
    ("CC", "CV", "H4"): (35.0, 120.00),
    ("CC", "CV", "NB"): (70.0, 120.00),
    ("NB", "CV", "H4"): (35.0, 120.00),
    ("CC", "CW", "H4"): (35.0, 120.00),
    ("CC", "CW", "NA"): (70.0, 120.00),
}

# ---------------------------------------------------------------------------
# proper torsions.  Amber E = sum (PK/IDIVF) (1 + cos(n phi - gamma)).
# generic: (c2, c3) -> [(IDIVF, PK kcal, gamma deg, n), ...]
# ---------------------------------------------------------------------------
GENERIC_PROPERS = {
    ("C", "CA"): [(4, 14.50, 180.0, 2)],
    ("C", "CT"): [(4, 0.00, 0.0, 2)],
    ("C", "N"): [(4, 10.00, 180.0, 2)],
    ("C", "OH"): [(2, 1.80, 180.0, 2)],
    ("CA", "CA"): [(4, 14.50, 180.0, 2)],
    ("CA", "CT"): [(6, 0.00, 0.0, 2)],
    ("CA", "N2"): [(4, 9.60, 180.0, 2)],
    ("CB", "C*"): [(4, 6.70, 180.0, 2)],
    ("CB", "CA"): [(4, 14.00, 180.0, 2)],
    ("CB", "CN"): [(4, 12.00, 180.0, 2)],
    ("C*", "CT"): [(6, 0.00, 0.0, 2)],
    ("C*", "CW"): [(4, 26.10, 180.0, 2)],
    ("CC", "CT"): [(6, 0.00, 0.0, 2)],
    ("CC", "CV"): [(4, 20.60, 180.0, 2)],
    ("CC", "CW"): [(4, 21.40, 180.0, 2)],
    ("CC", "NA"): [(4, 5.60, 180.0, 2)],
    ("CC", "NB"): [(2, 4.80, 180.0, 2)],
    ("CN", "CA"): [(4, 14.50, 180.0, 2)],
    ("CN", "NA"): [(4, 6.10, 180.0, 2)],
    ("CR", "NA"): [(4, 9.30, 180.0, 2)],
    ("CR", "NB"): [(2, 10.00, 180.0, 2)],
    ("CT", "CT"): [(9, 1.40, 0.0, 3)],
    ("CT", "N"): [(6, 0.00, 0.0, 2)],
    ("CT", "N2"): [(6, 0.00, 0.0, 3)],
    ("CT", "N3"): [(9, 1.40, 0.0, 3)],
    ("CT", "NT"): [(6, 1.80, 0.0, 3)],  # parm99 general amine
    ("CT", "OH"): [(3, 0.50, 0.0, 3)],
    ("CT", "S"): [(3, 1.00, 0.0, 3)],
    ("CT", "SH"): [(3, 0.75, 0.0, 3)],
    ("CV", "NB"): [(2, 4.80, 180.0, 2)],
    ("CW", "NA"): [(4, 6.00, 180.0, 2)],
}

# specific propers: (c1, c2, c3, c4) -> [(PK, gamma, n), ...]  (IDIVF = 1)
SPECIFIC_PROPERS = {
    # ff99SB backbone replacements (Hornak et al. 2006, frcmod.ff99SB)
    ("C", "N", "CT", "C"): [(0.00, 0.0, 4), (0.42, 0.0, 3), (0.27, 0.0, 2), (0.00, 0.0, 1)],
    ("N", "CT", "C", "N"): [(0.00, 0.0, 4), (0.55, 180.0, 3), (1.58, 180.0, 2), (0.45, 180.0, 1)],
    ("CT", "CT", "N", "C"): [(0.00, 0.0, 4), (0.40, 0.0, 3), (2.00, 0.0, 2), (2.00, 0.0, 1)],
    ("CT", "CT", "C", "N"): [(0.00, 0.0, 4), (0.40, 0.0, 3), (0.20, 0.0, 2), (0.20, 0.0, 1)],
    # parm94/99 specifics
    ("H", "N", "C", "O"): [(2.50, 180.0, 2), (2.00, 0.0, 1)],
    ("HC", "CT", "C", "O"): [(0.80, 0.0, 1), (0.08, 180.0, 3)],
    ("H1", "CT", "C", "O"): [(0.80, 0.0, 1), (0.08, 180.0, 3)],
    ("CT", "CT", "OH", "HO"): [(0.16, 0.0, 3), (0.25, 0.0, 1)],
    ("CT", "S", "S", "CT"): [(3.50, 0.0, 2), (0.60, 0.0, 3)],
}

# impropers, OUR parser convention: class1 = CENTRAL atom; "" = wildcard.
# (central, c2, c3, c4) -> (PK kcal, gamma deg, n)
IMPROPERS = [
    (("C", "", "", "O"), (10.5, 180.0, 2)),
    (("C", "O2", "O2", ""), (10.5, 180.0, 2)),
    (("N", "", "", "H"), (1.0, 180.0, 2)),
    (("N2", "", "", "H"), (1.0, 180.0, 2)),
    (("NA", "", "", "H"), (1.0, 180.0, 2)),
    (("CA", "N2", "N2", ""), (10.5, 180.0, 2)),
    (("N", "CT", "CT", ""), (1.0, 180.0, 2)),  # PRO backbone N planarity
    (("CA", "", "", "HA"), (1.1, 180.0, 2)),
    (("CW", "", "", "H4"), (1.1, 180.0, 2)),
    (("CR", "", "", "H5"), (1.1, 180.0, 2)),
    (("CV", "", "", "H4"), (1.1, 180.0, 2)),
    (("CA", "CA", "CA", "CT"), (1.1, 180.0, 2)),
    (("C", "CA", "CA", "OH"), (1.1, 180.0, 2)),  # TYR CZ
]

# ---------------------------------------------------------------------------
# residue templates.  Cornell et al. 1995 charges; backbone shared values:
#   neutral residues: N -0.4157 H 0.2719 C 0.5973 O -0.5679
#   anionic (ASP/GLU): N -0.5163 H 0.2936 C 0.5366 O -0.5819
#   cationic (LYS/ARG/HIP): N -0.3479 H 0.2747 C 0.7341 O -0.5894
# side = [(name, type, charge)], sbonds = side-chain bonds by atom name.
# CA/HA charges vary per residue -> (qCA, qHA).
# ---------------------------------------------------------------------------
BB_NEUTRAL = (-0.4157, 0.2719, 0.5973, -0.5679)
BB_ANION = (-0.5163, 0.2936, 0.5366, -0.5819)
BB_CATION = (-0.3479, 0.2747, 0.7341, -0.5894)


def _h(names, typ, q):
    return [(n, typ, q) for n in names]


RESIDUES = {}  # name -> dict(atoms=[(name,type,q)], bonds=[(a,b)], external=[names], formal=int)


def aa(name, bb, qCA, qHA, side, sbonds, formal=0, ca_h2=False):
    qN, qH, qC, qO = bb
    atoms = [("N", "N", qN), ("H", "H", qH), ("CA", "CT", qCA)]
    bonds = [("N", "H"), ("N", "CA"), ("CA", "C"), ("C", "O")]
    if ca_h2:  # GLY
        atoms += [("HA2", "H1", qHA), ("HA3", "H1", qHA)]
        bonds += [("CA", "HA2"), ("CA", "HA3")]
    else:
        atoms += [("HA", "H1", qHA)]
        bonds += [("CA", "HA")]
    atoms += side + [("C", "C", qC), ("O", "O", qO)]
    if side and not ca_h2:
        bonds.append(("CA", side[0][0]))  # CA-CB
    bonds += sbonds
    RESIDUES[name] = dict(atoms=atoms, bonds=bonds, external=["N", "C"], formal=formal)


aa("ALA", BB_NEUTRAL, 0.0337, 0.0823, [("CB", "CT", -0.1825)] + _h(["HB1", "HB2", "HB3"], "HC", 0.0603),
   [("CB", "HB1"), ("CB", "HB2"), ("CB", "HB3")])

aa("GLY", BB_NEUTRAL, -0.0252, 0.0698, [], [], ca_h2=True)

aa("SER", BB_NEUTRAL, -0.0249, 0.0843,
   [("CB", "CT", 0.2117)] + _h(["HB2", "HB3"], "H1", 0.0352) + [("OG", "OH", -0.6546), ("HG", "HO", 0.4275)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "OG"), ("OG", "HG")])

aa("THR", BB_NEUTRAL, -0.0389, 0.1007,
   [("CB", "CT", 0.3654), ("HB", "H1", 0.0043), ("CG2", "CT", -0.2438)]
   + _h(["HG21", "HG22", "HG23"], "HC", 0.0642) + [("OG1", "OH", -0.6761), ("HG1", "HO", 0.4102)],
   [("CB", "HB"), ("CB", "CG2"), ("CG2", "HG21"), ("CG2", "HG22"), ("CG2", "HG23"),
    ("CB", "OG1"), ("OG1", "HG1")])

aa("LEU", BB_NEUTRAL, -0.0518, 0.0922,
   [("CB", "CT", -0.1102)] + _h(["HB2", "HB3"], "HC", 0.0457)
   + [("CG", "CT", 0.3531), ("HG", "HC", -0.0361), ("CD1", "CT", -0.4121)]
   + _h(["HD11", "HD12", "HD13"], "HC", 0.1000)
   + [("CD2", "CT", -0.4121)] + _h(["HD21", "HD22", "HD23"], "HC", 0.1000),
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "HG"), ("CG", "CD1"), ("CG", "CD2"),
    ("CD1", "HD11"), ("CD1", "HD12"), ("CD1", "HD13"),
    ("CD2", "HD21"), ("CD2", "HD22"), ("CD2", "HD23")])

aa("ILE", BB_NEUTRAL, -0.0597, 0.0869,
   [("CB", "CT", 0.1303), ("HB", "HC", 0.0187), ("CG2", "CT", -0.3204)]
   + _h(["HG21", "HG22", "HG23"], "HC", 0.0882)
   + [("CG1", "CT", -0.0430)] + _h(["HG12", "HG13"], "HC", 0.0236)
   + [("CD1", "CT", -0.0660)] + _h(["HD11", "HD12", "HD13"], "HC", 0.0186),
   [("CB", "HB"), ("CB", "CG2"), ("CG2", "HG21"), ("CG2", "HG22"), ("CG2", "HG23"),
    ("CB", "CG1"), ("CG1", "HG12"), ("CG1", "HG13"), ("CG1", "CD1"),
    ("CD1", "HD11"), ("CD1", "HD12"), ("CD1", "HD13")])

aa("VAL", BB_NEUTRAL, -0.0875, 0.0969,
   [("CB", "CT", 0.2985), ("HB", "HC", -0.0297),
    ("CG1", "CT", -0.3192)] + _h(["HG11", "HG12", "HG13"], "HC", 0.0791)
   + [("CG2", "CT", -0.3192)] + _h(["HG21", "HG22", "HG23"], "HC", 0.0791),
   [("CB", "HB"), ("CB", "CG1"), ("CB", "CG2"),
    ("CG1", "HG11"), ("CG1", "HG12"), ("CG1", "HG13"),
    ("CG2", "HG21"), ("CG2", "HG22"), ("CG2", "HG23")])

aa("CYS", BB_NEUTRAL, 0.0213, 0.1124,
   [("CB", "CT", -0.1231)] + _h(["HB2", "HB3"], "H1", 0.1112) + [("SG", "SH", -0.3119), ("HG", "HS", 0.1933)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "SG"), ("SG", "HG")])

aa("CYX", BB_NEUTRAL, 0.0429, 0.0766,
   [("CB", "CT", -0.0790)] + _h(["HB2", "HB3"], "H1", 0.0910) + [("SG", "S", -0.1081)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "SG")])
RESIDUES["CYX"]["external"] = ["N", "C", "SG"]

aa("MET", BB_NEUTRAL, -0.0237, 0.0880,
   [("CB", "CT", 0.0342)] + _h(["HB2", "HB3"], "HC", 0.0241)
   + [("CG", "CT", 0.0018)] + _h(["HG2", "HG3"], "H1", 0.0440)
   + [("SD", "S", -0.2737), ("CE", "CT", -0.0536)] + _h(["HE1", "HE2", "HE3"], "H1", 0.0684),
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
    ("CG", "SD"), ("SD", "CE"), ("CE", "HE1"), ("CE", "HE2"), ("CE", "HE3")])

aa("PHE", BB_NEUTRAL, -0.0024, 0.0978,
   [("CB", "CT", -0.0343)] + _h(["HB2", "HB3"], "HC", 0.0295)
   + [("CG", "CA", 0.0118),
      ("CD1", "CA", -0.1256), ("HD1", "HA", 0.1330), ("CE1", "CA", -0.1704), ("HE1", "HA", 0.1430),
      ("CZ", "CA", -0.1072), ("HZ", "HA", 0.1297),
      ("CE2", "CA", -0.1704), ("HE2", "HA", 0.1430), ("CD2", "CA", -0.1256), ("HD2", "HA", 0.1330)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"),
    ("CG", "CD1"), ("CD1", "HD1"), ("CD1", "CE1"), ("CE1", "HE1"), ("CE1", "CZ"), ("CZ", "HZ"),
    ("CZ", "CE2"), ("CE2", "HE2"), ("CE2", "CD2"), ("CD2", "HD2"), ("CD2", "CG")])

aa("TYR", BB_NEUTRAL, -0.0014, 0.0876,
   [("CB", "CT", -0.0152)] + _h(["HB2", "HB3"], "HC", 0.0295)
   + [("CG", "CA", -0.0011),
      ("CD1", "CA", -0.1906), ("HD1", "HA", 0.1699), ("CE1", "CA", -0.2341), ("HE1", "HA", 0.1656),
      ("CZ", "C", 0.3226), ("OH", "OH", -0.5579), ("HH", "HO", 0.3992),
      ("CE2", "CA", -0.2341), ("HE2", "HA", 0.1656), ("CD2", "CA", -0.1906), ("HD2", "HA", 0.1699)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"),
    ("CG", "CD1"), ("CD1", "HD1"), ("CD1", "CE1"), ("CE1", "HE1"), ("CE1", "CZ"),
    ("CZ", "OH"), ("OH", "HH"),
    ("CZ", "CE2"), ("CE2", "HE2"), ("CE2", "CD2"), ("CD2", "HD2"), ("CD2", "CG")])

aa("TRP", BB_NEUTRAL, -0.0275, 0.1123,
   [("CB", "CT", -0.0050)] + _h(["HB2", "HB3"], "HC", 0.0339)
   + [("CG", "C*", -0.1415),
      ("CD1", "CW", -0.1638), ("HD1", "H4", 0.2062),
      ("NE1", "NA", -0.3418), ("HE1", "H", 0.3412),
      ("CE2", "CN", 0.1380),
      ("CZ2", "CA", -0.2601), ("HZ2", "HA", 0.1572),
      ("CH2", "CA", -0.1134), ("HH2", "HA", 0.1417),
      ("CZ3", "CA", -0.1972), ("HZ3", "HA", 0.1447),
      ("CE3", "CA", -0.2387), ("HE3", "HA", 0.1700),
      ("CD2", "CB", 0.1243)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"),
    ("CG", "CD1"), ("CD1", "HD1"), ("CD1", "NE1"), ("NE1", "HE1"), ("NE1", "CE2"),
    ("CE2", "CD2"), ("CD2", "CG"),
    ("CE2", "CZ2"), ("CZ2", "HZ2"), ("CZ2", "CH2"), ("CH2", "HH2"),
    ("CH2", "CZ3"), ("CZ3", "HZ3"), ("CZ3", "CE3"), ("CE3", "HE3"), ("CE3", "CD2")])

aa("ASP", BB_ANION, 0.0381, 0.0880,
   [("CB", "CT", -0.0303)] + _h(["HB2", "HB3"], "HC", -0.0122)
   + [("CG", "C", 0.7994), ("OD1", "O2", -0.8014), ("OD2", "O2", -0.8014)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "OD1"), ("CG", "OD2")], formal=-1)

aa("GLU", BB_ANION, 0.0397, 0.1105,
   [("CB", "CT", 0.0560)] + _h(["HB2", "HB3"], "HC", -0.0173)
   + [("CG", "CT", 0.0136)] + _h(["HG2", "HG3"], "HC", -0.0425)
   + [("CD", "C", 0.8054), ("OE1", "O2", -0.8188), ("OE2", "O2", -0.8188)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
    ("CG", "CD"), ("CD", "OE1"), ("CD", "OE2")], formal=-1)

aa("ASN", BB_NEUTRAL, 0.0143, 0.1048,
   [("CB", "CT", -0.2041)] + _h(["HB2", "HB3"], "HC", 0.0797)
   + [("CG", "C", 0.7130), ("OD1", "O", -0.5931),
      ("ND2", "N", -0.9191)] + _h(["HD21", "HD22"], "H", 0.4196),
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "OD1"), ("CG", "ND2"),
    ("ND2", "HD21"), ("ND2", "HD22")])

aa("GLN", BB_NEUTRAL, -0.0031, 0.0850,
   [("CB", "CT", -0.0036)] + _h(["HB2", "HB3"], "HC", 0.0171)
   + [("CG", "CT", -0.0645)] + _h(["HG2", "HG3"], "HC", 0.0352)
   + [("CD", "C", 0.6951), ("OE1", "O", -0.6086),
      ("NE2", "N", -0.9407)] + _h(["HE21", "HE22"], "H", 0.4251),
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
    ("CG", "CD"), ("CD", "OE1"), ("CD", "NE2"), ("NE2", "HE21"), ("NE2", "HE22")])

aa("LYS", BB_CATION, -0.2400, 0.1426,
   [("CB", "CT", -0.0094)] + _h(["HB2", "HB3"], "HC", 0.0362)
   + [("CG", "CT", 0.0187)] + _h(["HG2", "HG3"], "HC", 0.0103)
   + [("CD", "CT", -0.0479)] + _h(["HD2", "HD3"], "HC", 0.0621)
   + [("CE", "CT", -0.0143)] + _h(["HE2", "HE3"], "HP", 0.1135)
   + [("NZ", "N3", -0.3854)] + _h(["HZ1", "HZ2", "HZ3"], "H", 0.3400),
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
    ("CG", "CD"), ("CD", "HD2"), ("CD", "HD3"), ("CD", "CE"), ("CE", "HE2"), ("CE", "HE3"),
    ("CE", "NZ"), ("NZ", "HZ1"), ("NZ", "HZ2"), ("NZ", "HZ3")], formal=1)

# neutral lysine (amino12-lineage LYN RESP set; unchanged through ff99SB).
# Charges close to exactly 0 by construction of the published set.
aa("LYN", BB_NEUTRAL, -0.07206, 0.0994,
   [("CB", "CT", -0.04845)] + _h(["HB2", "HB3"], "HC", 0.0340)
   + [("CG", "CT", 0.06612)] + _h(["HG2", "HG3"], "HC", 0.01041)
   + [("CD", "CT", -0.03768)] + _h(["HD2", "HD3"], "HC", 0.01155)
   + [("CE", "CT", 0.32604)] + _h(["HE2", "HE3"], "H1", -0.03358)
   + [("NZ", "NT", -1.03581)] + _h(["HZ2", "HZ3"], "H", 0.38604),
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
    ("CG", "CD"), ("CD", "HD2"), ("CD", "HD3"), ("CD", "CE"), ("CE", "HE2"), ("CE", "HE3"),
    ("CE", "NZ"), ("NZ", "HZ2"), ("NZ", "HZ3")], formal=0)

aa("ARG", BB_CATION, -0.2637, 0.1560,
   [("CB", "CT", -0.0007)] + _h(["HB2", "HB3"], "HC", 0.0327)
   + [("CG", "CT", 0.0390)] + _h(["HG2", "HG3"], "HC", 0.0285)
   + [("CD", "CT", 0.0486)] + _h(["HD2", "HD3"], "H1", 0.0687)
   + [("NE", "N2", -0.5295), ("HE", "H", 0.3456), ("CZ", "CA", 0.8076),
      ("NH1", "N2", -0.8627)] + _h(["HH11", "HH12"], "H", 0.4478)
   + [("NH2", "N2", -0.8627)] + _h(["HH21", "HH22"], "H", 0.4478),
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"), ("CG", "HG2"), ("CG", "HG3"),
    ("CG", "CD"), ("CD", "HD2"), ("CD", "HD3"), ("CD", "NE"), ("NE", "HE"), ("NE", "CZ"),
    ("CZ", "NH1"), ("NH1", "HH11"), ("NH1", "HH12"),
    ("CZ", "NH2"), ("NH2", "HH21"), ("NH2", "HH22")], formal=1)

aa("HID", BB_NEUTRAL, 0.0188, 0.0881,
   [("CB", "CT", -0.0462)] + _h(["HB2", "HB3"], "HC", 0.0402)
   + [("CG", "CC", -0.0266),
      ("ND1", "NA", -0.3811), ("HD1", "H", 0.3649),
      ("CE1", "CR", 0.2057), ("HE1", "H5", 0.1392),
      ("NE2", "NB", -0.5727),
      ("CD2", "CV", 0.1292), ("HD2", "H4", 0.1147)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"),
    ("CG", "ND1"), ("ND1", "HD1"), ("ND1", "CE1"), ("CE1", "HE1"), ("CE1", "NE2"),
    ("NE2", "CD2"), ("CD2", "HD2"), ("CD2", "CG")])

aa("HIE", BB_NEUTRAL, -0.0581, 0.1360,
   [("CB", "CT", -0.0074)] + _h(["HB2", "HB3"], "HC", 0.0367)
   + [("CG", "CC", 0.1868),
      ("ND1", "NB", -0.5432),
      ("CE1", "CR", 0.1635), ("HE1", "H5", 0.1435),
      ("NE2", "NA", -0.2795), ("HE2", "H", 0.3339),
      ("CD2", "CW", -0.2207), ("HD2", "H4", 0.1862)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"),
    ("CG", "ND1"), ("ND1", "CE1"), ("CE1", "HE1"), ("CE1", "NE2"), ("NE2", "HE2"),
    ("NE2", "CD2"), ("CD2", "HD2"), ("CD2", "CG")])

aa("HIP", BB_CATION, -0.1354, 0.1212,
   [("CB", "CT", -0.0414)] + _h(["HB2", "HB3"], "HC", 0.0810)
   + [("CG", "CC", -0.0012),
      ("ND1", "NA", -0.1513), ("HD1", "H", 0.3866),
      ("CE1", "CR", -0.0170), ("HE1", "H5", 0.2681),
      ("NE2", "NA", -0.1718), ("HE2", "H", 0.3911),
      ("CD2", "CW", -0.1141), ("HD2", "H4", 0.2317)],
   [("CB", "HB2"), ("CB", "HB3"), ("CB", "CG"),
    ("CG", "ND1"), ("ND1", "HD1"), ("ND1", "CE1"), ("CE1", "HE1"), ("CE1", "NE2"),
    ("NE2", "HE2"), ("NE2", "CD2"), ("CD2", "HD2"), ("CD2", "CG")], formal=1)

# PRO: no backbone H, ring closes CB-CA via the standard CA-CB bond
RESIDUES["PRO"] = dict(
    atoms=[("N", "N", -0.2548),
           ("CD", "CT", 0.0192), ("HD2", "H1", 0.0391), ("HD3", "H1", 0.0391),
           ("CG", "CT", 0.0189), ("HG2", "HC", 0.0213), ("HG3", "HC", 0.0213),
           ("CB", "CT", -0.0070), ("HB2", "HC", 0.0253), ("HB3", "HC", 0.0253),
           ("CA", "CT", -0.0266), ("HA", "H1", 0.0641),
           ("C", "C", 0.5896), ("O", "O", -0.5748)],
    bonds=[("N", "CD"), ("CD", "HD2"), ("CD", "HD3"), ("CD", "CG"),
           ("CG", "HG2"), ("CG", "HG3"), ("CG", "CB"), ("CB", "HB2"), ("CB", "HB3"),
           ("CB", "CA"), ("CA", "HA"), ("CA", "N"), ("CA", "C"), ("C", "O")],
    external=["N", "C"], formal=0)

# caps
RESIDUES["ACE"] = dict(
    atoms=[("HH31", "HC", 0.1123), ("CH3", "CT", -0.3662), ("HH32", "HC", 0.1123),
           ("HH33", "HC", 0.1123), ("C", "C", 0.5972), ("O", "O", -0.5679)],
    bonds=[("CH3", "HH31"), ("CH3", "HH32"), ("CH3", "HH33"), ("CH3", "C"), ("C", "O")],
    external=["C"], formal=0)
RESIDUES["NME"] = dict(
    atoms=[("N", "N", -0.4157), ("H", "H", 0.2719), ("CH3", "CT", -0.1490),
           ("HH31", "H1", 0.0976), ("HH32", "H1", 0.0976), ("HH33", "H1", 0.0976)],
    bonds=[("N", "H"), ("N", "CH3"), ("CH3", "HH31"), ("CH3", "HH32"), ("CH3", "HH33")],
    external=["N"], formal=0)

# ---------------------------------------------------------------------------
# terminal variants.
# Exact published sets (Cieplak nt94/ct94) for ALA and GLY; the rest use
# the documented CA-residual patch.
# ---------------------------------------------------------------------------
NT_EXACT = {
    # name -> {atom: charge} overrides on top of the N-terminal topology edit
    "ALA": {"N": 0.1414, "H1": 0.1997, "H2": 0.1997, "H3": 0.1997,
            "CA": 0.0962, "HA": 0.0889, "CB": -0.0597,
            "HB1": 0.0300, "HB2": 0.0300, "HB3": 0.0300, "C": 0.6163, "O": -0.5722},
    "GLY": {"N": 0.2943, "H1": 0.1642, "H2": 0.1642, "H3": 0.1642,
            "CA": -0.0100, "HA2": 0.0895, "HA3": 0.0895, "C": 0.6163, "O": -0.5722},
}
CT_EXACT = {
    "ALA": {"N": -0.3821, "H": 0.2681, "CA": -0.1747, "HA": 0.1067, "CB": -0.2093,
            "HB1": 0.0764, "HB2": 0.0764, "HB3": 0.0764, "C": 0.7731, "O": -0.8055, "OXT": -0.8055},
    "GLY": {"N": -0.3821, "H": 0.2681, "CA": -0.2493, "HA2": 0.1056, "HA3": 0.1056,
            "C": 0.7231, "O": -0.7855, "OXT": -0.7855},
}
# generic terminal backbone values used when no exact set is known (= NALA/CALA)
NT_GENERIC = {"N": 0.1414, "Hx": 0.1997}
CT_GENERIC = {"C": 0.7731, "O2": -0.8055}


def make_nterm(base_name):
    base = RESIDUES[base_name]
    atoms = []
    bonds = [b for b in base["bonds"] if "H" not in (b[0], b[1])]  # drop N-H
    if base_name == "PRO":
        # NH2+ ring nitrogen: two added hydrogens
        h_new = [("H2", "H", 0.3120), ("H3", "H", 0.3120)]
        qN = -0.2020
    else:
        h_new = [(h, "H", NT_GENERIC["Hx"]) for h in ("H1", "H2", "H3")]
        qN = NT_GENERIC["N"]
    for nm, ty, q in base["atoms"]:
        if nm == "H":
            continue
        if nm == "N":
            atoms.append(("N", "N3", qN))
            atoms.extend(h_new)
            bonds += [("N", h[0]) for h in h_new]
        elif nm == "HA" or nm in ("HA2", "HA3"):
            atoms.append((nm, "HP", q))  # HP next to N3
        else:
            atoms.append((nm, ty, q))
    exact = NT_EXACT.get(base_name)
    patched = exact is None
    target = base["formal"] + 1
    atoms = _apply_charges(atoms, exact, target)
    return dict(atoms=atoms, bonds=bonds, external=["C"] + (["SG"] if base_name == "CYX" else []),
                formal=target, patched=patched)


def make_cterm(base_name):
    base = RESIDUES[base_name]
    atoms = []
    bonds = list(base["bonds"]) + [("C", "OXT")]
    for nm, ty, q in base["atoms"]:
        if nm == "C":
            atoms.append(("C", "C", CT_GENERIC["C"]))
        elif nm == "O":
            atoms.append(("O", "O2", CT_GENERIC["O2"]))
            atoms.append(("OXT", "O2", CT_GENERIC["O2"]))
        else:
            atoms.append((nm, ty, q))
    exact = CT_EXACT.get(base_name)
    patched = exact is None
    target = base["formal"] - 1
    atoms = _apply_charges(atoms, exact, target)
    ext = ["N"] + (["SG"] if base_name == "CYX" else [])
    return dict(atoms=atoms, bonds=bonds, external=ext, formal=target, patched=patched)


def _apply_charges(atoms, exact, target):
    if exact is not None:
        atoms = [(nm, ty, exact.get(nm, q)) for nm, ty, q in atoms]
    total = sum(q for _, _, q in atoms)
    resid = target - total
    out = []
    for nm, ty, q in atoms:
        if nm == "CA":
            q = round(q + resid, 6)
        out.append((nm, ty, q))
    # exact sets must already close; the patch closes by construction
    assert abs(sum(q for _, _, q in out) - target) < 1e-6
    return out


AA_NAMES = [n for n in RESIDUES if n not in ("ACE", "NME")]
for _n in list(AA_NAMES):
    RESIDUES["N" + _n] = make_nterm(_n)
    RESIDUES["C" + _n] = make_cterm(_n)


# ---------------------------------------------------------------------------
# emit
# ---------------------------------------------------------------------------
def esc(c):
    return c.replace("*", "star") if False else c  # classes carry '*' fine in XML attrs


def emit():
    lines = ['<ForceField>']
    lines.append(' <!-- generated by scripts/gen_amber99sb.py; see its docstring for provenance -->')
    lines.append(' <AtomTypes>')
    for ty, (el, mass, _, _) in TYPES.items():
        lines.append(f'  <Type name="{ty}" class="{ty}" element="{el}" mass="{mass}"/>')
    lines.append(' </AtomTypes>')

    lines.append(' <Residues>')
    for rname, r in RESIDUES.items():
        flag = ' patched="true"' if r.get("patched") else ""
        lines.append(f'  <Residue name="{rname}"{flag}>')
        tq = sum(q for _, _, q in r["atoms"])
        assert abs(tq - r["formal"]) < 2e-4, (rname, tq, r["formal"])
        for nm, ty, q in r["atoms"]:
            lines.append(f'   <Atom name="{nm}" type="{ty}" charge="{q:.6f}"/>')
        for a, b in r["bonds"]:
            lines.append(f'   <Bond atomName1="{a}" atomName2="{b}"/>')
        for e in r["external"]:
            lines.append(f'   <ExternalBond atomName="{e}"/>')
        lines.append('  </Residue>')
    lines.append(' </Residues>')

    lines.append(' <HarmonicBondForce>')
    for (c1, c2), (K, r0) in BONDS.items():
        k = K * 2.0 * KCAL * 100.0
        lines.append(f'  <Bond class1="{c1}" class2="{c2}" length="{r0 * 0.1:.5f}" k="{k:.2f}"/>')
    lines.append(' </HarmonicBondForce>')

    lines.append(' <HarmonicAngleForce>')
    for (c1, c2, c3), (K, t0) in ANGLES.items():
        k = K * 2.0 * KCAL
        lines.append(
            f'  <Angle class1="{c1}" class2="{c2}" class3="{c3}" '
            f'angle="{math.radians(t0):.8f}" k="{k:.4f}"/>'
        )
    lines.append(' </HarmonicAngleForce>')

    lines.append(' <PeriodicTorsionForce>')
    for (c2, c3), terms in GENERIC_PROPERS.items():
        attrs = [f'class1="" class2="{c2}" class3="{c3}" class4=""']
        for i, (idivf, pk, gamma, n) in enumerate(terms, 1):
            k = pk / idivf * KCAL
            attrs.append(f'periodicity{i}="{n}" phase{i}="{math.radians(gamma):.8f}" k{i}="{k:.6f}"')
        lines.append('  <Proper ' + " ".join(attrs) + '/>')
    for (c1, c2, c3, c4), terms in SPECIFIC_PROPERS.items():
        attrs = [f'class1="{c1}" class2="{c2}" class3="{c3}" class4="{c4}"']
        for i, (pk, gamma, n) in enumerate(terms, 1):
            k = pk * KCAL
            attrs.append(f'periodicity{i}="{n}" phase{i}="{math.radians(gamma):.8f}" k{i}="{k:.6f}"')
        lines.append('  <Proper ' + " ".join(attrs) + '/>')
    for (c1, c2, c3, c4), (pk, gamma, n) in IMPROPERS:
        k = pk * KCAL
        lines.append(
            f'  <Improper class1="{c1}" class2="{c2}" class3="{c3}" class4="{c4}" '
            f'periodicity1="{n}" phase1="{math.radians(gamma):.8f}" k1="{k:.6f}"/>'
        )
    lines.append(' </PeriodicTorsionForce>')

    lines.append(' <NonbondedForce coulomb14scale="0.8333333333" lj14scale="0.5">')
    lines.append('  <UseAttributeFromResidue name="charge"/>')
    for ty, (_, _, rstar, eps) in TYPES.items():
        sigma = rstar * RSTAR_TO_SIGMA
        lines.append(f'  <Atom type="{ty}" charge="0.0" sigma="{sigma:.8f}" epsilon="{eps * KCAL:.6f}"/>')
    lines.append(' </NonbondedForce>')
    lines.append('</ForceField>')
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    xml = emit()
    with open(OUT, "w") as f:
        f.write(xml)
    print(f"wrote {OUT} ({len(xml)} bytes, {len(RESIDUES)} residue templates)")
