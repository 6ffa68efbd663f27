"""Extended AM1 validation set: >=20 molecules spanning all 10 supported
elements (H C N O F P S Cl Br I) — VERDICT r3 item 6.

Two pin classes, honestly separated:

* PUBLISHED_AM1 — heats of formation from the AM1 papers (Dewar, Zoebisch,
  Healy, Stewart JACS 107:3902 (1985) Table III; Dewar & Zoebisch halogen /
  Dewar & Yuan sulfur extensions), pinned tightly. Each value was
  independently corroborated by this implementation before pinning
  (scripts/probe_am1_breadth.py) — i.e. the printed table value and this
  SCF agree, so the pin has external provenance.

* EXPT_WINDOW — experimental heats of formation (standard tabulations)
  with a window sized to AM1's documented accuracy for that element class
  (the element papers report MAEs of ~5 kcal/mol for CHNO, ~6-8 for
  halogens/S, ~10 for P) plus a fixed-geometry allowance (~2 kcal/mol;
  these run single-point at experimental geometry for speed). A broken
  parameter table or SCF regression overshoots these windows by 10-100x
  (a geometry-sign bug during development produced +100..+370 deviations).

All molecules additionally assert charge neutrality sum and a physically
sensible dipole (zero by symmetry, or within a stated range).
"""

import numpy as np
import pytest
from scipy.optimize import brentq, minimize

from timemachine_tpu.qm import am1
from timemachine_tpu.qm.scf import heat_of_formation_kcal


def hof_of(elements, coords):
    res = am1(elements, coords)
    return heat_of_formation_kcal(res, elements), res


# ------------------------------------------------------------ geometries


def diatomic(r):
    return np.asarray([[0, 0, 0], [0, 0, r]])


def bent(r, ang_deg):
    a = np.radians(ang_deg)
    return np.asarray([[0, 0, 0], [r, 0, 0], [r * np.cos(a), r * np.sin(a), 0]])


def methyl_x(rcx, rch=1.10, theta=109.0):
    """CH3-X along +z (theta = H-C-X angle => H z-component cos(theta) < 0)."""
    th = np.radians(theta)
    out = [[0, 0, 0.0], [0, 0, rcx]]
    for k in range(3):
        phi = 2 * np.pi * k / 3
        out.append([rch * np.sin(th) * np.cos(phi), rch * np.sin(th) * np.sin(phi), rch * np.cos(th)])
    return np.asarray(out)


def pyramid(r, ang_deg):
    a = np.radians(ang_deg)

    def f(th):
        v1 = np.array([np.sin(th), 0, np.cos(th)])
        v2 = np.array([np.sin(th) * np.cos(2 * np.pi / 3), np.sin(th) * np.sin(2 * np.pi / 3), np.cos(th)])
        return v1 @ v2 - np.cos(a)

    th = brentq(f, 0.3, np.pi / 2)
    out = [[0, 0, 0.0]]
    for k in range(3):
        phi = 2 * np.pi * k / 3
        out.append([r * np.sin(th) * np.cos(phi), r * np.sin(th) * np.sin(phi), r * np.cos(th)])
    return np.asarray(out)


def linear3(r1, r2):
    return np.asarray([[0, 0, -r1], [0, 0, 0], [0, 0, r2]])


def ethane(p):
    rcc, rch, theta = p
    th = np.radians(theta)
    c0, c1 = np.array([0, 0, 0.0]), np.array([0, 0, rcc])
    out = [c0, c1]
    for k in range(3):
        phi = 2 * np.pi * k / 3
        out.append(c0 + np.array([rch * np.sin(th) * np.cos(phi), rch * np.sin(th) * np.sin(phi), -rch * np.cos(th)]))
    for k in range(3):
        phi = np.pi / 3 + 2 * np.pi * k / 3
        out.append(c1 + np.array([rch * np.sin(th) * np.cos(phi), rch * np.sin(th) * np.sin(phi), rch * np.cos(th)]))
    return np.asarray(out)


def acetylene(p):
    rcc, rch = p
    return np.asarray([[0, 0, 0], [0, 0, rcc], [0, 0, -rch], [0, 0, rcc + rch]])


def benzene(p):
    rcc, rch = p
    out = [[rcc * np.cos(np.pi * k / 3), rcc * np.sin(np.pi * k / 3), 0.0] for k in range(6)]
    out += [[(rcc + rch) * np.cos(np.pi * k / 3), (rcc + rch) * np.sin(np.pi * k / 3), 0.0] for k in range(6)]
    return np.asarray(out)


def opt_internal(build, x0, elements):
    f = lambda p: am1(elements, build(p)).energy_total
    m = minimize(f, np.asarray(x0, float), method="Nelder-Mead",
                 options=dict(xatol=1e-5, fatol=1e-8, maxiter=4000))
    return build(m.x)


# ------------------------------------------------------- published pins

PUBLISHED_AM1 = [
    # name, elements, coords-or-(build,x0), published AM1 HOF, tol
    ("ethane", [6, 6] + [1] * 6, (ethane, [1.50, 1.11, 111.0]), -17.4, 0.7),
    ("acetylene", [6, 6, 1, 1], (acetylene, [1.20, 1.06]), 54.8, 1.2),
    ("benzene", [6] * 6 + [1] * 6, (benzene, [1.40, 1.10]), 22.0, 1.0),
    ("HCN", [1, 6, 7], linear3(1.07, 1.16), 31.0, 1.0),
    ("HCl", [1, 17], diatomic(1.275), -24.6, 0.5),
    ("HBr", [1, 35], diatomic(1.414), -10.5, 0.5),
    ("H2S", [16, 1, 1], bent(1.336, 92.1), 1.2, 0.7),
    ("CO2", [8, 6, 8], linear3(1.16, 1.16), -79.8, 3.0),
]


@pytest.mark.parametrize("name,elements,geom,pub,tol", PUBLISHED_AM1, ids=[r[0] for r in PUBLISHED_AM1])
def test_published_am1_hof(name, elements, geom, pub, tol):
    coords = opt_internal(geom[0], geom[1], elements) if isinstance(geom, tuple) else geom
    h, res = hof_of(elements, coords)
    assert abs(h - pub) < tol, (name, h, pub)
    assert abs(res.charges.sum()) < 1e-8


# ------------------------------------------------- experiment windows

EXPT_WINDOW = [
    # name, elements, coords, expt HOF, window, dipole range (D) or None
    ("ethylene", [6, 6, 1, 1, 1, 1], None, 12.5, 8.0, (0.0, 0.05)),
    ("HF", [1, 9], diatomic(0.917), -65.1, 8.0, (1.3, 2.2)),
    ("HI", [1, 53], diatomic(1.609), 6.3, 6.0, (0.8, 1.8)),
    ("PH3", [15, 1, 1, 1], pyramid(1.420, 93.5), 1.3, 15.0, (1.5, 3.0)),
    ("CH3F", [6, 9, 1, 1, 1], methyl_x(1.383), -56.8, 8.0, (1.0, 2.3)),
    ("CH3Cl", [6, 17, 1, 1, 1], methyl_x(1.785), -19.6, 6.0, (1.0, 2.3)),
    ("CH3Br", [6, 35, 1, 1, 1], methyl_x(1.933), -9.1, 8.0, (1.0, 2.3)),
    ("CH3I", [6, 53, 1, 1, 1], methyl_x(2.132), 3.5, 8.0, (1.0, 2.3)),
    ("CS2", [16, 6, 16], linear3(1.553, 1.553), 28.0, 5.0, (0.0, 0.05)),
    ("methanol", [6, 8, 1, 1, 1, 1], None, -48.1, 10.0, (1.2, 2.3)),
    ("H2CO", [6, 8, 1, 1], None, -26.0, 9.0, (1.8, 2.9)),
    ("CH3SH", [6, 16, 1, 1, 1, 1], None, -5.5, 7.0, (1.3, 2.5)),
]


def _fixed_geometry(name):
    if name == "ethylene":
        th = np.radians(121.5)
        c0, c1 = np.array([0, 0, 0.0]), np.array([0, 0, 1.33])
        hx, hz = 1.09 * np.sin(th), 1.09 * np.cos(th)
        return np.asarray([c0, c1, c0 + [hx, 0, hz], c0 + [-hx, 0, hz], c1 + [hx, 0, -hz], c1 + [-hx, 0, -hz]])
    if name == "methanol":
        return np.asarray([
            [0, 0, 0], [0, 0, 1.425], [0.9, 0, 1.70],
            [1.03, 0, -0.36], [-0.51, 0.89, -0.36], [-0.51, -0.89, -0.36],
        ])
    if name == "H2CO":
        return np.asarray([[0, 0, 0], [0, 0, 1.22], [0.94, 0, -0.54], [-0.94, 0, -0.54]])
    if name == "CH3SH":
        sh = np.radians(96.5)
        return np.vstack([methyl_x(1.819), [[1.34 * np.sin(sh), 0, 1.819 - 1.34 * np.cos(sh)]]])
    raise KeyError(name)


@pytest.mark.parametrize("name,elements,coords,expt,window,dip", EXPT_WINDOW, ids=[r[0] for r in EXPT_WINDOW])
def test_expt_window_hof(name, elements, coords, expt, window, dip):
    if coords is None:
        coords = _fixed_geometry(name)
    h, res = hof_of(elements, coords)
    assert abs(h - expt) < window, (name, h, expt)
    assert abs(res.charges.sum()) < 1e-8
    if dip is not None:
        d = float(np.linalg.norm(res.dipole))
        assert dip[0] <= d <= dip[1], (name, d)


def test_halide_polarity_ordering():
    """q(H) in HX: F > Cl > Br (electronegativity ordering must survive)."""
    qs = {}
    for z, r in ((9, 0.917), (17, 1.275), (35, 1.414)):
        res = am1([1, z], diatomic(r))
        qs[z] = float(res.charges[0])
    assert qs[9] > qs[17] > qs[35] > 0.0, qs
