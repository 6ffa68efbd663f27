"""Compute AM1 HOFs/dipoles for the extended validation set (VERDICT r4
item 6) so test pins can be chosen honestly: recalled published AM1 values
are only pinned when this implementation independently lands on them;
otherwise the test pins an experiment-anchored window documented as such.

Geometries: minimal internal-coordinate optimization (symmetric molecules)
or fixed experimental geometry (window cases).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.optimize import minimize

from timemachine_tpu.qm import am1
from timemachine_tpu.qm.scf import heat_of_formation_kcal


def hof(elements, coords):
    res = am1(elements, coords)
    return heat_of_formation_kcal(res, elements), res


def opt_internal(build, x0, elements):
    f = lambda p: am1(elements, build(p)).energy_total
    m = minimize(f, np.asarray(x0, float), method="Nelder-Mead",
                 options=dict(xatol=1e-5, fatol=1e-8, maxiter=4000))
    return m.x


def ethane2(p):
    rcc, rch, theta = p  # theta = H-C-C angle
    th = np.radians(theta)
    c0, c1 = np.array([0, 0, 0.0]), np.array([0, 0, rcc])
    out = [c0, c1]
    for k in range(3):  # staggered
        phi = 2 * np.pi * k / 3
        out.append(c0 + np.array([rch * np.sin(th) * np.cos(phi), rch * np.sin(th) * np.sin(phi), -rch * np.cos(th)]))
    for k in range(3):
        phi = np.pi / 3 + 2 * np.pi * k / 3
        out.append(c1 + np.array([rch * np.sin(th) * np.cos(phi), rch * np.sin(th) * np.sin(phi), rch * np.cos(th)]))
    return np.asarray(out)


def ethylene(p):
    rcc, rch, theta = p  # theta = H-C-C angle
    th = np.radians(theta)
    c0, c1 = np.array([0, 0, 0.0]), np.array([0, 0, rcc])
    hx = rch * np.sin(th)
    return np.asarray([
        c0, c1,
        c0 + [hx, 0, -rch * np.cos(th)], c0 + [-hx, 0, -rch * np.cos(th)],
        c1 + [hx, 0, rch * np.cos(th)], c1 + [-hx, 0, rch * np.cos(th)],
    ])


def acetylene(p):
    rcc, rch = p
    return np.asarray([[0, 0, 0], [0, 0, rcc], [0, 0, -rch], [0, 0, rcc + rch]])


def benzene(p):
    rcc, rch = p
    ring_r = rcc  # hexagon circumradius == bond length
    out = []
    for k in range(6):
        a = np.pi * k / 3
        out.append([ring_r * np.cos(a), ring_r * np.sin(a), 0.0])
    for k in range(6):
        a = np.pi * k / 3
        out.append([(ring_r + rch) * np.cos(a), (ring_r + rch) * np.sin(a), 0.0])
    return np.asarray(out)


def diatomic(r):
    return np.asarray([[0, 0, 0], [0, 0, r]])


def methyl_x(rcx, rch=1.10, theta=109.0):
    """CH3-X along +z (theta = H-C-X angle, so H z-component = cos(theta) < 0)."""
    th = np.radians(theta)
    out = [[0, 0, 0.0], [0, 0, rcx]]
    for k in range(3):
        phi = 2 * np.pi * k / 3
        out.append([rch * np.sin(th) * np.cos(phi), rch * np.sin(th) * np.sin(phi), rch * np.cos(th)])
    return np.asarray(out)


def bent(r, ang_deg):
    a = np.radians(ang_deg)
    return np.asarray([[0, 0, 0], [r, 0, 0], [r * np.cos(a), r * np.sin(a), 0]])


def pyramid(r, ang_deg):
    """XH3 with H-X-H angle ang."""
    a = np.radians(ang_deg)
    # place 3 H symmetric about z with polar angle th s.t. HXH = ang
    # cos(ang) = cos^2(th') ... solve numerically
    from scipy.optimize import brentq

    def f(th):
        v1 = np.array([np.sin(th), 0, np.cos(th)])
        v2 = np.array([np.sin(th) * np.cos(2 * np.pi / 3), np.sin(th) * np.sin(2 * np.pi / 3), np.cos(th)])
        return v1 @ v2 - np.cos(a)

    th = brentq(f, 0.3, np.pi / 2)  # acute-polar root (bracket holds one root)
    out = [[0, 0, 0.0]]
    for k in range(3):
        phi = 2 * np.pi * k / 3
        out.append([r * np.sin(th) * np.cos(phi), r * np.sin(th) * np.sin(phi), r * np.cos(th)])
    return np.asarray(out)


def report(name, elements, coords, expt=None):
    h, res = hof(elements, coords)
    dip = float(np.linalg.norm(res.dipole))
    dev = "" if expt is None else f" expt {expt:+8.1f} dev {h - expt:+6.1f}"
    print(f"{name:12s} HOF {h:+9.2f} kcal  dipole {dip:5.2f} D{dev}", flush=True)
    return h, dip


def main():
    # --- optimized pins (published AM1 candidates) ---
    p = opt_internal(ethane2, [1.50, 1.11, 111.0], [6, 6, 1, 1, 1, 1, 1, 1])
    report("ethane", [6, 6] + [1] * 6, ethane2(p), -20.0)
    p = opt_internal(ethylene, [1.33, 1.10, 122.0], [6, 6, 1, 1, 1, 1])
    report("ethylene", [6, 6, 1, 1, 1, 1], ethylene(p), 12.5)
    p = opt_internal(acetylene, [1.20, 1.06], [6, 6, 1, 1])
    report("acetylene", [6, 6, 1, 1], acetylene(p), 54.5)
    p = opt_internal(benzene, [1.40, 1.10], [6] * 6 + [1] * 6)
    report("benzene", [6] * 6 + [1] * 6, benzene(p), 19.8)

    # methanol (fixed near-expt geometry)
    ch3oh = np.asarray([
        [0, 0, 0], [0, 0, 1.425],  # C, O
        [0.9, 0, 1.70],            # H(O)
        [1.03, 0, -0.36], [-0.51, 0.89, -0.36], [-0.51, -0.89, -0.36],
    ])
    report("methanol", [6, 8, 1, 1, 1, 1], ch3oh, -48.1)
    # formaldehyde
    h2co = np.asarray([[0, 0, 0], [0, 0, 1.22], [0.94, 0, -0.54], [-0.94, 0, -0.54]])
    report("H2CO", [6, 8, 1, 1], h2co, -26.0)
    # CO2
    report("CO2", [8, 6, 8], np.asarray([[0, 0, -1.16], [0, 0, 0], [0, 0, 1.16]]), -94.1)
    # HCN
    report("HCN", [1, 6, 7], np.asarray([[0, 0, -1.07], [0, 0, 0], [0, 0, 1.16]]), 31.5)

    # --- hydrides / halides at experimental geometry (window pins) ---
    report("HF", [1, 9], diatomic(0.917), -65.1)
    report("HCl", [1, 17], diatomic(1.275), -22.1)
    report("HBr", [1, 35], diatomic(1.414), -8.7)
    report("HI", [1, 53], diatomic(1.609), 6.3)
    report("H2S", [16, 1, 1], bent(1.336, 92.1), -4.9)
    report("PH3", [15, 1, 1, 1], pyramid(1.420, 93.5), 1.3)
    report("CH3F", [6, 9, 1, 1, 1], methyl_x(1.383), -56.8)
    report("CH3Cl", [6, 17, 1, 1, 1], methyl_x(1.785), -19.6)
    report("CH3Br", [6, 35, 1, 1, 1], methyl_x(1.933), -9.1)
    report("CH3I", [6, 53, 1, 1, 1], methyl_x(2.132), 3.5)
    sh = np.radians(96.5)  # C-S-H angle; H sits on the far side of S from C
    ch3sh = np.vstack([methyl_x(1.819), [[1.34 * np.sin(sh), 0, 1.819 - 1.34 * np.cos(sh)]]])
    report("CH3SH", [6, 16, 1, 1, 1, 1], ch3sh, -5.5)
    report("CS2", [16, 6, 16], np.asarray([[0, 0, -1.553], [0, 0, 0], [0, 0, 1.553]]), 28.0)
    # dimethyl ether (C-O-C)
    a = np.radians(111.7)
    c1 = np.array([1.41, 0, 0]); c2 = np.array([1.41 * np.cos(a), 1.41 * np.sin(a), 0])
    def methyl_at(c, toward):
        z = (c - toward) / np.linalg.norm(c - toward)
        # arbitrary orthogonal
        x = np.cross(z, [0, 0, 1.0]); x = x / (np.linalg.norm(x) + 1e-12)
        if np.linalg.norm(x) < 0.5: x = np.cross(z, [0, 1.0, 0]); x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        th = np.radians(180.0 - 110.0)  # H-C-O = 110 deg; z points AWAY from O
        hs = []
        for k in range(3):
            phi = 2 * np.pi * k / 3
            d = np.sin(th) * (np.cos(phi) * x + np.sin(phi) * y) + np.cos(th) * z
            hs.append(c + 1.10 * d)
        return hs
    dme = np.vstack([[0, 0, 0], c1, c2] + methyl_at(c1, np.zeros(3)) + methyl_at(c2, np.zeros(3)))
    report("Me2O", [8, 6, 6] + [1] * 6, dme, -44.0)


if __name__ == "__main__":
    main()
