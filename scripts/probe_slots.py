"""Offline (CPU) slot-count study for the rowscan occupancy problem.

Counts, on the real solvated-DHFR system:
  1. ideal pair count (r < cutoff, Newton-halved) — the occupancy floor;
  2. current production tiles: 32-row x 128-col, Euclidean bbox-gap cull
     (triangular + peeled diagonal), after the per-step bare-cutoff chop;
  3. compacted-column scheme: cull at (32-row x K-col) granularity, then
     pack each row's included K-chunks into 128-lane tiles (ceil(m/(128/K))
     tiles per row) — the slot count a kernel with K-granular dynamic lane
     loads would sweep.

Run with JAX_PLATFORMS=cpu; writes one line per scheme.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROW = 32
CUTOFF = 1.2
SKIN = 0.1


def hilbert_order(conf, box):
    import jax.numpy as jnp

    from timemachine_tpu.ops.pallas.quadscan_kernel import _hilbert_keys

    box_diag = np.diagonal(box)
    wrapped = conf - box_diag * np.floor(conf / box_diag)
    frac = wrapped / box_diag
    frac = frac - np.floor(frac)
    keys = np.asarray(_hilbert_keys(jnp.asarray(frac, jnp.float32)))
    return np.argsort(keys), wrapped


def chunk_bboxes(xs, size):
    n = xs.shape[0]
    nc = n // size
    xr = xs[: nc * size].reshape(nc, size, 3)
    return xr.min(axis=1), xr.max(axis=1)


def gap2(rmin, rmax, cmin, cmax, box_diag):
    rcen = 0.5 * (rmin + rmax)
    rhal = 0.5 * (rmax - rmin)
    ccen = 0.5 * (cmin + cmax)
    chal = 0.5 * (cmax - cmin)
    dc = rcen[:, None, :] - ccen[None, :, :]
    dc = dc - box_diag * np.floor(dc / box_diag + 0.5)
    gap = np.maximum(np.abs(dc) - (rhal[:, None, :] + chal[None, :, :]), 0.0)
    return np.sum(gap * gap, axis=2)


def main():
    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    cfg = setup_dhfr_native(waters_first=True)
    conf = np.asarray(cfg.conf, np.float64)[:, :3]
    box = np.asarray(cfg.box, np.float64)
    box_diag = np.diagonal(box)
    n = conf.shape[0]
    print(f"n_atoms {n} box {box_diag}")

    order, wrapped = hilbert_order(conf, box)
    xs = wrapped[order]
    n_pad = (-(-n // 128) + 1) * 128
    xs_pad = np.concatenate([xs, np.repeat(xs[:1], n_pad - n, axis=0)])  # pad w/ dup atom0 (conservative)
    valid = np.zeros(n_pad, bool)
    valid[:n] = True

    # 1. ideal pairs (cell-list count, Newton-halved)
    from scipy.spatial import cKDTree

    tree = cKDTree(np.mod(xs, box_diag), boxsize=box_diag)
    ideal = tree.count_neighbors(tree, CUTOFF) - n  # ordered pairs, excl self
    print(f"ideal pairs (r<{CUTOFF}, Newton): {ideal // 2 / 1e6:.2f} M")

    n_rows = n_pad // ROW
    rmin, rmax = chunk_bboxes(xs_pad, ROW)

    # 2. current: 128-col triangular cull at cutoff (chop granularity)
    for COL in (128, 64, 32, 16, 8):
        cmin, cmax = chunk_bboxes(xs_pad, COL)
        n_cols = n_pad // COL
        d2 = gap2(rmin, rmax, cmin, cmax, box_diag)
        r_win = (np.arange(n_rows) * ROW) // COL
        tri = np.arange(n_cols)[None, :] > r_win[:, None]
        inter = (d2 < CUTOFF * CUTOFF) & tri
        m = inter.sum(axis=1)
        pack = 128 // COL
        tiles = np.ceil(m / pack).astype(int)
        slots_raw = int(m.sum()) * ROW * COL  # perfectly compacted (no pack waste)
        slots_packed = int(tiles.sum()) * ROW * 128
        # diagonal (covering) tiles: one 128-wide peel per row
        diag = n_rows * ROW * 128
        print(
            f"col={COL:4d}: included chunks {int(m.sum()):8d}  "
            f"packed tiles {int(tiles.sum()):7d}  slots {(slots_packed + diag) / 1e6:7.1f} M "
            f"(raw compacted {(slots_raw + diag) / 1e6:7.1f} M)"
        )

    # contiguous-window covering at 32 granularity (staggered windows, no gather)
    COL = 32
    cmin, cmax = chunk_bboxes(xs_pad, COL)
    n_cols = n_pad // COL
    d2 = gap2(rmin, rmax, cmin, cmax, box_diag)
    r_win = (np.arange(n_rows) * ROW) // COL
    tri = np.arange(n_cols)[None, :] > r_win[:, None]
    inter = (d2 < CUTOFF * CUTOFF) & tri
    windows = 0
    for r in range(n_rows):
        ids = np.nonzero(inter[r])[0]
        i = 0
        while i < len(ids):
            windows += 1
            end = ids[i] + 4  # 128-lane window covers 4 chunks
            j = i
            while j < len(ids) and ids[j] < end:
                j += 1
            i = j
    print(f"staggered 128-windows over 32-chunks: {windows} tiles, slots {(windows * ROW * 128 + n_rows * ROW * 128) / 1e6:.1f} M")


if __name__ == "__main__":
    main()
