"""Tile census of the PRODUCTION rowscan builder on real DHFR: swept slots
(after the per-step bare-cutoff chop) for sort/cell-size variants, plus the
UNROLL padding overhead. CPU-side (JAX_PLATFORMS=cpu)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CUTOFF = 1.2
SKIN = 0.1


def census(conf, params, box, cell_size, sort):
    import jax.numpy as jnp

    from timemachine_tpu.ops.pallas.rowscan_kernel import (
        COL,
        ROW,
        UNROLL,
        build_rowscan_tiles,
        chop_row_counts,
    )

    n = conf.shape[0]
    n_pad = (-(-n // COL) + 1) * COL
    cap = (n_pad // ROW) * (-(-(n_pad // COL) // UNROLL) * UNROLL)
    out = build_rowscan_tiles(
        jnp.asarray(conf, jnp.float32),
        jnp.asarray(params, jnp.float32),
        jnp.asarray(box, jnp.float32),
        CUTOFF + SKIN,
        max_pairs=cap,
        cell_size=cell_size,
        triangular=True,
        sort=sort,
        with_ranks=True,
    )
    pad_order, row_start, row_count, col_ids, rank_mat, overflow = out
    # chunk-major atoms for the chop
    box_diag = jnp.diagonal(jnp.asarray(box, jnp.float32))
    wrapped = jnp.asarray(conf[:, :3], jnp.float32) - box_diag * jnp.floor(jnp.asarray(conf[:, :3], jnp.float32) / box_diag)
    xs = wrapped[pad_order]
    nc = n_pad // COL
    atoms_cm = jnp.tile(xs.T.reshape(3, nc, COL).transpose(1, 0, 2), (1, 3, 1))[:, :8]
    chopped = chop_row_counts(atoms_cm[:, :8], rank_mat, row_count, box, CUTOFF)
    built = int(np.asarray(row_count).sum())
    chop = int(np.asarray(chopped).sum())
    # kernel trip count rounds each row's chopped count up to UNROLL
    trips = int((-(-np.asarray(chopped) // UNROLL) * UNROLL).sum())
    n_rows = n_pad // ROW
    diag = n_rows  # peeled covering tile per row
    print(
        f"sort={sort:7s} cell={cell_size:.2f}: built tiles {built:6d}  chopped {chop:6d}  "
        f"swept (trips+diag) {(trips + diag) * ROW * COL / 1e6:6.1f} M slots"
    )


def main():
    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    cfg = setup_dhfr_native(waters_first=True)
    conf = np.asarray(cfg.conf, np.float64)[:, :3]
    box = np.asarray(cfg.box, np.float64)
    params = np.zeros((conf.shape[0], 4), np.float32)
    for sort in ("snake",):
        for cell in (0.9, 1.0, 1.1, 1.2, 1.245, 1.3, 1.4, 1.556):
            census(conf, params, box, cell, sort)


if __name__ == "__main__":
    main()
