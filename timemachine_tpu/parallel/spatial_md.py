"""Spatially-decomposed full MD step over a device mesh.

The framework's PRIMARY multi-chip axis is replica parallelism (HREX,
parallel/replica_exchange.py): K independent replicas scale at ~100%
efficiency over ICI. This module covers the other regime — ONE large system
whose per-step work is partitioned across chips. ARCHITECTURE.md's scaling
table identified the limit of sharding only the nonbonded sweep
(ops/pallas/rowscan_kernel.rowscan_sweep_sharded): the serial tail
(bonded + exclusions + integrator + assemble, ~0.9 ms at 23k atoms) caps
8-chip efficiency at 34%. Here the WHOLE force pass is partitioned:

- nonbonded sweep: snake-sorted row chunks block-partitioned per device
  (column atom data replicated — ~1 MB at 23k atoms, far under the ICI
  budget); tile lists are rebuilt REPLICATED every `rebuild_interval` steps
  inside the scan (deterministic argsort => identical on every device);
- bonded terms and exclusion pairs: term lists block-partitioned per device
  (-1-padded rows, which the closed-form force fns mask out);
- ONE psum of the (N, 3) force array per step is the only communication.
  Positions/velocities stay replicated: the BAOAB update is elementwise-
  cheap, and replicating it removes the per-step all-gather that a
  position-sharded layout would need.

The step matches md/context.py's Langevin semantics exactly (same
fold_in(base_key, t) -> split -> normal noise stream), so a CPU-mesh
trajectory agrees with the single-device Context up to f32 reduction-order
differences — pinned by tests/test_spatial_md.py.

Reference parity note: the CUDA engine runs one GPU per system with no
multi-device decomposition (SURVEY §2.3.8); this component is new TPU-first
surface for the large-N regime (100k+ atoms) where per-chip row counts stay
high and the sweep dominates the step.

Scope: NVT Langevin (no movers). Supported potentials: Nonbonded
(all-pairs + exclusions), HarmonicBond, HarmonicAngle, PeriodicTorsion;
any other term runs replicated through jax.grad (correct, not partitioned).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.ops import nonbonded as nb_ops
from timemachine_tpu.ops.bonded import (
    generic_angle_energy_force,
    generic_bond_energy_force,
    torsion_energy_force,
)
from timemachine_tpu.ops.pallas.rowscan_kernel import (
    COL,
    ROW,
    _rowscan_call,
    _scalars,
    build_rowscan_tiles,
    es_energy_force_series,
    make_param_rows_fn,
    suggest_max_pairs,
)
from timemachine_tpu.potentials import (
    HarmonicAngle,
    HarmonicBond,
    Nonbonded,
    NonbondedInteractionGroup,
    PeriodicTorsion,
)


def _pad_terms(idxs, params, n_dev: int):
    """Pad a term list to a multiple of n_dev with -1 index rows (masked by
    the closed-form force fns) so it block-partitions evenly."""
    idxs = np.asarray(idxs).reshape(len(idxs), -1)
    params = np.asarray(params, dtype=np.float32)
    t = idxs.shape[0]
    tpad = max(n_dev, -(-t // n_dev) * n_dev)
    idxs_p = np.full((tpad, idxs.shape[1]), -1, dtype=np.int32)
    params_p = np.zeros((tpad,) + params.shape[1:], dtype=np.float32)
    if t:
        idxs_p[:t] = idxs
        params_p[:t] = params
    return idxs_p, params_p


def make_spatial_md_runner(
    bps,
    masses,
    mesh,
    axis_name: str = "spatial",
    rebuild_interval: int = 20,
    skin: float = 0.1,
    margin: float = 1.4,
    interpret: bool = False,
    conf0=None,
    box0=None,
):
    """Build a jitted n-step NVT Langevin runner whose force pass is
    partitioned over `mesh` along `axis_name`.

    bps: BoundPotentials (one Nonbonded all-pairs term required; its beta,
      cutoff and exclusions are taken from the potential object).
    conf0/box0: geometry used to size the static tile budget
      (suggest_max_pairs at cutoff + skin).

    Returns make_run(temperature, dt, friction, n_steps, barostat=None);
    make_run returns run(x0, v0, box, base_key) -> (x, v, box), all
    replicated across the mesh (box changes only under a barostat).
    """
    n_dev = int(np.prod(mesh.devices.shape))
    n = int(np.asarray(conf0).shape[0])

    # --- partition the potential list ---------------------------------------
    nb_pot = None
    nb_params = None
    bonded = []  # (force_fn, idxs_sharded, params_sharded)
    ig_terms = []  # (potential, params, b_idxs_padded, b_mask_padded) — cols partitioned
    grad_terms = []  # (potential, params) — replicated fallback
    for bp in bps:
        pot, params = bp.potential, np.asarray(bp.params)
        if isinstance(pot, Nonbonded):
            assert nb_pot is None, "one Nonbonded term supported"
            nb_pot, nb_params = pot, np.asarray(params, np.float32)
        elif isinstance(pot, (HarmonicBond, HarmonicAngle, PeriodicTorsion)) and len(pot.idxs) == 0:
            continue  # empty term list contributes nothing
        elif isinstance(pot, HarmonicBond):
            bonded.append((generic_bond_energy_force, *_pad_terms(pot.idxs, params, n_dev)))
        elif isinstance(pot, HarmonicAngle):
            bonded.append((generic_angle_energy_force, *_pad_terms(pot.idxs, params, n_dev)))
        elif isinstance(pot, PeriodicTorsion):
            bonded.append((torsion_energy_force, *_pad_terms(pot.idxs, params, n_dev)))
        elif isinstance(pot, NonbondedInteractionGroup):
            # ligand x environment grid: partition the ENVIRONMENT columns
            # (the large axis); padding duplicates column 0 with a False mask
            # so the grid-form force drops it (no double counting)
            b_idxs = pot.col_atom_idxs
            if b_idxs is None:
                b_idxs = np.setdiff1d(np.arange(int(np.asarray(conf0).shape[0])), np.asarray(pot.row_atom_idxs))
            b_idxs = np.asarray(b_idxs, np.int32)
            c = len(b_idxs)
            cpad = max(n_dev, -(-c // n_dev) * n_dev)
            b_p = np.full(cpad, int(b_idxs[0]) if c else 0, np.int32)
            b_p[:c] = b_idxs
            b_mask = np.zeros(cpad, bool)
            b_mask[:c] = True
            ig_terms.append((pot, np.asarray(params, np.float32), b_p, b_mask))
        else:
            grad_terms.append((pot, jnp.asarray(params)))

    assert nb_pot is not None, "spatial MD requires a Nonbonded all-pairs term"
    beta, cutoff = float(nb_pot.beta), float(nb_pot.cutoff)
    h_coeffs, p_coeffs = es_energy_force_series(beta, cutoff)
    exc_idxs, exc_scales = nb_pot._filtered
    exc_idxs_p, exc_scales_p = _pad_terms(exc_idxs, exc_scales, n_dev)

    max_pairs = suggest_max_pairs(
        np.asarray(conf0), np.asarray(box0), cutoff + skin, margin=margin, triangular=True
    )

    # row-chunk partition: pad the per-row arrays (and the sorted-row scatter
    # map) so every device gets L row chunks; fake rows have count 0 and
    # contribute exact zeros
    n_pad = (-(-n // COL) + 1) * COL
    n_rows = n_pad // ROW
    rows_local = -(-n_rows // n_dev)
    n_rows_padded = rows_local * n_dev
    param_rows = make_param_rows_fn(None)

    def build_tiles(x, box):
        pad_order, row_start, row_count, col_ids, _ = build_rowscan_tiles(
            x, jnp.asarray(nb_params), box, cutoff + skin, max_pairs=max_pairs, triangular=True
        )
        pad = n_rows_padded - n_rows
        row_start = jnp.concatenate([row_start, jnp.zeros(pad, row_start.dtype)])
        row_count = jnp.concatenate([row_count, jnp.zeros(pad, row_count.dtype)])
        prows, prowsT = param_rows(nb_params, pad_order, n)
        return pad_order, row_start, row_count, col_ids, prows, prowsT

    def make_run(temperature, dt, friction, n_steps: int, barostat=None):
        """barostat: optional md.barostat.MonteCarloBarostat descriptor —
        volume moves run REPLICATED (identical keys and, after the psum,
        identical energies on every device) with the rigid-move energy
        (sweep only: bonded and exclusion terms are bond-graph-local and
        cancel exactly in the volume move's dU, matching the Context's
        rigid_only skip)."""
        intg = LangevinIntegrator(temperature, dt, friction, masses, seed=0)
        ca, cb, cc = intg.coefficients()
        ca = float(ca)  # np f64 scalar would promote the f32 carry under x64
        cb32 = jnp.asarray(cb, jnp.float32)
        cc32 = jnp.asarray(cc, jnp.float32)

        def local_step(x, box, tiles, dev_idx, b_terms, exc_local, ig_locals):
            """Per-device force contribution (N, 3); caller psums."""
            pad_order, row_start, row_count, col_ids, prows, prowsT = tiles
            box_diag = jnp.diagonal(box)
            wrapped = x[:, :3] - box_diag * jnp.floor(x[:, :3] / box_diag)
            xyzN = wrapped[pad_order]
            z1 = jnp.zeros((1, n_pad), jnp.float32)
            atoms8 = jnp.concatenate([xyzN.T, prows, z1], axis=0)
            atoms_cm = atoms8.reshape(8, n_pad // COL, COL).transpose(1, 0, 2)
            atomsT = jnp.concatenate([xyzN, prowsT, z1.T], axis=1)

            # this device's row slab (fake tail rows: count 0 -> zero output)
            row_base = dev_idx * rows_local
            rs_local = jax.lax.dynamic_slice_in_dim(row_start, row_base, rows_local)
            rc_local = jax.lax.dynamic_slice_in_dim(row_count, row_base, rows_local)
            atom_base = row_base * ROW
            atomsT_pad = jnp.concatenate(
                [atomsT, jnp.zeros((n_rows_padded * ROW - n_pad, 8), jnp.float32)], axis=0
            )
            atomsT_local = jax.lax.dynamic_slice_in_dim(atomsT_pad, atom_base, rows_local * ROW)

            out_rows, out_cols = _rowscan_call(
                atomsT_local,
                atoms_cm,
                rs_local,
                rc_local,
                col_ids,
                _scalars(box, cutoff),
                rows_local,
                row_base=row_base.reshape(1).astype(jnp.int32),
                h_coeffs=h_coeffs,
                p_coeffs=p_coeffs,
                compute_u=False,
                interpret=interpret,
                triangular=True,
            )
            # scatter du/dx back to atom order; fake-row outputs are exact
            # zeros and padding pad_order entries duplicate real atoms with
            # zero parameter rows (zero contributions) — both scatter-safe
            scatter_map = jnp.concatenate(
                [pad_order, jnp.zeros(n_rows_padded * ROW - n_pad, pad_order.dtype)]
            )
            local_map = jax.lax.dynamic_slice_in_dim(scatter_map, atom_base, rows_local * ROW)
            du_dx = jnp.zeros((n, 3), jnp.float32)
            du_dx = du_dx.at[local_map].add(out_rows[:, 1:4])
            du_dx = du_dx.at[pad_order].add(out_cols[1:4].T)
            force = -du_dx

            # exclusion correction (negated pair energies): force += +dU_exc/dx
            e_idx, e_scl = exc_local
            if exc_idxs_p.shape[0]:
                _, f_exc = nb_ops.specific_pairs_energy_force(
                    x, jnp.asarray(nb_params), box, e_idx, beta, cutoff, e_scl, h_coeffs
                )
                force = force - f_exc  # f_exc = -dU_exc/dx

            for (fn, _, _), (t_idx, t_par) in zip(bonded, b_terms):
                _, f_b = fn(x, t_par, box, t_idx)
                force = force + f_b

            for (pot, p_ig, _, _), (b_local, m_local) in zip(ig_terms, ig_locals):
                _, f_ig = nb_ops.interaction_group_energy_force(
                    x, jnp.asarray(p_ig), box, pot.row_atom_idxs, b_local, pot.beta, pot.cutoff,
                    col_mask=m_local,
                )
                force = force + f_ig
            return force

        def local_sweep_u(x, box, tiles, dev_idx):
            """This device's share of the all-pairs energy (triangular sweep
            counts each Newton pair once on its row side, so summing local
            row energies and psum-ing is exact). Reuses the cached tiles,
            like the Context's MC-mover energy path (valid within skin/2)."""
            pad_order, row_start, row_count, col_ids, prows, prowsT = tiles
            box_diag = jnp.diagonal(box)
            wrapped = x[:, :3] - box_diag * jnp.floor(x[:, :3] / box_diag)
            xyzN = wrapped[pad_order]
            z1 = jnp.zeros((1, n_pad), jnp.float32)
            atoms8 = jnp.concatenate([xyzN.T, prows, z1], axis=0)
            atoms_cm = atoms8.reshape(8, n_pad // COL, COL).transpose(1, 0, 2)
            atomsT = jnp.concatenate([xyzN, prowsT, z1.T], axis=1)
            row_base = dev_idx * rows_local
            rs_local = jax.lax.dynamic_slice_in_dim(row_start, row_base, rows_local)
            rc_local = jax.lax.dynamic_slice_in_dim(row_count, row_base, rows_local)
            atomsT_pad = jnp.concatenate(
                [atomsT, jnp.zeros((n_rows_padded * ROW - n_pad, 8), jnp.float32)], axis=0
            )
            atomsT_local = jax.lax.dynamic_slice_in_dim(atomsT_pad, row_base * ROW, rows_local * ROW)
            out_rows, _ = _rowscan_call(
                atomsT_local,
                atoms_cm,
                rs_local,
                rc_local,
                col_ids,
                _scalars(box, cutoff),
                rows_local,
                row_base=row_base.reshape(1).astype(jnp.int32),
                h_coeffs=h_coeffs,
                p_coeffs=p_coeffs,
                compute_u=True,
                interpret=interpret,
                triangular=True,
            )
            return jnp.sum(out_rows[:, 0])

        def sharded_body(x0, v0, box0_arr, base_key, b_terms, exc_local, ig_locals):
            dev_idx = jax.lax.axis_index(axis_name)
            tiles0 = build_tiles(x0, box0_arr)
            baro_state0 = barostat.init_state() if barostat is not None else jnp.zeros(())

            def step(carry, _):
                x, v, box, t, tiles, baro_state = carry
                tiles = jax.lax.cond(
                    (t % rebuild_interval) == 0, lambda: build_tiles(x, box), lambda: tiles
                )
                f_local = local_step(x, box, tiles, dev_idx, b_terms, exc_local, ig_locals)
                for pot, p in grad_terms:
                    f_local = f_local + (-jax.grad(lambda xx: pot(xx, p, box))(x)) / n_dev
                force = jax.lax.psum(f_local, axis_name)

                # identical noise stream to md/context.py step_fn
                key_t = jax.random.fold_in(base_key, t)
                k_int, k_movers = jax.random.split(key_t)
                noise = jax.random.normal(k_int, x.shape, dtype=x.dtype)
                v_mid = v + cb32 * force
                v_new = ca * v_mid + cc32 * noise
                x_new = x + 0.5 * dt * (v_mid + v_new)

                if barostat is not None:
                    # replicated volume move with the PARTITIONED rigid-move
                    # energy; all devices draw identical keys and see the
                    # identical psum'd energy, so accept decisions agree
                    def u_fn(xx, bb):
                        return jax.lax.psum(local_sweep_u(xx, bb, tiles, dev_idx), axis_name)

                    move_fn = barostat.make_move_fn(u_fn)
                    mk = jax.random.fold_in(k_movers, 0)
                    due = ((t + 1) % barostat.interval) == 0

                    def do_move(args):
                        st, xx, vv, bb = args
                        return move_fn(st, xx, vv, bb, mk)

                    baro_state, x_new, v_new, box = jax.lax.cond(
                        due, do_move, lambda a: a, (baro_state, x_new, v_new, box)
                    )
                return (x_new, v_new, box, t + 1, tiles, baro_state), None

            (x, v, box, _, _, _), _ = jax.lax.scan(
                step, (x0, v0, box0_arr, 0, tiles0, baro_state0), None, length=n_steps
            )
            return x, v, box

        from jax.sharding import PartitionSpec as P

        # the experimental entry point (like rowscan_sweep_sharded uses)
        # still accepts check_rep; positions/velocities are replicated by
        # construction but the checker can't prove it through the psum
        from jax.experimental.shard_map import shard_map

        term_specs = tuple((P(axis_name), P(axis_name)) for _ in bonded)
        sharded = shard_map(
            sharded_body,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), term_specs, (P(axis_name), P(axis_name)),
                      tuple((P(axis_name), P(axis_name)) for _ in ig_terms)),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )

        @jax.jit
        def run(x0, v0, box, base_key):
            b_terms = tuple((jnp.asarray(ti), jnp.asarray(tp)) for _, ti, tp in bonded)
            return sharded(
                jnp.asarray(x0, jnp.float32),
                jnp.asarray(v0, jnp.float32),
                jnp.asarray(box, jnp.float32),
                base_key,
                b_terms,
                (jnp.asarray(exc_idxs_p), jnp.asarray(exc_scales_p)),
                tuple((jnp.asarray(bp_), jnp.asarray(mk_)) for _, _, bp_, mk_ in ig_terms),
            )

        return run

    return make_run
