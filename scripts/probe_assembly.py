"""In-scan cost of the protein-tail force ASSEMBLY strategies on the real
solvated-DHFR term sets (bond/angle tails, propers, impropers, exclusion
tail): scatter-add (current production) vs the scatter-free atom-major
cumsum plan (ops/assembly.py) vs sorted segment_sum.

Timing methodology: evolving-carry lax.scan (ARCHITECTURE.md "only in-scan
timings are trustworthy").

    nohup timeout 2400 python scripts/probe_assembly.py > /tmp/probe_assembly.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 400


def timed_scan(name, step_fn, carry0, n_steps=N_STEPS):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), carry, None, length=n_steps)[0]

    out = jax.block_until_ready(run(carry0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(carry0))
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{name:45s} {dt * 1e3:8.3f} ms/step", flush=True)
    return dt


def main():
    from timemachine_tpu.ops import bonded as B
    from timemachine_tpu.ops import nonbonded as NB
    from timemachine_tpu.ops.assembly import assemble_forces, build_contrib_plan
    from timemachine_tpu.ops.pallas.rowscan_kernel import es_energy_force_series
    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    cfg = setup_dhfr_native(waters_first=True)
    hs = cfg.host_system
    n = cfg.conf.shape[0]
    nw = cfg.num_water_atoms // 3

    bond_idxs = np.asarray(hs.bond.potential.idxs)
    bond_params = np.asarray(hs.bond.params)
    angle_idxs = np.asarray(hs.angle.potential.idxs)
    angle_params = np.asarray(hs.angle.params)
    prop_idxs = np.asarray(hs.proper.potential.idxs)
    prop_params = np.asarray(hs.proper.params)
    imp_idxs = np.asarray(hs.improper.potential.idxs)
    imp_params = np.asarray(hs.improper.params)

    nb = hs.nonbonded_all_pairs
    exc_idxs = np.asarray(nb.potential.exclusion_idxs)
    exc_scales = np.asarray(nb.potential.scale_factors)
    nw_exc = NB.leading_water_exclusions(exc_idxs, exc_scales)
    exc_tail = exc_idxs[3 * nw_exc :]
    exc_tail_scales = jnp.asarray(exc_scales[3 * nw_exc :])
    nb_params = jnp.asarray(np.asarray(nb.params), jnp.float32)
    h_coeffs, _ = es_energy_force_series(nb.potential.beta, nb.potential.cutoff)
    beta, cutoff = nb.potential.beta, nb.potential.cutoff

    nw_b = B._leading_water_bonds(bond_idxs)
    nw_a = B._leading_water_angles(angle_idxs)
    bt, btp = bond_idxs[2 * nw_b :], jnp.asarray(bond_params[2 * nw_b :], jnp.float32)
    at, atp = angle_idxs[nw_a:], jnp.asarray(angle_params[nw_a:], jnp.float32)
    ptp = jnp.asarray(prop_params, jnp.float32)
    itp = jnp.asarray(imp_params, jnp.float32)
    print(
        f"tails: bonds {len(bt)} angles {len(at)} propers {len(prop_idxs)} "
        f"impropers {len(imp_idxs)} excl {len(exc_tail)} (waters {nw})",
        flush=True,
    )
    n_contrib = 2 * len(bt) + 3 * len(at) + 4 * (len(prop_idxs) + len(imp_idxs)) + 2 * len(exc_tail)
    print(f"total contribution rows: {n_contrib}", flush=True)

    box = jnp.asarray(cfg.box, jnp.float32)
    x0 = jnp.asarray(cfg.conf, jnp.float32)

    def contribs(x):
        u1, cb = B.bond_force_contribs(x, btp, bt)
        u2, ca = B.angle_force_contribs(x, atp, at)
        u3, cp = B.torsion_force_contribs(x, ptp, prop_idxs)
        u4, ci = B.torsion_force_contribs(x, itp, imp_idxs)
        u5, ce = NB.specific_pairs_force_contribs(x, nb_params, box, exc_tail, beta, cutoff, exc_tail_scales, h_coeffs)
        # exclusion correction force enters the total as +dU/dx = -f
        ce = [-ce[0], -ce[1]]
        return [cb, ca, cp, ci, ce]

    # A: current production — per-term scatter-add assembly
    def step_scatter(x):
        _, f1 = B.generic_bond_energy_force(x, btp, box, bt)
        _, f2 = B.generic_angle_energy_force(x, atp, box, at)
        _, f3 = B.torsion_energy_force(x, ptp, box, prop_idxs)
        _, f4 = B.torsion_energy_force(x, itp, box, imp_idxs)
        _, f5 = NB.specific_pairs_energy_force(x, nb_params, box, exc_tail, beta, cutoff, exc_tail_scales, h_coeffs)
        f = f1 + f2 + f3 + f4 - f5
        return x + 1e-9 * jnp.clip(f, -100.0, 100.0)

    groups = [bt, at, prop_idxs, imp_idxs, np.asarray(exc_tail)]
    plan = build_contrib_plan(groups, n)
    counts = np.diff(plan.starts)
    print(f"plan: L={plan.perm.shape[0]} max contribs/atom={counts.max()} mean(nonzero)={counts[counts > 0].mean():.1f}", flush=True)

    # B: scatter-free cumsum assembly
    def step_cumsum(x):
        cs = contribs(x)
        f = assemble_forces(plan, cs)
        return x + 1e-9 * jnp.clip(f, -100.0, 100.0)

    # C: sorted segment_sum over the same atom-major permutation
    seg_ids = jnp.asarray(
        np.repeat(np.arange(n + 1), np.diff(np.concatenate([plan.starts, [plan.perm.shape[0]]])))[: plan.perm.shape[0]],
        jnp.int32,
    )

    def step_segsum(x):
        cs = contribs(x)
        c = jnp.concatenate([a for g in cs for a in g], axis=0)[plan.perm]
        f = jax.ops.segment_sum(c, seg_ids, num_segments=n + 1, indices_are_sorted=True)[:n]
        return x + 1e-9 * jnp.clip(f, -100.0, 100.0)

    # parity before timing
    f_a = step_scatter(x0) - x0
    f_b = step_cumsum(x0) - x0
    f_c = step_segsum(x0) - x0
    print(
        f"parity: |B-A|max {float(jnp.abs(f_b - f_a).max()):.3e} "
        f"|C-A|max {float(jnp.abs(f_c - f_a).max()):.3e} scale {float(jnp.abs(f_a).max()):.3e}",
        flush=True,
    )

    timed_scan("A scatter-add (production)", step_scatter, x0)
    timed_scan("B cumsum plan (scatter-free)", step_cumsum, x0)
    timed_scan("C sorted segment_sum", step_segsum, x0)

    # D: math only, no assembly (lower bound)
    def step_math(x):
        cs = contribs(x)
        acc = 0.0
        for g in cs:
            for a in g:
                acc = acc + jnp.sum(a[:, 0]) + jnp.sum(a[:, 1]) + jnp.sum(a[:, 2])
        return x + 1e-16 * acc
    timed_scan("D term math only (no assembly)", step_math, x0)


if __name__ == "__main__":
    main()
