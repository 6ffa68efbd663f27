"""Split the DHFR NPT step cost: full system vs no-exclusions vs
no-protein-bonded-tail. Timing methodology = bench.py (Context.multiple_steps
twice, second timed); variants alter term content, not shapes, so numbers are
comparable. dt=0 freezes the dynamics (same compute graph, no integration
drift) because the stripped variants are not physically integrable.

    nohup timeout 3600 python scripts/probe_dhfr.py > /tmp/probe_dhfr.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(variant: str):
    from timemachine_tpu.fe.model_utils import apply_hmr
    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    cfg = setup_dhfr_native(waters_first=True)
    hs = cfg.host_system
    n_w = cfg.num_water_atoms

    if variant in ("no_baro", "nb_only_baro"):
        pass  # potential content unchanged; mover/term selection below
    elif variant == "no_excl":
        # keep only the water exclusions (first rows after waters-first sort)
        nb = hs.nonbonded_all_pairs
        e = np.asarray(nb.potential.exclusion_idxs)
        s = np.asarray(nb.potential.scale_factors)
        keep = np.all(e < n_w, axis=1)
        from timemachine_tpu import potentials
        from timemachine_tpu.fe.system import HostSystem

        hs = HostSystem(
            bond=hs.bond,
            angle=hs.angle,
            proper=hs.proper,
            improper=hs.improper,
            nonbonded_all_pairs=potentials.Nonbonded(
                cfg.conf.shape[0], e[keep], s[keep], nb.potential.beta, nb.potential.cutoff
            ).bind(np.asarray(nb.params)),
        )
    elif variant == "no_protein_bonded":
        from timemachine_tpu import potentials
        from timemachine_tpu.fe.system import HostSystem

        def trim(pot_cls, bp, width):
            idxs = np.asarray(bp.potential.idxs)
            params = np.asarray(bp.params)
            keep = np.all(idxs < n_w, axis=1)
            return pot_cls(idxs[keep].astype(np.int32)).bind(params[keep])

        hs = HostSystem(
            bond=trim(potentials.HarmonicBond, hs.bond, 2),
            angle=trim(potentials.HarmonicAngle, hs.angle, 3),
            proper=trim(potentials.PeriodicTorsion, hs.proper, 4),
            improper=trim(potentials.PeriodicTorsion, hs.improper, 4),
            nonbonded_all_pairs=hs.nonbonded_all_pairs,
        )

    bps = hs.get_U_fns()
    nb = hs.nonbonded_all_pairs.potential
    nb.configure_pallas(cfg.box, cfg.conf)
    if variant in ("nb_only", "nb_only_baro", "nb_only_baro_every"):
        bps = [hs.nonbonded_all_pairs]
    masses = apply_hmr(cfg.masses, hs.bond.potential.idxs)
    return cfg, bps, masses


_X0_CACHE = {}


def run(variant: str):
    import jax.numpy as jnp

    from timemachine_tpu.integrators import LangevinIntegrator
    from timemachine_tpu.md.barostat import MonteCarloBarostat
    from timemachine_tpu.md.context import Context
    from timemachine_tpu.md.fire import FireMinimizationConfig, fire_minimize_jax
    from timemachine_tpu.md.utils import sample_velocities
    import jax

    cfg, bps, masses = build(variant)
    dtype = np.float32
    box = cfg.box

    # always relax with the FULL physics (stripped variants diverge)
    if "x0" not in _X0_CACHE:
        full_bps = build("full")[1] if variant != "full" else bps
        u_fn = lambda x: sum(bp(x, jnp.asarray(box, dtype)) for bp in full_bps)
        force = jax.jit(lambda x: -jax.grad(u_fn)(x))
        _X0_CACHE["x0"] = np.asarray(
            fire_minimize_jax(jnp.asarray(cfg.conf.astype(dtype)), force, FireMinimizationConfig(400))
        )
    x0 = _X0_CACHE["x0"]

    intg = LangevinIntegrator(300.0, 0.0, 1.0, masses, seed=2026)  # dt=0: same compute graph, frozen dynamics (stripped variants are not integrable)
    groups = list(cfg.host_topology.group_idxs)
    interval = 1 if variant == "nb_only_baro_every" else 25
    baro = MonteCarloBarostat(len(masses), 1.013, 300.0, groups, interval, seed=2027)
    movers = [] if variant in ("no_baro", "nb_only") else [baro]  # nb_only_baro_every: barostat fires every step
    v0 = sample_velocities(masses, 300.0, seed=2028).astype(dtype)
    ctxt = Context(x0, v0, box.astype(dtype), intg, bps, movers=movers)

    n_steps = 1000
    ctxt.multiple_steps(n_steps)
    t0 = time.perf_counter()
    ctxt.multiple_steps(n_steps)
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{variant:20s} {dt * 1e3:7.3f} ms/step", flush=True)


def main():
    import sys as _sys
    variants = _sys.argv[1:] or ["full", "no_baro", "no_excl", "no_protein_bonded", "nb_only", "nb_only_baro"]
    for variant in variants:
        run(variant)


if __name__ == "__main__":
    main()
