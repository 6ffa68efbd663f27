"""Per-potential execution latency harness — the analog of the reference's
`benchmark_potential` (tests/test_benchmark.py:148-193): for every bound
potential of a solvated RBFE window it reports

  execute:       one fused (u, du/dx) evaluation, and
  execute_batch: a (frames x param-sets) u_kln-style sweep (jit + vmap —
                 the reference's execute_batch analog, free_energy.py:1356),

in microseconds per call. Measurement method (see ARCHITECTURE.md): each
timed region is a 100-iteration lax.scan whose state feeds back into the
inputs (a standalone jitted call would measure ~1.5 ms of tunnel dispatch,
and XLA hoists loop-invariant bodies), timed at steady state after a warmup
call of identical shape.

Usage: python bench_potentials.py [--json]
"""

import argparse
import json
import time
import warnings

import numpy as np


def build_window(box_width=4.0):
    """hif2a-pair solvent window at lambda = 0 through the production path."""
    import jax

    from timemachine_tpu.fe.free_energy import InitialState  # noqa: F401 (import check)
    from timemachine_tpu.fe.single_topology import SingleTopology
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.md.builders import build_water_system
    from timemachine_tpu.testsystems.relative import get_hif2a_ligand_pair_single_topology

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mol_a, mol_b, core = get_hif2a_ligand_pair_single_topology()
        ff = Forcefield.load_default()
        st = SingleTopology(mol_a, mol_b, core, ff)
        host_config = build_water_system(box_width, mols=[mol_a, mol_b])
        host_system = st.combine_with_host(
            host_config.host_system, 0.0, host_config.num_water_atoms, ff, host_config.host_topology
        )
        ligand_conf = st.combine_confs(mol_a.get_conf(), mol_b.get_conf(), 0.0)
        x0 = np.concatenate([host_config.conf, ligand_conf]).astype(np.float32)
        box = np.asarray(host_config.box, np.float32)
    return host_system.get_U_fns(), x0, box


def time_scan(step_fn, x0, n_iters=100, n_reps=3):
    """Median seconds per iteration of an evolving-state scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(carry, _):
            return step_fn(carry), None

        out, _ = jax.lax.scan(body, x, None, length=n_iters)
        return out

    x0 = jnp.asarray(x0)
    run(x0).block_until_ready()  # compile + warmup
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        run(x0).block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n_iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=10, help="coords batch for execute_batch")
    parser.add_argument("--box-width", type=float, default=4.0, help="solvent box width (nm)")
    parser.add_argument("--param-sets", type=int, default=4, help="param batch for execute_batch")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    bps, x0, box = build_window(args.box_width)
    box_j = jnp.asarray(box)
    print(f"# device: {jax.devices()[0].platform}, atoms: {x0.shape[0]}, potentials: {len(bps)}")

    # production impls for the all-pairs term (mirrors bench.py)
    for bp in bps:
        if hasattr(bp.potential, "configure_pallas"):
            if jax.devices()[0].platform == "cpu":
                bp.potential.set_impl("tiled").configure_tiled(box, conf=x0)
            else:
                bp.potential.configure_pallas(box, x0)

    rng = np.random.default_rng(2026)
    rows = []
    for bp in bps:
        name = type(bp.potential).__name__
        params = jnp.asarray(bp.params)
        pot = bp.potential

        # execute: fused (u, du/dx); feed the (scaled) gradient back into x
        # so the scan state evolves and nothing hoists
        def exec_step(x, pot=pot, params=params):
            u, g = jax.value_and_grad(lambda xx: pot(xx, params, box_j))(x)
            return x - 1e-12 * g

        t_exec = time_scan(exec_step, x0)

        # execute_batch: (frames x param-sets) sweep via nested vmap over a
        # coords batch perturbed per-frame; u_kln workhorse shape
        frames = jnp.asarray(
            x0[None] + rng.normal(0, 1e-4, (args.frames,) + x0.shape).astype(np.float32)
        )
        params_batch = jnp.stack([params] * args.param_sets)

        def batch_step(fs, pot=pot):
            u_kl = jax.vmap(lambda p: jax.vmap(lambda x: pot(x, p, box_j))(fs))(params_batch)
            return fs + 1e-12 * jnp.mean(u_kl)  # feed back a scalar

        t_batch = time_scan(batch_step, frames)

        row = {
            "potential": name,
            "execute_us": round(t_exec * 1e6, 1),
            "execute_batch_us": round(t_batch * 1e6, 1),
            "batch_shape": [args.frames, args.param_sets],
        }
        rows.append(row)
        print(json.dumps(row))

    total = sum(r["execute_us"] for r in rows)
    print(json.dumps({"potential": "TOTAL(sum of execute)", "execute_us": round(total, 1)}))


if __name__ == "__main__":
    main()
