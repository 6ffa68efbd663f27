"""Dump the 23k-atom water benchmark system to /tmp/water23k.npz for the
sweep probes (scripts/probe_*.py). Host-side build only — forces
JAX_PLATFORMS=cpu before any jax import so it never touches the TPU backend."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    from timemachine_tpu.md.builders import build_water_system

    box_width = (23_000 / 3 / 33.3) ** (1 / 3)
    host_config = build_water_system(box_width)
    nb = host_config.host_system.nonbonded_all_pairs
    # Write to a temp path and atomically rename so a killed/timed-out dump
    # never leaves a truncated npz that later sessions silently reuse.
    tmp = "/tmp/water23k.npz.tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            x0=host_config.conf,
            box=host_config.box,
            params=np.asarray(nb.params),
            cutoff=nb.potential.cutoff,
            beta=nb.potential.beta,
        )
    os.replace(tmp, "/tmp/water23k.npz")
    print("wrote /tmp/water23k.npz", host_config.conf.shape)


if __name__ == "__main__":
    main()
