"""Dump the 23k-atom water benchmark system to /tmp/water23k.npz for the
sweep probes (scripts/probe_*.py). Host-side build only — run with
JAX_PLATFORMS=cpu so it never touches the TPU backend."""

import numpy as np


def main():
    from timemachine_tpu.md.builders import build_water_system

    box_width = (23_000 / 3 / 33.3) ** (1 / 3)
    host_config = build_water_system(box_width)
    nb = host_config.host_system.nonbonded_all_pairs
    np.savez(
        "/tmp/water23k.npz",
        x0=host_config.conf,
        box=host_config.box,
        params=np.asarray(nb.params),
        cutoff=nb.potential.cutoff,
        beta=nb.potential.beta,
    )
    print("wrote /tmp/water23k.npz", host_config.conf.shape)


if __name__ == "__main__":
    main()
