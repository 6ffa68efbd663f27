"""Regenerate ff/params/placeholder_ff.json — a minimal wildcard forcefield
used by tests that need *a* valid parameterization rather than physical
parameters (ref timemachine/ff/make_placeholder_ff.py).

Run from anywhere: python -m timemachine_tpu.ff.make_placeholder_ff
"""

from pathlib import Path

import numpy as np

from timemachine_tpu.ff import Forcefield
from timemachine_tpu.ff.handlers import (
    HarmonicAngleHandler,
    HarmonicBondHandler,
    ImproperTorsionHandler,
    LennardJonesHandler,
    LennardJonesIntraHandler,
    LennardJonesSolventHandler,
    ProperTorsionHandler,
    SimpleChargeHandler,
    SimpleChargeIntraHandler,
    SimpleChargeSolventHandler,
)
from timemachine_tpu.ff.serialize import serialize_handlers


def build_placeholder_ff() -> Forcefield:
    return Forcefield(
        hb_handle=HarmonicBondHandler(smirks=["[*:1]~[*:2]"], params=np.array([[1e5, 1e-1]]), props=None),
        ha_handle=HarmonicAngleHandler(smirks=["[*:1]~[*:2]~[*:3]"], params=np.array([[1e2, np.pi / 2]]), props=None),
        pt_handle=ProperTorsionHandler(smirks=["[*:1]~[*:2]~[*:3]~[*:4]"], params=np.array([[1.0, 0.0, 1]]), props=None),
        it_handle=ImproperTorsionHandler(
            smirks=["[*:1]~[#6X3,#7X3:2](~[*:3])~[*:4]"], params=np.array([[1.0, np.pi, 2]]), props=None
        ),
        q_handle=SimpleChargeHandler(smirks=["[*:1]"], params=np.zeros(1), props=None),
        q_handle_intra=SimpleChargeIntraHandler(smirks=["[*:1]"], params=np.zeros(1), props=None),
        lj_handle=LennardJonesHandler(smirks=["[*:1]"], params=np.array([[0.1, 1.0]]), props=None),
        lj_handle_intra=LennardJonesIntraHandler(smirks=["[*:1]"], params=np.array([[0.1, 1.0]]), props=None),
        env_bcc_handle=None,
        protein_ff="amber99sbildn",
        water_ff="amber14/tip3p",
    )


def main():
    ff = build_placeholder_ff()
    # the shipped file also carries the solvent charge/LJ variants
    # (reference make_placeholder_ff.py writes them via its solvent slots)
    extra = [
        SimpleChargeSolventHandler(smirks=["[*:1]"], params=np.zeros(1), props=None),
        LennardJonesSolventHandler(smirks=["[*:1]"], params=np.array([[0.1, 1.0]]), props=None),
    ]
    handlers = [
        ff.hb_handle, ff.ha_handle, ff.pt_handle, ff.it_handle,
        ff.q_handle, ff.q_handle_intra, ff.lj_handle, ff.lj_handle_intra, *extra,
    ]
    out = Path(__file__).parent / "params" / "placeholder_ff.json"
    out.write_text(serialize_handlers(handlers, ff.protein_ff, ff.water_ff, fmt="json"))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
