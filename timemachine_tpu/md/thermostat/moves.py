"""NVT segment move: a few steps of unadjusted Langevin dynamics
(ref timemachine/md/thermostat/moves.py)."""

from timemachine_tpu.md.context import Context
from timemachine_tpu.md.moves import Move
from timemachine_tpu.md.states import CoordsVelBox


class UnadjustedLangevinMove(Move[CoordsVelBox]):
    """Runs n_steps of Langevin dynamics as a (non-Metropolized) move.

    Unlike the reference, which rebuilds a CUDA Context per move
    (thermostat/moves.py:12-21), the jitted scan runner is compile-cached per
    (integrator, potentials) so constructing a fresh Context per move stays
    cheap after the first call.
    """

    def __init__(self, integrator, bound_potentials, n_steps: int = 5):
        self.integrator = integrator
        self.bound_potentials = bound_potentials
        self.n_steps = n_steps

    def move(self, x: CoordsVelBox) -> CoordsVelBox:
        ctxt = Context(x.coords, x.velocities, x.box, self.integrator, self.bound_potentials)
        ctxt.multiple_steps(self.n_steps)
        return CoordsVelBox(ctxt.get_x_t(), ctxt.get_v_t(), x.box.copy())
