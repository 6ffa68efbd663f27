"""NVT segment move: a few steps of unadjusted Langevin dynamics
(ref timemachine/md/thermostat/moves.py)."""

from timemachine_tpu.md.context import Context
from timemachine_tpu.md.moves import Move
from timemachine_tpu.md.states import CoordsVelBox


class UnadjustedLangevinMove(Move[CoordsVelBox]):
    """n_steps of Langevin dynamics applied as a (non-Metropolized) move.

    The reference constructs a fresh CUDA Context per move
    (thermostat/moves.py:12-21); here ONE Context is built lazily and reset
    per move — the jitted scan runner then compile-caches on the
    (integrator, potentials, n_steps) shapes and every subsequent move is a
    pure device launch.
    """

    def __init__(self, integrator, bound_potentials, n_steps: int = 5):
        self.integrator = integrator
        self.bound_potentials = bound_potentials
        self.n_steps = n_steps
        self._ctxt = None

    def move(self, x: CoordsVelBox) -> CoordsVelBox:
        if self._ctxt is None:
            self._ctxt = Context(x.coords, x.velocities, x.box, self.integrator, self.bound_potentials)
        else:
            self._ctxt.set_x_t(x.coords)
            self._ctxt.set_v_t(x.velocities)
            self._ctxt.set_box(x.box)
        self._ctxt.multiple_steps(self.n_steps)
        return CoordsVelBox(self._ctxt.get_x_t(), self._ctxt.get_v_t(), x.box.copy())
