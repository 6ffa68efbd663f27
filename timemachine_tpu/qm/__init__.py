"""Native semi-empirical QM (AM1) for base partial charges.

The reference framework obtains AM1-family charges from the proprietary
OpenEye backend (`timemachine/ff/handlers/nonbonded.py:343-520`); this
package implements the published AM1 model directly so that AM1/AM1BCC
base charges are computed natively, with no licensed backend and no
network access. Host-side numpy only — charge generation is a one-shot
system-build step, never part of the TPU hot path.
"""

from timemachine_tpu.qm.scf import AM1Result, AM1System, SCFConvergenceError, am1

__all__ = ["AM1Result", "AM1System", "SCFConvergenceError", "am1"]
