"""timemachine_tpu: a TPU-native differentiable MD + free energy framework.

Capability parity target: proteneer/timemachine (see /root/repo/SURVEY.md).
Pure JAX/XLA/Pallas compute path; no CUDA, no pybind layer.
"""

__version__ = "0.1.0"
