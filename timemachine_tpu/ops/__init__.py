"""Pure compute ops: energy functions over (conf, params, box) plus geometry utils.

Everything here is functional JAX — jit/grad/vmap-safe, static shapes.
"""
