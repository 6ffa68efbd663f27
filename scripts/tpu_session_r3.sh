#!/bin/bash
# Round-3 TPU measurement session #1: kernel-work A/B (Horner ES, diagonal
# peel, per-step count chop, chunk-major assemble) + the VERDICT r2
# measurement items (compiled spatial step, production HREX aggregate).
# Self-contained; never start while another python process holds the TPU.
#
#   nohup bash scripts/tpu_session_r3.sh > /tmp/tpu_session_r3.log 2>&1 &
#
# Steps (all gated after the health check via set -e):
#  1. probe_dhfr.py           — DHFR step-cost breakdown (dt=0 variants)
#  2. bench.py                — driver headline (apo DHFR NPT ns/day)
#  3. probe_spatial_tpu.py    — spatial_md compiled (interpret=False), 1-dev mesh
#  4. bench_hrex_production.py — real hif2a solvent-window replica-parallel HREX

set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

# Validate any existing probe npz is actually loadable before reusing it.
JAX_PLATFORMS=cpu python - <<'EOF' 2>/dev/null || rm -f /tmp/water23k.npz
import numpy as np
d = np.load("/tmp/water23k.npz")
_ = d["x0"].shape, d["box"].shape, d["params"].shape
EOF
[ -f /tmp/water23k.npz ] || JAX_PLATFORMS=cpu timeout 600 python scripts/dump_water23k.py \
  || { echo 'probe-data dump failed; aborting'; exit 1; }

timeout 500 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('health', float((x@x).sum()), jax.devices())
" || { echo 'TPU unhealthy; aborting'; exit 1; }

set -e
timeout 2400 python scripts/probe_dhfr.py nb_only nb_only_baro nb_only_baro_every
timeout 2400 python scripts/probe_spatial_tpu.py
timeout 3600 python bench_hrex_production.py --n_states 8 --n_iters 5 --steps_per_iter 400
echo "session complete"
