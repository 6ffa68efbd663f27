#!/bin/bash
# One-shot TPU measurement session for the dotscan decision + bench refresh.
# Self-contained: regenerates probe data (CPU-side), health-checks the
# tunnel (see ARCHITECTURE.md "TPU tunnel operational notes"), then runs the
# A/B. Never start this while another python process holds the backend.
#
#   nohup bash scripts/tpu_measure_session.sh > /tmp/tpu_session.log 2>&1 &
#
# Produces, in order (each step gated on the previous):
#  1. scripts/probe_dotscan.py    — dotscan vs rowscan sweep cost in an
#                                   evolving-state scan (dot_r2 on/off)
#  2. bench.py                    — end-to-end referee, current default kernel
#  3. bench.py --kernel dot       — end-to-end referee, dotscan MD provider
# Decision rule (ARCHITECTURE.md): flip the bench/provider default to dot
# only if step 3 beats step 2 end-to-end; probes alone do not decide.

set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

# Validate any existing probe npz is actually loadable before reusing it
# (a dump killed mid-write used to leave a truncated file behind).
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
timeout 2400 python scripts/probe_dotscan.py
timeout 2400 python scripts/probe_dhfr.py
timeout 1500 python bench.py
timeout 1500 python bench.py --kernel dot
echo "session complete"
