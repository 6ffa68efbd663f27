#!/bin/bash
# Round-3 TPU measurement session #2: price sorted-state MD assemble
# variants (scripts/probe_sorted.py). Self-contained; never start while
# another python process holds the TPU.
#
#   nohup bash scripts/tpu_session_sorted.sh > /tmp/tpu_session_sorted.log 2>&1 &

set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

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
timeout 2400 python scripts/probe_sorted.py
echo "session complete"
