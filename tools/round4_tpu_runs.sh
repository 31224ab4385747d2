#!/bin/bash
# Round-4 hardware session (run as ONE background process; NEVER kill it
# mid-run — a killed TPU compile/transfer wedges the tunnel ~45-60 min).
#
#   nohup bash tools/round4_tpu_runs.sh &   # or a background Bash task
#
# Sequence: tunnel probe -> prefill attribution -> batched ring decode at
# B=4 (short 8->32 chains; the 128-token batched chain hit a >80-min
# compile-server stall last session) -> fresh default-headline bench.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/round4_tpu.log}"
{
  echo "=== probe $(date -u) ==="
  python -u -c "
import numpy as np, jax, jax.numpy as jnp
print(jax.default_backend())
print(np.asarray(jnp.ones(2)))
"
  echo "=== prof_prefill $(date -u) ==="
  python -u tools/prof_prefill.py

  echo "=== batched ring decode B=4 (8->32 chains) $(date -u) ==="
  DYNAM3D_AB_BATCH=4 DYNAM3D_AB_TOKENS=32,8 \
    DYNAM3D_AB_ONLY=ring DYNAM3D_AB_NO_CONTROL=1 \
    python -u tools/ab_fused_decode.py

  echo "=== bench default (W8A8 prefill + lm_at headline) $(date -u) ==="
  python -u bench.py

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
