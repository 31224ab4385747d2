#!/usr/bin/env bash
# VLN IL training (the reference's scripts/main.bash train equivalent).
# Multi-host: set JAX_PROCESS_INDEX/JAX_PROCESS_COUNT + coordinator env.
set -euo pipefail
EXP=${1:-vln_exp}
shift || true
python -m dynam3d_tpu.run --run-type train --trainer Dynam3D --exp_name "$EXP" "$@"
