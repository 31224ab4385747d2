#!/usr/bin/env bash
# VLN evaluation (scripts/main.bash eval equivalent).
set -euo pipefail
EXP=${1:-vln_exp}
shift || true
python -m dynam3d_tpu.run --run-type eval --trainer Dynam3D --exp_name "$EXP" "$@"
