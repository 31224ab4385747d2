#!/usr/bin/env bash
# 3DFF pretraining (run_3dff/3dff.bash equivalent).
set -euo pipefail
EXP=${1:-3dff_exp}
shift || true
python -m dynam3d_tpu.run --run-type train --trainer SS-ETP --exp_name "$EXP" "$@"
