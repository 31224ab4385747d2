#!/usr/bin/env bash
# Round-4 on-chip measurement sweep: headline (overlapped feed + spec
# stats), training step, 3DFF pretrain iteration, 12-view waypoint
# program.  Run each mode serially on the tunneled chip; every mode
# prints ONE JSON line appended to runs/bench_round4.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=runs/bench_round4.jsonl
mkdir -p runs
# cold-cache full-scale compiles over the tunnel can take 20-40 min per
# mode; give each one headroom beyond the 2700 s default watchdog
export DYNAM3D_BENCH_BUDGET_S="${DYNAM3D_BENCH_BUDGET_S:-5200}"
run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  ( "$@" 2>/tmp/bench_r4_$name.err | tail -1 | sed "s/^/{\"mode\": \"$name\", \"line\": /; s/$/}/" ) >> "$OUT" \
    || echo "{\"mode\": \"$name\", \"error\": true}" >> "$OUT"
}
run headline  env DYNAM3D_BENCH_STEPS=12 python bench.py
run train     env DYNAM3D_BENCH_MODE=train DYNAM3D_BENCH_STEPS=6 python bench.py
run pretrain  env DYNAM3D_BENCH_MODE=pretrain DYNAM3D_BENCH_STEPS=3 python bench.py
run waypoint  env DYNAM3D_BENCH_MODE=waypoint python bench.py
echo "done -> $OUT" >&2
