#!/usr/bin/env bash
# Round-5 measurement + runway-green sweep (VERDICT r4 items 1, 5, 6, 10).
#
# TPU legs (serial, one chip): headline under the fixed 50-step protocol,
# IL train step at B=1 and B=8, 3DFF pretrain iteration, 12-view waypoint
# program (re-measuring the cold compile after the params-as-arguments fix).
# CPU legs (cheap, regression tripwires): spec acceptance both
# granularities, tokenizer checker self-test, copy-paste self-check, and
# (optionally, ~40 min) the full-size synth conversion round-trip.
#
# Every mode appends ONE JSON line to runs/bench_round5.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=runs/bench_round5.jsonl
mkdir -p runs
export DYNAM3D_BENCH_BUDGET_S="${DYNAM3D_BENCH_BUDGET_S:-5200}"
run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  ( "$@" 2>/tmp/bench_r5_$name.err | tail -1 | sed "s/^/{\"mode\": \"$name\", \"line\": /; s/$/}/" ) >> "$OUT" \
    || echo "{\"mode\": \"$name\", \"error\": true}" >> "$OUT"
}

# --- CPU tripwires first (fail fast, no chip time) ---
run spec_acceptance python -u tools/spec_acceptance.py --json
run check_tokenizer python -u tools/check_tokenizer.py --self-test --json
run copycheck       python -u tools/copycheck.py --json

# --- TPU measurement legs ---
run headline  env DYNAM3D_BENCH_STEPS=50 python -u bench.py
run train     env DYNAM3D_BENCH_MODE=train DYNAM3D_BENCH_STEPS=6 python -u bench.py
run train_b8  env DYNAM3D_BENCH_MODE=train DYNAM3D_BENCH_STEPS=4 DYNAM3D_BENCH_BATCH=8 python -u bench.py
run pretrain  env DYNAM3D_BENCH_MODE=pretrain DYNAM3D_BENCH_STEPS=3 python -u bench.py
run waypoint  env DYNAM3D_BENCH_MODE=waypoint python -u bench.py
run full_step_chain python -u tools/prof_full_step.py

# --- optional: full-size synth conversion round-trip (~40 min, CPU) ---
if [ "${DYNAM3D_R5_SYNTH:-0}" = "1" ]; then
  run parity_synth env JAX_PLATFORMS=cpu python -u tools/parity_run.py \
    --synth --scale full --no-episode --out /tmp/parity_conv_r5
fi
echo "done -> $OUT" >&2
