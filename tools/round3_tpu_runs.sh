#!/bin/bash
# Round-3 TPU measurement sequence, one session to keep the compile cache
# warm and minimize tunnel round-trips.  Appends everything to $LOG.
set -u
LOG=${LOG:-/tmp/round3_tpu.log}
cd "$(dirname "$0")/.."

echo "=== $(date -u +%H:%M:%S) decode A/B (unfused/split/layer/ring) ===" >> "$LOG"
DYNAM3D_AB_TOKENS=128,8 python -u tools/ab_fused_decode.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) per-phase decode profile ===" >> "$LOG"
python -u tools/prof_decode_parts.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) int8-prefill matmul A/B ===" >> "$LOG"
python -u tools/bench_int8_prefill.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) render bench (32k patches, tuned) ===" >> "$LOG"
DYNAM3D_BENCH_MODE=render DYNAM3D_BENCH_FRAMES=56 python -u bench.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) serve bench (upload A/B) ===" >> "$LOG"
DYNAM3D_BENCH_MODE=serve python -u bench.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) headline bench (default config) ===" >> "$LOG"
python -u bench.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) headline bench (W8A8 prefill opt-in) ===" >> "$LOG"
DYNAM3D_W8A8_PREFILL=1 python -u bench.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) done ===" >> "$LOG"
