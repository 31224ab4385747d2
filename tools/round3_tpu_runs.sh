#!/bin/bash
# Round-3 TPU measurement sequence, one session to keep the compile cache
# warm and minimize tunnel round-trips.  Appends everything to $LOG.
set -u
LOG=${LOG:-/tmp/round3_tpu.log}
cd "$(dirname "$0")/.."

echo "=== $(date -u +%H:%M:%S) fused-decode A/B ===" >> "$LOG"
python -u tools/ab_fused_decode.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) render bench (morton ON) ===" >> "$LOG"
DYNAM3D_BENCH_MODE=render python -u bench.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) render bench (morton OFF) ===" >> "$LOG"
DYNAM3D_BENCH_MODE=render DYNAM3D_DISABLE_MORTON_KNN=1 \
    python -u bench.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) serve bench (upload A/B) ===" >> "$LOG"
DYNAM3D_BENCH_MODE=serve python -u bench.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) headline bench ===" >> "$LOG"
python -u bench.py >> "$LOG" 2>&1

echo "=== $(date -u +%H:%M:%S) done ===" >> "$LOG"
