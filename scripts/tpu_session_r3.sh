#!/bin/bash
# Round-3 TPU measurement session: run SERIALLY (concurrent TPU jobs
# inflate numbers 15-30%, PROGRESS.md).  Each stage appends to
# /tmp/r3_session.log; safe to re-run (compile cache persists).
# Ordered so a short tunnel window still yields the decisive artifacts:
# parity gate -> scatter-scaling probe (the capacity question) ->
# stage budgets -> traced bench -> attribution.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3_session.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== r3 TPU session $(date) ==="

echo "--- [1/6] kernel parity gate (tpu_verify) ---"
timeout 900 python scripts/tpu_verify.py || { echo "VERIFY FAILED"; exit 1; }

echo "--- [2/6] scatter scaling probe (capacity-overhead suspect) ---"
timeout 1800 python scripts/probe_scatter_scaling.py

echo "--- [2b/6] index-hints x capacity A/B (full integrate) ---"
timeout 2400 python scripts/ab_index_hints.py

echo "--- [2c/6] windowed-scatter x capacity A/B (full integrate) ---"
timeout 2400 python scripts/ab_scatter_window.py

echo "--- [3/6] stage budget @ 2^17 ---"
timeout 1800 python scripts/profile_r3.py 17

echo "--- [4/6] stage budget @ 2^18 (the capacity-gap question) ---"
timeout 1800 python scripts/profile_r3.py 18

echo "--- [5/6] bench with profiler trace ---"
rm -rf /tmp/prof_r3
DSTPU_PROFILE=/tmp/prof_r3 timeout 1800 python bench.py

echo "--- [6/6] trace attribution ---"
python scripts/trace_summary.py /tmp/prof_r3 40

echo "=== session done $(date) ==="
