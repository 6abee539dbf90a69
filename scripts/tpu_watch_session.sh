#!/bin/bash
# Detached watcher: probe the TPU tunnel every 5 min; when it answers,
# run the full round-3 measurement session (scripts/tpu_session_r3.sh)
# followed by a clean (un-profiled) bench.py for the headline JSON.
# Designed to run under nohup/setsid; writes progress to /tmp/watch_r3.log.
cd "$(dirname "$0")/.."
for i in $(seq 1 96); do
  if timeout 300 python -c "
import bench, sys
sys.exit(0 if bench._tpu_alive(timeout=240, retries=1) else 1)" 2>/dev/null; then
    echo "[watch] TPU alive at $(date); running full r3 session" >&2
    bash scripts/tpu_session_r3.sh /tmp/r3_session.log
    echo "[watch] session done; clean bench for the headline" >&2
    timeout 3600 python bench.py > /tmp/bench_tpu.json 2> /tmp/bench_tpu.log
    echo "[watch] bench done: $(cat /tmp/bench_tpu.json)" >&2
    exit 0
  fi
  echo "[watch] probe $i/96: tpu down at $(date)" >&2
  sleep 240
done
echo "[watch] gave up after ~8h" >&2
exit 1
