#!/bin/bash
cd /root/repo
for i in $(seq 1 48); do
  if python -c "
import bench, sys
sys.exit(0 if bench._tpu_alive(timeout=120) else 1)" 2>/dev/null; then
    echo "[watch] TPU alive at $(date), running bench" >&2
    timeout 3600 python bench.py > /tmp/bench_tpu.json 2> /tmp/bench_tpu.log
    echo "[watch] bench done: $(cat /tmp/bench_tpu.json)" >&2
    exit 0
  fi
  echo "[watch] probe $i: tpu down at $(date)" >&2
  sleep 300
done
echo "[watch] gave up" >&2
exit 1
