#!/usr/bin/env python
"""Summarize a jax.profiler trace: top device ops by total duration.

Usage:
  DSTPU_PROFILE=/tmp/prof python bench.py          # or any profiled run
  python scripts/trace_summary.py /tmp/prof [N]

Reads the chrome-trace json(.gz) that jax.profiler.stop_trace writes
under <dir>/plugins/profile/<ts>/ and aggregates complete events by
name.  No tensorboard needed — this is how we attribute frame time to
fusion/copy/scatter ops through the remote-attached TPU."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def find_traces(root):
    pats = [
        os.path.join(root, "**", "*.trace.json.gz"),
        os.path.join(root, "**", "*.trace.json"),
    ]
    out = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
    return sorted(out)


def load(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    traces = find_traces(root)
    if not traces:
        print(f"no *.trace.json(.gz) under {root}", file=sys.stderr)
        sys.exit(1)
    path = traces[-1]
    print(f"# {path}")
    data = load(path)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # identify device lanes (TPU/device PIDs) from process metadata
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")

    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        # keep compute lanes (TPU device lanes; /host:CPU XLA lanes on
        # the CPU backend); skip python/runtime threads
        if not any(
            k in pname.lower() for k in ("tpu", "device", "xla", "/host:cpu")
        ):
            continue
        d = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        dur_by_name[name] += d
        cnt_by_name[name] += 1
        total += d
    if not dur_by_name:
        print("no device events found; process lanes were:")
        for pid, n in sorted(pid_name.items()):
            print(f"  pid {pid}: {n}")
        sys.exit(2)

    print(f"# total device-lane time: {total/1e3:.2f} ms "
          f"({len(dur_by_name)} distinct ops)")
    rows = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top_n]
    width = max(len(n) for n, _ in rows)
    for name, d in rows:
        print(f"{d/1e3:9.2f} ms  {cnt_by_name[name]:6d}x  "
              f"{name[:120]:{min(width,120)}}")


if __name__ == "__main__":
    main()
