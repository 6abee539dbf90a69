#!/usr/bin/env python
"""A/B: windowed fuse scatter (scatter_window_log2=16) vs plain, at pool
capacity 2^17 and 2^18, full integrate on the bench orbit.

Third arm of the capacity-overhead decision tree (PROGRESS.md): if the
TPU scatter emitter does an O(operand) pass (or buffer assignment copies
a pool array through the scatter), bounding the scatter operand to a
2^16-row window around the live rows erases the capacity dependence —
the windowed step should time ~equal at 2^17 and 2^18 while the plain
step keeps its +6-9 ms gap.  If windowed times equal plain at BOTH
capacities, the overhead lives elsewhere (trace_summary is next).

Protocol lives in scripts/capacity_ab.py (shared with ab_index_hints).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from capacity_ab import run_capacity_ab  # noqa: E402

if __name__ == "__main__":
    run_capacity_ab(
        "scatter_window_log2", [0, 16], labels=["plain  ", "win=2^16"]
    )
