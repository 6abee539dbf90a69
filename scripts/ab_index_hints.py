#!/usr/bin/env python
"""A/B: index_hints on/off x pool capacity 2^17/2^18, full integrate.

Directly answers the open capacity-overhead question (PROGRESS.md): if
the +6-9 ms fixed cost at 2^18 comes from the scatter emitter's
collision handling, hints-on erases it; if not, the gap survives both
settings and the trace is the next tool.

Protocol lives in scripts/capacity_ab.py (shared with
ab_scatter_window).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from capacity_ab import run_capacity_ab  # noqa: E402

if __name__ == "__main__":
    run_capacity_ab("index_hints", [False, True], labels=["hints=off", "hints=on "])
