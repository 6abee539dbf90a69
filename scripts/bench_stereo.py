#!/usr/bin/env python
"""Stereo matcher latency A/B: flat cost volume vs coarse-to-fine
(VERDICT r3 #6: <= 33 ms @ 64 disparities VGA).

Timing is CHAINED with a data dependence per iteration and ONE sync at
the end — through the axon relay, per-iteration block_until_ready adds
a ~33 ms round trip per sample and unchained same-input loops report
nonsense (see PROGRESS.md r4 notes).

Run on an idle host (PROGRESS.md contention rule).

Measured v5e (idle, chained, n=30): flat 24.6 ms, pyramid L2B2 33.1 ms,
L1B2 32.1 ms at VGA/64; HD/128: flat 80.3, pyramid L2 100.3 — the
pyramid's per-hypothesis take_along_axis gathers (~140M desc/s on TPU)
cost more than the flat path's free shift-slices, so flat is the TPU
default everywhere.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from disinfect_slam_tpu.ops.stereo import block_match, block_match_pyramid  # noqa: E402

H, W, D = 480, 640, 64
rng = np.random.default_rng(0)
left = rng.uniform(0, 1, (H, W)).astype(np.float32)
right = np.roll(left, -13, axis=1)
ld, rd = jax.device_put(left), jax.device_put(right)


@partial(jax.jit, static_argnames=("kind", "levels", "band"))
def step(l, r, kind, levels=2, band=2):
    if kind == "flat":
        disp, valid = block_match(l, r, max_disp=D)
    else:
        disp, valid = block_match_pyramid(
            l, r, max_disp=D, levels=levels, band=band
        )
    # chain the outputs into the next input (anti-DCE, anti-reorder)
    return l + (jnp.sum(disp) + jnp.sum(valid)) * 0.0, disp


def timeit(kind, n=30, **kw):
    l, disp = step(ld, rd, kind, **kw)
    float(jnp.sum(disp))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        l, disp = step(l, rd, kind, **kw)
    float(jnp.sum(disp))  # one sync at the end
    return (time.perf_counter() - t0) / n * 1e3


if __name__ == "__main__":
    flat = timeit("flat")
    print(f"flat      : {flat:.1f} ms")
    for levels in (1, 2):
        for band in (2, 3):
            ms = timeit("pyr", levels=levels, band=band)
            print(f"pyr L{levels} B{band} : {ms:.1f} ms ({flat / ms:.1f}x)")
