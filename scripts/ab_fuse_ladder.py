#!/usr/bin/env python
"""A/B the fuse-tail ladder (cfg.fuse_ladder) at the bench config.

Times the full integrate step (chained, donated) at ladder 1 / 4 / 8 on
the recorded orbit replay, and reports volume divergence of each ladder
vs the monolithic tail (expected: discrete columns exact, tsdf/prob at
the per-program-shape ulp bound — same contract class as the windowed
scatter).

Run on an idle host (PROGRESS.md contention rule).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import load_replay_frames, make_orbit_frames  # noqa: E402
from disinfect_slam_tpu.config import TSDFConfig  # noqa: E402
from disinfect_slam_tpu.core.geometry import (  # noqa: E402
    SE3, CameraIntrinsics, CameraParams,
)
from disinfect_slam_tpu.core.state import TSDFVolume  # noqa: E402
from disinfect_slam_tpu.ops.integrate import FrameInput, integrate  # noqa: E402

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)
MAX_DEPTH = 4.0
N = 30


def bench_cfg(ladder):
    return TSDFConfig(
        voxel_size=0.004, truncation=0.024,
        num_buckets_log2=19, num_blocks_log2=18,
        max_candidates=32768, max_visible=32768, max_new_per_round=8192,
        max_probe=16, sampler_splits=2, alloc_stride=4, alloc_every=3,
        scatter_window_log2=-1, fuse_ladder=ladder,
    )


def run(ladder, staged):
    cfg = bench_cfg(ladder)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    step = jax.jit(
        lambda v, f, m: integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    step_na = jax.jit(
        lambda v, f, m: integrate(
            v, f, cam, SE3.from_matrix(m), MAX_DEPTH, allocate=False),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(cfg)
    vol = step(vol, *staged[0])
    vol = step_na(vol, *staged[1])
    jax.block_until_ready(vol.tsdf)
    vol = TSDFVolume.create(cfg)
    jax.block_until_ready(vol.tsdf)
    t0 = time.perf_counter()
    for i, (fr, pose) in enumerate(staged):
        vol = (step if i % cfg.alloc_every == 0 else step_na)(vol, fr, pose)
    jax.block_until_ready(vol.tsdf)
    ms = (time.perf_counter() - t0) / len(staged) * 1e3
    return ms, vol


def main():
    ladders = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    frames = load_replay_frames(N, W, H) or make_orbit_frames(N, W, H, K)
    staged = [
        (
            FrameInput(
                rgb=jax.device_put(f[1]), depth=jax.device_put(f[2]),
                ht=jax.device_put(f[3]), lt=jax.device_put(f[4]),
            ),
            jax.device_put(f[0]),
        )
        for f in frames
    ]
    base_vol = None
    for lad in ladders:
        ms, vol = run(lad, staged)
        active = int(vol.num_active_blocks)
        line = f"ladder={lad}: {ms:.2f} ms/frame ({1e3 / ms:.2f} FPS), active={active}"
        if lad == ladders[0]:
            base_vol = vol
            base_active = active
            base_tsum = float(np.abs(np.asarray(vol.tsdf)).sum())
        else:
            tsum = float(np.abs(np.asarray(vol.tsdf)).sum())
            dt = np.abs(np.asarray(vol.tsdf) - np.asarray(base_vol.tsdf)).max()
            line += (f" | vs ladder={ladders[0]}: active {active - base_active:+d},"
                     f" |tsdf|sum rel dev {abs(tsum - base_tsum) / base_tsum:.2e},"
                     f" max|dtsdf| {dt:.2e}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
