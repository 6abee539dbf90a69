#!/usr/bin/env python
"""Time ONE online-step configuration in a fresh process.

Usage: python scripts/online_one.py {unet|fast|none} {fused|split}

Companion to profile_online.py for the r5 online>=60 campaign: measures
the full host->volume step (H2D + seg + fuse) at the bench config for
one (seg arch, dispatch mode) pair.  One process per config — the axon
relay client degrades when large executables alternate in-process
(PROGRESS.md r5), and cross-config contamination is exactly what this
isolates.
"""
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

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)
MAX_DEPTH = 4.0
N = 60


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "unet"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fused"
    cfg = TSDFConfig(
        voxel_size=0.004, truncation=0.024,
        num_buckets_log2=19, num_blocks_log2=18,
        max_candidates=32768, max_visible=32768, max_new_per_round=8192,
        max_probe=16, sampler_splits=2, alloc_stride=4, alloc_every=3,
    )
    frames = load_replay_frames(N, W, H) or make_orbit_frames(N, W, H, K)
    host_frames = [
        (
            np.clip(f[1], 0, 255).astype(np.uint8),
            np.clip(f[2] * 5000.0, 0, 65535).astype(np.uint16),
            f[0],
        )
        for f in frames
    ]

    from disinfect_slam_tpu.models.segmentation import (
        create_model, load_default_params,
    )
    from disinfect_slam_tpu.systems.online_step import FusedOnlineStep

    if arch == "none":
        model = params = None
    else:
        model = create_model(arch=arch)
        params = load_default_params(arch=arch)

    online = FusedOnlineStep(
        cfg, K, H, W, MAX_DEPTH, seg_model=model, seg_params=params,
        depth_factor=5000.0, split_dispatch=(mode == "split"),
    )
    warm = max(cfg.alloc_every, 1)
    for f in host_frames[:warm]:
        online.step(*f)
    online.block_until_ready()
    t0 = time.perf_counter()
    for f in host_frames[warm:]:
        online.step(*f)
    online.block_until_ready()
    n = len(host_frames) - warm
    ms = (time.perf_counter() - t0) / n * 1e3
    print(
        f"[online_one] arch={arch} mode={mode}: {ms:.2f} ms/frame "
        f"({1e3 / ms:.2f} FPS), active={online.num_active_blocks()}",
        flush=True,
    )


if __name__ == "__main__":
    main()
