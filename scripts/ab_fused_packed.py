#!/usr/bin/env python
"""A/B at bench scale: sampler="pallas" (split pipeline: sample kernel
+ XLA fusion math) vs "pallas_fused" (fuse_rows_packed: VMEM image +
packed-RGBW single kernel).  Chained, donated steps (see PROGRESS.md
contention warning: run alone)."""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import make_orbit_frames  # noqa: E402
from disinfect_slam_tpu.config import TSDFConfig  # noqa: E402
from disinfect_slam_tpu.core.geometry import SE3, CameraIntrinsics, CameraParams  # noqa: E402
from disinfect_slam_tpu.core.state import TSDFVolume  # noqa: E402
from disinfect_slam_tpu.ops import integrate as I  # noqa: E402

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)
BASE = TSDFConfig(
    voxel_size=0.004, truncation=0.024,
    num_buckets_log2=19, num_blocks_log2=18,
    max_candidates=32768, max_visible=32768,
    max_new_per_round=8192, max_probe=16,
    sampler_splits=2, alloc_stride=2,
)
MAX_DEPTH = 4.0
N_WARM = 30
N_TIME = 30


def run(sampler: str) -> float:
    cfg = dataclasses.replace(BASE, sampler=sampler)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    frames = make_orbit_frames(N_WARM + N_TIME, W, H, K)
    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(cfg)
    staged = [
        (
            jax.device_put(I.FrameInput(rgb=rgb, depth=depth, ht=ht, lt=lt)),
            jax.device_put(np.asarray(pose, np.float32)),
        )
        for pose, rgb, depth, ht, lt in frames
    ]
    for f, m in staged[:N_WARM]:
        vol = step(vol, f, m)
    jax.block_until_ready(vol.tsdf)
    t0 = time.perf_counter()
    for f, m in staged[N_WARM:]:
        vol = step(vol, f, m)
    jax.block_until_ready(vol.tsdf)
    dt = (time.perf_counter() - t0) / N_TIME * 1e3
    act = int(vol.num_active_blocks)
    print(f"[ab] sampler={sampler:13s} {dt:7.2f} ms/frame "
          f"({1e3 / dt:.2f} FPS)  active={act}", flush=True)
    return dt


def main():
    print(f"[ab] backend={jax.default_backend()}", flush=True)
    a = run("pallas")
    b = run("pallas_fused")
    print(f"[ab] fused-packed vs split: {b - a:+.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
