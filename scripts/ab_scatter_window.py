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

Run serially on an idle chip (PROGRESS.md contention warning).
"""
import os
import sys
import time

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
MAX_DEPTH = 4.0
ITERS = 15


def run(blocks_log2: int, wlog2: int) -> float:
    cfg = TSDFConfig(
        voxel_size=0.004, truncation=0.024,
        num_buckets_log2=19, num_blocks_log2=blocks_log2,
        max_candidates=32768, max_visible=32768,
        max_new_per_round=8192, max_probe=16,
        sampler_splits=2, alloc_stride=2,
        scatter_window_log2=wlog2,
    )
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    frames = make_orbit_frames(30, W, H, K)
    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(cfg)
    for pose_np, rgb, depth, ht, lt in frames:
        fr = I.FrameInput(rgb=jnp.asarray(rgb), depth=jnp.asarray(depth),
                          ht=jnp.asarray(ht), lt=jnp.asarray(lt))
        vol = step(vol, fr, jnp.asarray(pose_np))
    jax.block_until_ready(vol.tsdf)

    pose_np, rgb, depth, ht, lt = frames[0]
    fr = I.FrameInput(rgb=jax.device_put(jnp.asarray(rgb)),
                      depth=jax.device_put(jnp.asarray(depth)),
                      ht=jax.device_put(jnp.asarray(ht)),
                      lt=jax.device_put(jnp.asarray(lt)))
    pose = jax.device_put(jnp.asarray(pose_np))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        vol = step(vol, fr, pose)
    jax.block_until_ready(vol.tsdf)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    active = int(vol.num_active_blocks)
    label = f"win=2^{wlog2}" if wlog2 else "plain  "
    print(f"  2^{blocks_log2} {label}: {ms:7.2f} ms/frame  (active {active})",
          flush=True)
    return ms


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    res = {}
    for log2 in (17, 18):
        for wlog2 in (0, 16):
            res[(log2, wlog2)] = run(log2, wlog2)
    gap_plain = res[(18, 0)] - res[(17, 0)]
    gap_win = res[(18, 16)] - res[(17, 16)]
    print(f"capacity gap: plain {gap_plain:+.2f} ms, windowed {gap_win:+.2f} ms",
          flush=True)
    print(f"window effect at 2^18: {res[(18, 16)] - res[(18, 0)]:+.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
