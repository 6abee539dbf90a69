#!/usr/bin/env python
"""Shared harness for the capacity-overhead A/Bs: time the full chained
donated integrate step on the bench orbit at pool capacity 2^17 and
2^18, sweeping ONE TSDFConfig field — so every A/B (index_hints,
scatter_window_log2, ...) measures under the identical warmup, donation
and timing protocol.  Run serially on an idle chip (PROGRESS.md
contention warning)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)
MAX_DEPTH = 4.0
ITERS = 15


def run_once(blocks_log2: int, label: str, **cfg_overrides) -> float:
    """One timed config: warm over the 30-frame orbit, then time the
    chained donated step on a staged frame."""
    from bench import make_orbit_frames
    from disinfect_slam_tpu.config import TSDFConfig
    from disinfect_slam_tpu.core.geometry import (
        SE3,
        CameraIntrinsics,
        CameraParams,
    )
    from disinfect_slam_tpu.core.state import TSDFVolume
    from disinfect_slam_tpu.ops import integrate as I

    cfg = TSDFConfig(
        voxel_size=0.004, truncation=0.024,
        num_buckets_log2=19, num_blocks_log2=blocks_log2,
        max_candidates=32768, max_visible=32768,
        max_new_per_round=8192, max_probe=16,
        sampler_splits=2, alloc_stride=2,
        **cfg_overrides,
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
    print(f"  2^{blocks_log2} {label}: {ms:7.2f} ms/frame  (active {active})",
          flush=True)
    return ms


def run_capacity_ab(field: str, values, labels=None):
    """Sweep cfg.<field> over `values` at 2^17 and 2^18 capacity; print
    per-config times plus the capacity gap for each value."""
    print(f"platform={jax.devices()[0].platform}", flush=True)
    labels = labels or [f"{field}={v}" for v in values]
    res = {}
    for log2 in (17, 18):
        for v, lab in zip(values, labels):
            res[(log2, v)] = run_once(log2, lab, **{field: v})
    for v, lab in zip(values, labels):
        gap = res[(18, v)] - res[(17, v)]
        print(f"capacity gap @ {lab}: {gap:+.2f} ms", flush=True)
    a, b = values[0], values[-1]
    print(f"effect of {field} {a}->{b} at 2^18: "
          f"{res[(18, b)] - res[(18, a)]:+.2f} ms", flush=True)
    return res
