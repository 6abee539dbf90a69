#!/usr/bin/env python
"""Decompose DenseSLAM frame time by stage at a given track_res_scale
(one scale per process — axon client two-executable instability).

Usage: probe_dense_scale.py [scale]
Times, each as a chained loop on device:
  model   — splat model depth render at track res
  track   — full _track_frame (render + pyramids + ICP)
  fuse    — the track_fuse steady-state step
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
from disinfect_slam_tpu.systems.dense_slam import DenseSLAM  # noqa: E402

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)


def main():
    ts = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = TSDFConfig(
        voxel_size=0.01, truncation=0.06,
        num_blocks_log2=16, max_candidates=32768, max_visible=16384,
        max_new_per_round=8192, backend="dense", grid_log2=8,
        sampler_splits=2, alloc_stride=2,
    )
    slam = DenseSLAM(K, H, W, voxel_size=0.01, truncation=0.06,
                     max_depth=4.0, cfg=cfg, track_res_scale=ts)
    frames = make_orbit_frames(12, W, H, K)
    for f in frames[:6]:
        slam.process_frame(f[1], f[2])
    jax.block_until_ready(slam.volume.tsdf)
    print(f"backend={jax.default_backend()} scale={ts}", flush=True)

    vol = slam.volume
    pose = jnp.asarray(np.linalg.inv(slam.world_T_cam), jnp.float32)
    depth = jnp.asarray(frames[7][2], jnp.float32)

    # model depth render, chained through a scalar fold into the pose
    def time_model(n=20):
        p = pose
        d = slam._model_depth(vol, p)
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        for _ in range(n):
            d = slam._model_depth(vol, p)
            p = p + 0.0 * d[0, 0]
        jax.block_until_ready(d)
        return (time.perf_counter() - t0) / n * 1e3

    def time_track(n=20):
        p = pose
        seed = jnp.asarray(slam.world_T_cam, jnp.float32)
        T, rmse, inl = slam._track_frame(vol, p, depth, seed)
        jax.block_until_ready(T)
        t0 = time.perf_counter()
        for _ in range(n):
            T, rmse, inl = slam._track_frame(vol, p, depth, seed)
            p = p + 0.0 * rmse
        jax.block_until_ready(T)
        return (time.perf_counter() - t0) / n * 1e3

    def time_track_fuse(n=20):
        # the actual steady-state program (donates vol; keep a fresh
        # copy chain by reusing the returned vol)
        v = jax.tree.map(jnp.copy, vol)
        w = jnp.asarray(slam.world_T_cam, jnp.float32)
        from disinfect_slam_tpu.ops.integrate import FrameInput
        frame = FrameInput(
            rgb=jnp.asarray(frames[7][1], jnp.float32),
            depth=depth,
            ht=jnp.ones_like(depth), lt=jnp.ones_like(depth),
        )
        eye3 = jnp.eye(3, jnp.float32)
        z3 = jnp.zeros((3,), jnp.float32)
        v, w, c, ok = slam._track_fuse(v, w, frame, eye3, z3)
        jax.block_until_ready(v.tsdf)
        t0 = time.perf_counter()
        for _ in range(n):
            v, w, c, ok = slam._track_fuse(v, w, frame, eye3, z3)
        jax.block_until_ready(v.tsdf)
        return (time.perf_counter() - t0) / n * 1e3

    mode = os.environ.get("DSTPU_PROBE", "all")
    if mode in ("all", "tf"):
        tf = time_track_fuse()
        print(f"scale={ts}: track_fuse {tf:.1f} ms", flush=True)
    if mode in ("all", "parts"):
        m = time_model()
        t = time_track()
        print(f"scale={ts}: model_depth {m:.1f} ms | track_frame {t:.1f} ms "
              f"(icp+pyr = {t - m:.1f})", flush=True)


if __name__ == "__main__":
    main()
