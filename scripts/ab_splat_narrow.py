#!/usr/bin/env python
"""Splat renderer A/B: default (32,16) vs narrow (16,16) patches, tb
sweep, z-pass stage split, and the reference-view resolutions (VERDICT
r4 #2: interactive render <= 33 ms; the narrow mode landed in r4 with
bit-equality tests but was never measured on hardware).

The per-block column loop (cw iterations of a [ch, 512] masked min) is
the dominant kernel cost; (16,16) halves it and still covers the bench
workload's max 12x12 px footprint (+2x2 splat) = 14x14 <= cw-2.

Run on an idle host (PROGRESS.md contention rule).
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

from bench import load_replay_frames, make_orbit_frames  # noqa: E402
from disinfect_slam_tpu.config import TSDFConfig  # noqa: E402
from disinfect_slam_tpu.core.geometry import (  # noqa: E402
    SE3, CameraIntrinsics, CameraParams,
)
from disinfect_slam_tpu.core.state import TSDFVolume  # noqa: E402
from disinfect_slam_tpu.ops import integrate as I  # noqa: E402
from disinfect_slam_tpu.ops.pallas.splat_kernel import (  # noqa: E402
    splat_depth_pallas, splat_render_pallas,
)

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)
MAX_DEPTH = 4.0
CFG = TSDFConfig(
    voxel_size=0.004, truncation=0.024,
    num_buckets_log2=19, num_blocks_log2=18,
    max_candidates=32768, max_visible=32768, max_new_per_round=8192,
    max_probe=16, sampler_splits=2, alloc_stride=4, alloc_every=3,
)


def timed(label, fn, pose_list, n=10):
    out = fn(pose_list[0])
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(pose_list[i % len(pose_list)])
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms, out


def main():
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    frames = load_replay_frames(30, W, H) or make_orbit_frames(30, W, H, K)
    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(CFG)
    print("populating volume (30 frames)...", flush=True)
    for f in frames:
        fr = I.FrameInput(rgb=jnp.asarray(f[1]), depth=jnp.asarray(f[2]),
                          ht=jnp.asarray(f[3]), lt=jnp.asarray(f[4]))
        vol = step(vol, fr, jnp.asarray(f[0]))
    jax.block_until_ready(vol.tsdf)
    print(f"active blocks: {int(vol.num_active_blocks)}", flush=True)
    poses = [jnp.asarray(f[0]) for f in frames[:10]]

    def render(cw, ch, tb, camera=cam):
        # vol as ARGUMENT: closing over it embeds the 1.5 GB payload
        # arrays as constants and the remote compiler rejects the
        # serialized program (HTTP 413)
        f = jax.jit(lambda v, m: splat_render_pallas(
            v, camera, SE3.from_matrix(m), MAX_DEPTH, tb=tb, cw=cw, ch=ch))
        return lambda m: f(vol, m)

    def zpass(cw, ch, tb):
        f = jax.jit(lambda v, m: splat_depth_pallas(
            v, cam, SE3.from_matrix(m), MAX_DEPTH, tb=tb, cw=cw, ch=ch))
        return lambda m: f(vol, m)

    _, out_def = timed("full render  (32,16) tb=8 ", render(32, 16, 8), poses)
    _, out_nar = timed("full render  (16,16) tb=8 ", render(16, 16, 8), poses)
    same = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(out_def),
                        jax.tree_util.tree_leaves(out_nar))
    )
    print(f"narrow == default (bit-equal on hardware): {same}", flush=True)
    timed("full render  (16,16) tb=16", render(16, 16, 16), poses)
    timed("full render  (16,16) tb=32", render(16, 16, 32), poses)
    timed("z pass only  (32,16) tb=8 ", zpass(32, 16, 8), poses)
    timed("z pass only  (16,16) tb=8 ", zpass(16, 16, 8), poses)

    # the reference's own interactive view is 640x360
    # (modules/renderer_module.cc:104-109)
    cam360 = CameraParams.create(
        CameraIntrinsics.create(K[0], K[1], K[2], 179.7), 360, W)
    timed("full render 640x360 (16,16) tb=8", render(16, 16, 8, cam360), poses)
    # half-res fallback (upscale on display)
    cam_half = CameraParams.create(
        CameraIntrinsics.create(K[0] / 2, K[1] / 2, K[2] / 2, K[3] / 2),
        H // 2, W // 2)
    timed("full render 320x240 (16,16) tb=8", render(16, 16, 8, cam_half),
          poses)
    timed("full render 320x240 ( 8, 8) tb=8", render(8, 8, 8, cam_half),
          poses)


if __name__ == "__main__":
    main()
