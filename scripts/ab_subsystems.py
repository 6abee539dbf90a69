#!/usr/bin/env python
"""TPU timing for the remaining subsystems: mesh extraction, DenseSLAM
frame-to-model tracking step, stereo block-matching depth."""
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
CFG = TSDFConfig(
    voxel_size=0.004, truncation=0.024,
    num_buckets_log2=19, num_blocks_log2=17,
    max_candidates=32768, max_visible=32768,
    max_new_per_round=8192, max_probe=16,
)
MAX_DEPTH = 4.0


def main():
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    frames = make_orbit_frames(30, W, H, K)
    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(CFG)
    print("populating volume (30 frames)...", flush=True)
    for f in frames:
        pose_np, rgb, depth, ht, lt = f
        fr = I.FrameInput(rgb=jnp.asarray(rgb), depth=jnp.asarray(depth),
                          ht=jnp.asarray(ht), lt=jnp.asarray(lt))
        vol = step(vol, fr, jnp.asarray(pose_np))
    jax.block_until_ready(vol.tsdf)
    print(f"active blocks: {int(vol.num_active_blocks)}", flush=True)

    # --- mesh extraction (marching tetrahedra, chunked) ---
    try:
        from disinfect_slam_tpu.ops.mesh import extract_mesh_chunked

        t0 = time.perf_counter()
        tris = extract_mesh_chunked(vol)
        n = np.asarray(tris).shape
        ms = (time.perf_counter() - t0) * 1e3
        print(f"mesh extraction: {ms:.0f} ms, tris shape {n}", flush=True)
    except Exception as e:
        print(f"mesh: FAIL {str(e)[:200]}", flush=True)

    # --- stereo block matching at VGA ---
    try:
        from disinfect_slam_tpu.ops.stereo import stereo_depth

        rng = np.random.default_rng(0)
        left = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
        right = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
        sfn = jax.jit(lambda l, r: stereo_depth(l, r, fx=K[0], baseline_m=0.12))
        res = sfn(left, right)
        jax.block_until_ready(res.depth)
        t0 = time.perf_counter()
        for _ in range(5):
            res = sfn(left, right + res.depth[0, 0] * 0)  # chained
            jax.block_until_ready(res.depth)
        print(f"stereo depth 640x480: {(time.perf_counter()-t0)/5*1e3:.1f} ms",
              flush=True)
    except Exception as e:
        print(f"stereo: FAIL {str(e)[:300]}", flush=True)

    # --- DenseSLAM model-depth + ICP step ---
    try:
        from disinfect_slam_tpu.ops.pallas.splat_kernel import splat_depth_pallas

        pose = jnp.asarray(frames[0][0])
        mfn = jax.jit(lambda v, m: splat_depth_pallas(
            v, cam, SE3.from_matrix(m), MAX_DEPTH))
        d, hit = mfn(vol, pose)
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        for _ in range(5):
            d, hit = mfn(vol, pose)
            jax.block_until_ready(d)
        print(f"model depth (pallas z-pass only): "
              f"{(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
    except Exception as e:
        print(f"dense_slam: FAIL {str(e)[:200]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
