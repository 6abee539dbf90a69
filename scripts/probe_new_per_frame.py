#!/usr/bin/env python
"""Per-frame acquired-block counts over the bench orbit (sizes the
max_new_per_round payload-reset buffer: every row costs reset traffic
whether used or not)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    sampler_splits=2, alloc_stride=2,
)
MAX_DEPTH = 4.0


def main():
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    frames = make_orbit_frames(60, W, H, K)

    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(CFG)
    prev_free = int(vol.num_free)
    mx = 0
    for i, f in enumerate(frames):
        pose_np, rgb, depth, ht, lt = f
        fri = I.FrameInput(rgb=jnp.asarray(rgb), depth=jnp.asarray(depth),
                           ht=jnp.asarray(ht), lt=jnp.asarray(lt))
        vol = step(vol, fri, jnp.asarray(pose_np))
        free = int(vol.num_free)
        acquired = prev_free - free  # net of carve releases, but carve
        # releases happen after acquire in the same step; report both
        print(f"frame {i:02d}: net acquired {acquired:5d}  free {free}",
              flush=True)
        mx = max(mx, acquired)
        prev_free = free
    print(f"max net acquired/frame: {mx}", flush=True)


if __name__ == "__main__":
    main()
