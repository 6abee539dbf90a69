#!/usr/bin/env python
"""A/B alloc_stride (allocation-pass pixel stride) at the shipped bench
config, with the same divergence accounting as the alloc_every sweep.

stride=2 is lossless at the bench geometry (min block footprint 4.2 px);
stride=3 exceeds no bound proof — grazed blocks whose footprint falls
under 3 px can be missed for a frame.  This measures what that costs in
content (active blocks, |tsdf| mass, weight mass) and what it buys in
ms/frame, so the ship decision has numbers like every=3 did.

    python scripts/ab_alloc_stride.py 2 3        # strides to compare
    DSTPU_AB_EVERY=3 DSTPU_AB_BLOCKS=18 ...      # match the bench

Run on an idle host (no concurrent TPU or CPU load).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

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
    num_buckets_log2=19,
    num_blocks_log2=int(os.environ.get("DSTPU_AB_BLOCKS", "18")),
    max_candidates=32768, max_visible=32768,
    max_new_per_round=8192, max_probe=16,
    sampler_splits=2,
)
MAX_DEPTH = 4.0
N = 60
ALLOC_EVERY = int(os.environ.get("DSTPU_AB_EVERY", "3"))


def run(stride: int):
    cfg = dataclasses.replace(BASE, alloc_stride=stride)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    frames = make_orbit_frames(N, W, H, K)
    step_a = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    step_n = jax.jit(
        lambda v, f, m: I.integrate(
            v, f, cam, SE3.from_matrix(m), MAX_DEPTH, allocate=False
        ),
        donate_argnums=0,
    )
    staged = [
        (
            jax.device_put(I.FrameInput(rgb=rgb, depth=depth, ht=ht, lt=lt)),
            jax.device_put(np.asarray(pose, np.float32)),
        )
        for pose, rgb, depth, ht, lt in frames
    ]
    vol = TSDFVolume.create(cfg)
    vol = step_a(vol, *staged[0])
    vol = step_n(vol, *staged[1])
    jax.block_until_ready(vol.tsdf)
    vol = TSDFVolume.create(cfg)
    t0 = time.perf_counter()
    for i, (f, m) in enumerate(staged):
        vol = (step_a if i % ALLOC_EVERY == 0 else step_n)(vol, f, m)
    jax.block_until_ready(vol.tsdf)
    dt = (time.perf_counter() - t0) / N * 1e3
    act = int(vol.num_active_blocks)
    tsum = float(jnp.sum(jnp.abs(vol.tsdf)))
    wsum = float(jnp.sum(vol.rgbw >> 24))
    print(f"[ab] stride={stride} every={ALLOC_EVERY}  {dt:7.2f} ms/frame "
          f"({1e3 / dt:.2f} FPS)  active={act} |tsdf|sum={tsum:.6g} "
          f"wsum={wsum:.6g}", flush=True)
    return dt, act, tsum, wsum


def main():
    print(f"[ab] backend={jax.default_backend()}", flush=True)
    strides = [int(v) for v in sys.argv[1:]] or [2, 3]
    d1, a1, t1, w1 = run(strides[0])
    for s in strides[1:]:
        d2, a2, t2, w2 = run(s)
        print(f"[ab] vs stride={strides[0]}: speedup {d1 - d2:+.2f} ms/frame; "
              f"active {a2 - a1:+d} "
              f"({100 * (a2 - a1) / a1:+.2f}%), |tsdf|sum rel dev "
              f"{abs(t2 - t1) / t1:.2e}, wsum rel dev {abs(w2 - w1) / w1:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
