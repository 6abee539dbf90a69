#!/usr/bin/env python
"""Online-step stage decomposition (VERDICT r3 #1: online >= 60 FPS).

Times, with chained anti-DCE loops at the bench config:
  1. the full FusedOnlineStep (H2D + seg + fuse, one dispatch)
  2. seg forward alone (device-resident input)
  3. integrate alone (device-resident frame)
  4. H2D alone (sensor-format u8/u16 uploads)
  5. optionally (--trace DIR) a profiler trace of the online loop for
     scripts/trace_summary.py attribution.

Run on an idle host (no concurrent TPU job, no CPU load) or the numbers
are 15-30% inflated (PROGRESS.md contention rule).
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
from disinfect_slam_tpu.ops.integrate import FrameInput, integrate  # noqa: E402

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)
MAX_DEPTH = 4.0
N = 30


def bench_cfg():
    return TSDFConfig(
        voxel_size=0.004, truncation=0.024,
        num_buckets_log2=19, num_blocks_log2=18,
        max_candidates=32768, max_visible=32768, max_new_per_round=8192,
        max_probe=16, sampler_splits=2, alloc_stride=4, alloc_every=3,
        scatter_window_log2=-1,
    )


def main():
    seg_arch = os.environ.get("DSTPU_SEG_ARCH", "unet")
    cfg = bench_cfg()
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

    model = create_model(arch=seg_arch)
    params = load_default_params(arch=seg_arch)

    # ---- 1. full online step -------------------------------------------
    online = FusedOnlineStep(
        cfg, K, H, W, MAX_DEPTH, seg_model=model, seg_params=params,
        depth_factor=5000.0,
    )
    warm = max(cfg.alloc_every, 1)
    for f in host_frames[:warm]:
        online.step(*f)
    online.block_until_ready()
    t0 = time.perf_counter()
    for f in host_frames[warm:]:
        online.step(*f)
    online.block_until_ready()
    full_ms = (time.perf_counter() - t0) / (len(host_frames) - warm) * 1e3
    print(f"online full: {full_ms:.2f} ms/frame ({1e3 / full_ms:.1f} FPS)",
          flush=True)

    # ---- 2. seg forward alone (chained, device-resident) ---------------
    from disinfect_slam_tpu.models.segmentation import INFER_H, INFER_W, resize_linear

    @jax.jit
    def seg_step(img):
        x = resize_linear(img.astype(jnp.float32), INFER_H, INFER_W) / 255.0
        logits = model.apply(params, x[None])[0]
        probs = jax.nn.sigmoid(logits)
        probs = resize_linear(probs, H, W)
        return img + (jnp.sum(probs) * 0.0).astype(img.dtype), probs

    img = jax.device_put(host_frames[0][0])
    img, probs = seg_step(img)
    jax.block_until_ready(probs)
    t0 = time.perf_counter()
    for _ in range(20):
        img, probs = seg_step(img)
    jax.block_until_ready(probs)
    print(f"seg device: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms",
          flush=True)

    # ---- 3. integrate alone (device-resident) --------------------------
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
    integ_ms = (time.perf_counter() - t0) / len(staged) * 1e3
    print(f"integrate device: {integ_ms:.2f} ms/frame", flush=True)

    # ---- 4. H2D alone --------------------------------------------------
    t0 = time.perf_counter()
    outs = []
    for rgb, depth, pose in host_frames:
        outs.append((jax.device_put(rgb), jax.device_put(depth),
                     jax.device_put(pose)))
    jax.block_until_ready(outs[-1])
    h2d_ms = (time.perf_counter() - t0) / len(host_frames) * 1e3
    print(f"h2d (u8 rgb + u16 depth + pose): {h2d_ms:.2f} ms/frame",
          flush=True)

    trace_dir = None
    for i, a in enumerate(sys.argv):
        if a == "--trace" and i + 1 < len(sys.argv):
            trace_dir = sys.argv[i + 1]
    if trace_dir:
        online2 = FusedOnlineStep(
            cfg, K, H, W, MAX_DEPTH, seg_model=model, seg_params=params,
            depth_factor=5000.0,
        )
        for f in host_frames[:warm]:
            online2.step(*f)
        online2.block_until_ready()
        jax.profiler.start_trace(trace_dir)
        for f in host_frames[warm:warm + 10]:
            online2.step(*f)
        online2.block_until_ready()
        jax.profiler.stop_trace()
        print(f"trace -> {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
