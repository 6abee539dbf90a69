#!/usr/bin/env python
"""Round-3 single-chip fusion A/B: count early-exit, sampler splits,
allocation stride.

Times the full jitted integrate step at bench scale (640x480, 4 mm,
steady-state volume) under config variants and reports per-variant
ms/frame plus tsdf L1 divergence vs the exact baseline.
"""
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
    num_buckets_log2=19, num_blocks_log2=17,
    max_candidates=32768, max_visible=32768,
    max_new_per_round=8192, max_probe=16,
)
MAX_DEPTH = 4.0

VARIANTS = {
    "v0 exact (count-exit on)": {},
    "v1 splits=2": {"sampler_splits": 2},
    "v2 stride=2": {"alloc_stride": 2},
    "v3 splits=2+stride=2": {"sampler_splits": 2, "alloc_stride": 2},
}


def run_variant(cfg, frames, label, ref_state=None):
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(cfg)
    staged = []
    for f in frames:
        pose_np, rgb, depth, ht, lt = f
        staged.append((
            I.FrameInput(rgb=jax.device_put(jnp.asarray(rgb)),
                         depth=jax.device_put(jnp.asarray(depth)),
                         ht=jax.device_put(jnp.asarray(ht)),
                         lt=jax.device_put(jnp.asarray(lt))),
            jax.device_put(jnp.asarray(pose_np)),
        ))
    t0 = time.perf_counter()
    vol = step(vol, *staged[0])
    jax.block_until_ready(vol.tsdf)
    print(f"  [{label}] first step (compile+run): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for fr, pose in staged[1:]:
        vol = step(vol, fr, pose)
    jax.block_until_ready(vol.tsdf)
    dt = time.perf_counter() - t0
    ms = dt / (len(staged) - 1) * 1e3
    n_active = int(vol.num_active_blocks)
    line = f"{label}: {ms:.2f} ms/frame ({1e3 / ms:.2f} FPS) active={n_active}"
    state = (np.asarray(vol.tsdf), np.asarray(vol.weight), n_active)
    if ref_state is not None:
        # tsdf arrays are pool-indexed; pool assignment order can differ
        # across variants, so compare aggregate statistics
        l1_self = np.abs(state[0]).sum()
        l1_ref = np.abs(ref_state[0]).sum()
        wsum, wref = state[1].sum(), ref_state[1].sum()
        line += (f"  |tsdf|sum rel-dev {abs(l1_self - l1_ref) / l1_ref:.2e}"
                 f"  wsum rel-dev {abs(wsum - wref) / wref:.2e}"
                 f"  dactive {n_active - ref_state[2]}")
    print(line, flush=True)
    return state


def main():
    frames = make_orbit_frames(60, W, H, K)
    ref_state = None
    for label, over in VARIANTS.items():
        cfg = dataclasses.replace(BASE, **over)
        state = run_variant(cfg, frames, label, ref_state)
        if ref_state is None:
            ref_state = state
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
