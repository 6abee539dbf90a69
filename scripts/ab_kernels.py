#!/usr/bin/env python
"""A/B the redesigned Pallas samplers vs the XLA gather on TPU at bench
scale: small-scale exactness first, then full-scale ms/frame."""
import dataclasses
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
BASE = TSDFConfig(
    voxel_size=0.004, truncation=0.024,
    num_buckets_log2=19, num_blocks_log2=17,
    max_candidates=32768, max_visible=32768,
    max_new_per_round=8192, max_probe=16,
)
MAX_DEPTH = 4.0


def run_frames(cfg, frames, cam, n_time=10):
    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(cfg)
    staged = []
    for f in frames:
        pose_np, rgb, depth, ht, lt = f
        staged.append((I.FrameInput(
            rgb=jax.device_put(jnp.asarray(rgb)),
            depth=jax.device_put(jnp.asarray(depth)),
            ht=jax.device_put(jnp.asarray(ht)),
            lt=jax.device_put(jnp.asarray(lt))), jnp.asarray(pose_np)))
    t0 = time.perf_counter()
    vol = step(vol, *staged[0])
    jax.block_until_ready(vol.tsdf)
    compile_s = time.perf_counter() - t0
    for fr, m in staged[1:-n_time]:
        vol = step(vol, fr, m)
    jax.block_until_ready(vol.tsdf)
    t0 = time.perf_counter()
    for fr, m in staged[-n_time:]:
        vol = step(vol, fr, m)
    jax.block_until_ready(vol.tsdf)
    ms = (time.perf_counter() - t0) / n_time * 1e3
    return vol, ms, compile_s


def main():
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)

    # --- small-scale exactness (fast compile) ---
    small = dataclasses.replace(
        BASE, max_candidates=8192, max_visible=4096, max_new_per_round=2048)
    sframes = make_orbit_frames(6, W, H, K)
    vol_g, _, _ = run_frames(dataclasses.replace(small, sampler="gather"),
                             sframes, cam, n_time=1)
    for s in ("pallas", "pallas_fused"):
        vol_p, _, _ = run_frames(dataclasses.replace(small, sampler=s),
                                 sframes, cam, n_time=1)
        d = float(jnp.max(jnp.abs(vol_p.tsdf - vol_g.tsdf)))
        nb_g = int(vol_g.num_active_blocks); nb_p = int(vol_p.num_active_blocks)
        print(f"{s}: small-scale max|dtsdf|={d:.3e} blocks {nb_p} vs {nb_g}",
              flush=True)

    # --- full-scale timing ---
    frames = make_orbit_frames(40, W, H, K)
    for s in ("gather", "pallas", "pallas_fused"):
        cfg = dataclasses.replace(BASE, sampler=s)
        vol, ms, comp = run_frames(cfg, frames, cam)
        print(f"{s}: {ms:.1f} ms/frame ({1000/ms:.2f} FPS) "
              f"blocks={int(vol.num_active_blocks)} compile={comp:.0f}s",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
