#!/usr/bin/env python
"""TPU performance sweep over engine configurations.

Measures end-to-end integrate FPS (and render latencies) for sampler /
dedup / culling variants on the bench workload.  Run on hardware:

  python scripts/tpu_sweep.py [--frames 30] [--quick]

Writes /tmp/tpu_sweep.json with all results.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--quick", action="store_true", help="fewer variants")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from disinfect_slam_tpu.utils.cache import enable as _cache

    _cache()

    from bench import make_orbit_frames

    from disinfect_slam_tpu.config import TSDFConfig
    from disinfect_slam_tpu.core.geometry import SE3, CameraIntrinsics, CameraParams
    from disinfect_slam_tpu.core.state import TSDFVolume
    from disinfect_slam_tpu.ops.integrate import FrameInput, integrate

    w, h = 640, 480
    K = (525.1, 525.3, 319.6, 239.7)
    base = dict(
        voxel_size=0.004, truncation=0.024,
        num_blocks_log2=17, max_candidates=32768, max_visible=32768,
        max_new_per_round=8192, grid_log2=8,
    )
    variants = {
        "gather": dict(sampler="gather"),
        "pallas": dict(sampler="pallas"),
        "pallas_fused": dict(sampler="pallas_fused"),
        "pallas_tb16": dict(sampler="pallas", sample_tile=16),
        "fused_tb16": dict(sampler="pallas_fused", sample_tile=16),
        "fused_filter": dict(sampler="pallas_fused", alloc_dedup="filter"),
        "fused_filter_cull": dict(
            sampler="pallas_fused", alloc_dedup="filter", cull_occluded=True
        ),
    }
    if args.quick:
        variants = {k: variants[k] for k in ("pallas", "pallas_fused", "fused_filter")}

    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, h, w)
    frames = make_orbit_frames(args.frames, w, h, K)

    def stage(f):
        pose, rgb, depth, ht, lt = f
        return (
            FrameInput(
                rgb=jax.device_put(rgb), depth=jax.device_put(depth),
                ht=jax.device_put(ht), lt=jax.device_put(lt),
            ),
            jax.device_put(pose),
        )

    staged = [stage(f) for f in frames]
    results = {}
    for name, over in variants.items():
        cfg = TSDFConfig(**{**base, **over})
        step = jax.jit(
            lambda v, f, m: integrate(v, f, cam, SE3.from_matrix(m), 4.0),
            donate_argnums=0,
        )
        vol = TSDFVolume.create(cfg)
        t0 = time.perf_counter()
        vol = step(vol, *staged[0])
        jax.block_until_ready(vol.tsdf)
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for fr, pose in staged[1:]:
            vol = step(vol, fr, pose)
        jax.block_until_ready(vol.tsdf)
        dt = time.perf_counter() - t0
        fps = (len(staged) - 1) / dt
        results[name] = {
            "fps": round(fps, 2),
            "ms_per_frame": round(dt / (len(staged) - 1) * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "blocks": int(vol.num_active_blocks),
        }
        print(f"[sweep] {name}: {results[name]}", flush=True)
        del vol, step

    with open("/tmp/tpu_sweep.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
