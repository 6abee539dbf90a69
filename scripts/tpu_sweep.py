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


def _error_summary(e: Exception) -> str:
    """Surface the root-cause line: the axon remote compiler hides OOM /
    Mosaic failures behind 'HTTP 500: tpu_compile_helper exit 1' and a
    wall of log noise."""
    msg = str(e)
    keys = ("Ran out of memory", "Mosaic failed", "unsupported", "RESOURCE")
    lines = [ln.strip() for ln in msg.splitlines() if any(k in ln for k in keys)]
    head = repr(e)[:200]
    return (lines[0][:300] + " | " + head) if lines else repr(e)[:500]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--quick", action="store_true", help="fewer variants")
    ap.add_argument("--small", action="store_true",
                    help="tiny workload (CPU harness smoke test)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from disinfect_slam_tpu.utils.cache import enable as _cache

    _cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import make_orbit_frames

    from disinfect_slam_tpu.config import TSDFConfig
    from disinfect_slam_tpu.core.geometry import SE3, CameraIntrinsics, CameraParams
    from disinfect_slam_tpu.core.state import TSDFVolume
    from disinfect_slam_tpu.ops.integrate import FrameInput, integrate

    if args.small:
        w, h = 160, 120
        K = (120.0, 120.0, 79.5, 59.5)
        base = dict(
            voxel_size=0.02, truncation=0.12,
            num_blocks_log2=13, max_candidates=8192, max_visible=4096,
            max_new_per_round=2048, grid_log2=7,
        )
    else:
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
        try:
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
            del vol, step
        except Exception as e:  # keep the sweep alive per variant
            results[name] = {"error": _error_summary(e)}
        print(f"[sweep] {name}: {results[name]}", flush=True)

    # render variants on the final fused volume (gather sampler: renderer
    # timing is independent of the fusion sampler, and this section must
    # survive a Pallas-sampler compile failure)
    cfg = TSDFConfig(**{**base, "sampler": "gather"})
    vol = TSDFVolume.create(cfg)
    step = jax.jit(
        lambda v, f, m: integrate(v, f, cam, SE3.from_matrix(m), 4.0),
        donate_argnums=0,
    )
    for fr, pose in staged:
        vol = step(vol, fr, pose)
    jax.block_until_ready(vol.tsdf)
    last_pose = staged[-1][1]

    from disinfect_slam_tpu.ops.pallas.splat_kernel import splat_render_pallas
    from disinfect_slam_tpu.ops.raycast import raycast as parity_raycast
    from disinfect_slam_tpu.ops.render_fast import splat_render

    def _pose(m):
        return SE3.from_matrix(m)

    render_variants = {
        "splat_xla": jax.jit(lambda v, m: splat_render(v, cam, _pose(m), 4.0)),
        "splat_pallas": jax.jit(
            lambda v, m: splat_render_pallas(
                v, cam, _pose(m), 4.0,
                interpret=jax.default_backend() != "tpu",
            )
        ),
        "raycast_skip": jax.jit(lambda v, m: parity_raycast(v, cam, _pose(m), 4.0)),
        "raycast_noskip": jax.jit(
            lambda v, m: parity_raycast(
                dataclasses.replace(
                    v, cfg=dataclasses.replace(cfg, raycast_skip=False)
                ),
                cam, _pose(m), 4.0,
            )
        ),
    }
    for name, fn in render_variants.items():
        try:
            res = fn(vol, last_pose)
            jax.block_until_ready(res.depth)
            t0 = time.perf_counter()
            for _ in range(3):
                res = fn(vol, last_pose)
                jax.block_until_ready(res.depth)
            ms = (time.perf_counter() - t0) / 3 * 1e3
            results[name] = {"ms": round(ms, 2)}
        except Exception as e:  # keep the sweep alive per variant
            results[name] = {"error": _error_summary(e)}
        print(f"[sweep] {name}: {results[name]}", flush=True)

    with open("/tmp/tpu_sweep.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
