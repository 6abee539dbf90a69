#!/usr/bin/env python
"""Renderer A/B on TPU at bench scale: splat_xla / splat_pallas with and
without the surface-band block prefilter, plus raycast, at 640x480."""
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
from disinfect_slam_tpu.ops.render_fast import splat_render  # noqa: E402
from disinfect_slam_tpu.ops.pallas.splat_kernel import splat_render_pallas  # noqa: E402
from disinfect_slam_tpu.ops.raycast import raycast  # noqa: E402

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

    pose = jnp.asarray(frames[0][0])

    # how many visible blocks actually carry surface-band voxels?
    @jax.jit
    def count_surf(v):
        vis = I.gather_visible(v, cam, SE3.from_matrix(pose))
        pool = jnp.clip(vis.pool_idx, 0, CFG.num_blocks - 1)
        minabs = jnp.min(jnp.abs(v.tsdf[pool]), axis=-1)
        band_tsdf = 1.25 * CFG.voxel_size / CFG.truncation
        return jnp.sum((vis.mask & (minabs < band_tsdf)).astype(jnp.int32)), vis.count

    ns, nv = count_surf(vol)
    print(f"surface blocks: {int(ns)} of {int(nv)} visible", flush=True)

    variants = {
        "splat_xla_nofilter": jax.jit(lambda v, m: splat_render(
            v, cam, SE3.from_matrix(m), MAX_DEPTH, surf_cap=None)),
        "splat_xla_surfcap": jax.jit(lambda v, m: splat_render(
            v, cam, SE3.from_matrix(m), MAX_DEPTH)),
        "splat_pallas_nofilter": jax.jit(lambda v, m: splat_render_pallas(
            v, cam, SE3.from_matrix(m), MAX_DEPTH, surf_cap=0) if False else
            splat_render_pallas(v, cam, SE3.from_matrix(m), MAX_DEPTH,
                                surf_cap=CFG.max_visible)),
        "splat_pallas_surfcap": jax.jit(lambda v, m: splat_render_pallas(
            v, cam, SE3.from_matrix(m), MAX_DEPTH)),
    }
    results = {}
    for name, fn in variants.items():
        try:
            r = fn(vol, pose)
            jax.block_until_ready(r.rgba)
            t0 = time.perf_counter()
            for _ in range(5):
                r = fn(vol, pose)
                jax.block_until_ready(r.rgba)
            ms = (time.perf_counter() - t0) / 5 * 1e3
            results[name] = r
            print(f"{name}: {ms:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}", flush=True)

    # cross-check filtered vs unfiltered output
    for a, b in (("splat_xla_nofilter", "splat_xla_surfcap"),
                 ("splat_xla_surfcap", "splat_pallas_surfcap")):
        if a in results and b in results:
            same = bool(jnp.all(results[a].rgba == results[b].rgba))
            print(f"{a} == {b}: {same}", flush=True)

    rc = jax.jit(lambda v, m: raycast(v, cam, SE3.from_matrix(m), MAX_DEPTH))
    r = rc(vol, pose)
    jax.block_until_ready(r.rgba)
    t0 = time.perf_counter()
    for _ in range(3):
        r = rc(vol, pose)
        jax.block_until_ready(r.rgba)
    print(f"raycast: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
