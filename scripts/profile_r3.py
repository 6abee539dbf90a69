#!/usr/bin/env python
"""Stage budget under the round-3 config (count-exit + splits=2 +
stride=2 + u8 payloads): alloc / visibility / fuse / carve composition
timings plus visibility sub-pieces.
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
BLOCKS_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
CFG = TSDFConfig(
    voxel_size=0.004, truncation=0.024,
    num_buckets_log2=19, num_blocks_log2=BLOCKS_LOG2,
    max_candidates=32768, max_visible=32768,
    max_new_per_round=8192, max_probe=16,
    sampler_splits=2, alloc_stride=2,
    scatter_window_log2=int(os.environ.get("DSTPU_SCATTER_WINDOW", "0")),
)
MAX_DEPTH = 4.0


def timeit(fn, arg, iters=10, label=""):
    x = fn(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    frames = make_orbit_frames(30, W, H, K)
    d2r = jax.jit(lambda: I.depth_to_range(cam))()

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

    pose_np, rgb, depth, ht, lt = frames[0]
    fr = I.FrameInput(rgb=jax.device_put(jnp.asarray(rgb)),
                      depth=jax.device_put(jnp.asarray(depth)),
                      ht=jax.device_put(jnp.asarray(ht)),
                      lt=jax.device_put(jnp.asarray(lt)))
    pose = SE3.from_matrix(jnp.asarray(pose_np))

    def stage_a(v):
        return I.allocate_blocks(v, fr.depth, d2r, cam, pose, MAX_DEPTH)

    def stage_av(v):
        v = I.allocate_blocks(v, fr.depth, d2r, cam, pose, MAX_DEPTH)
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        return v.replace(num_free=v.num_free + 0 * vis.count)

    def stage_avf(v):
        v = I.allocate_blocks(v, fr.depth, d2r, cam, pose, MAX_DEPTH)
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        v, _, _ = I.fuse_visible(v, vis, fr, d2r, cam, pose, MAX_DEPTH)
        return v

    def full(v):
        return I.integrate(v, fr, cam, pose, MAX_DEPTH)

    def fresh(v):
        return jax.tree.map(lambda x: x.copy(), v)

    va = timeit(jax.jit(stage_a, donate_argnums=0), fresh(vol), 10, "allocate")
    vav = timeit(jax.jit(stage_av, donate_argnums=0), fresh(vol), 10, "alloc+visible")
    vavf = timeit(jax.jit(stage_avf, donate_argnums=0), fresh(vol), 10, "alloc+vis+fuse")
    vfull = timeit(jax.jit(full, donate_argnums=0), fresh(vol), 10, "full integrate")
    print(f"  -> visibility {vav - va:.1f} fuse {vavf - vav:.1f} "
          f"carve {vfull - vavf:.1f}", flush=True)

    # visibility sub-pieces (chained via a harmless state touch)
    def chainer(scalar_fn):
        def fn(v):
            return v.replace(num_free=v.num_free + 0 * scalar_fn(v))
        return fn

    def vis_mask_only(v):
        live = v.entry_block >= 0
        visb = I.block_visibility(v.entry_pos, pose, cam, CFG, full=False)
        return jnp.sum((live & visb).astype(jnp.int32))

    def vis_full(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        return vis.count + jnp.sum(vis.pool_idx)

    timeit(jax.jit(chainer(vis_mask_only)), vol, 10, "  vis: mask only")
    timeit(jax.jit(chainer(vis_full)), vol, 10, "  vis: mask+compact")

    # fuse sub-pieces: projection math only
    from disinfect_slam_tpu.core import voxel as vx

    def proj_only(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        offs = vx.index_to_offset(jnp.arange(CFG.block_volume, dtype=jnp.int32), CFG)
        pos_grid = vx.block_to_point(vis.block_pos, CFG)[:, None, :] + offs[None, :, :]
        pos_world = pos_grid.astype(jnp.float32) * CFG.voxel_size
        pos_cam = pose.apply(pos_world)
        pih = cam.intrinsics.project(pos_cam)
        z = pih[..., 2]
        u = vx.round_half_away(pih[..., 0] / z).astype(jnp.int32)
        v_ = vx.round_half_away(pih[..., 1] / z).astype(jnp.int32)
        return (jnp.sum(u) + jnp.sum(v_) + jnp.sum(z).astype(jnp.int32)).astype(jnp.int32)

    timeit(jax.jit(chainer(proj_only)), vol, 10, "  fuse: vis+projection only")

    # variant integrates: fused sampler kernel; stride 3
    for label, over in (
        ("full integrate [pallas_fused]", {"sampler": "pallas_fused"}),
        ("full integrate [stride=3]", {"alloc_stride": 3}),
    ):
        c2 = dataclasses.replace(CFG, **over)

        def full2(v, c2=c2):
            v = dataclasses.replace(v, cfg=c2)
            v = I.integrate(v, fr, cam, pose, MAX_DEPTH)
            return dataclasses.replace(v, cfg=CFG)

        timeit(jax.jit(full2, donate_argnums=0), fresh(vol), 10, label)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
