#!/usr/bin/env python
"""Decompose the current fuse stage (~16.6 ms): projection, sampling,
row gathers, fusion math, scatters.  Uses the unfoldable anti-DCE chain
(scalar == INT32_MIN) so no stage dead-codes.
"""
import os
import sys
import time

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
from disinfect_slam_tpu.core import voxel as vx  # noqa: E402
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


def timeit(fn, arg, iters=20, label=""):
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
        fri = I.FrameInput(rgb=jnp.asarray(rgb), depth=jnp.asarray(depth),
                           ht=jnp.asarray(ht), lt=jnp.asarray(lt))
        vol = step(vol, fri, jnp.asarray(pose_np))
    jax.block_until_ready(vol.tsdf)
    print(f"active blocks: {int(vol.num_active_blocks)}", flush=True)

    pose_np, rgb, depth, ht, lt = frames[0]
    fr = I.FrameInput(rgb=jax.device_put(jnp.asarray(rgb)),
                      depth=jax.device_put(jnp.asarray(depth)),
                      ht=jax.device_put(jnp.asarray(ht)),
                      lt=jax.device_put(jnp.asarray(lt)))
    pose = SE3.from_matrix(jnp.asarray(pose_np))
    cfg = vol.cfg

    INT_MIN = jnp.iinfo(jnp.int32).min

    def chain(v, scalar):
        probe = (scalar.astype(jnp.int32) == INT_MIN).astype(jnp.int32)
        return v.replace(oob_count=v.oob_count + probe)

    def proj(v, vis):
        offs = vx.index_to_offset(jnp.arange(cfg.block_volume, dtype=jnp.int32), cfg)
        pos_grid = vx.block_to_point(vis.block_pos, cfg)[:, None, :] + offs[None, :, :]
        pos_world = pos_grid.astype(jnp.float32) * cfg.voxel_size
        pos_cam = pose.apply(pos_world)
        pih = cam.intrinsics.project(pos_cam)
        z = pih[..., 2]
        u = vx.round_half_away(pih[..., 0] / z).astype(jnp.int32)
        vv = vx.round_half_away(pih[..., 1] / z).astype(jnp.int32)
        in_img = (u >= 0) & (u < cam.img_w) & (vv >= 0) & (vv < cam.img_h)
        us = jnp.clip(u, 0, cam.img_w - 1)
        vs = jnp.clip(vv, 0, cam.img_h - 1)
        return us, vs, z, in_img

    def s_vis(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        return chain(v, vis.count)

    def s_proj(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        us, vs, z, in_img = proj(v, vis)
        return chain(v, jnp.sum(us) + jnp.sum(vs) + jnp.sum(in_img))

    def s_sample(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        us, vs, z, in_img = proj(v, vis)
        from disinfect_slam_tpu.ops.pallas.sample_kernel import sample_patches

        stacked = jnp.stack(
            [fr.depth, d2r, fr.rgb[..., 0], fr.rgb[..., 1], fr.rgb[..., 2],
             fr.ht, fr.lt, jnp.zeros_like(fr.depth)], axis=-1)
        u_for_min = jnp.where(in_img, us, cam.img_w - 1)
        v_for_min = jnp.where(in_img, vs, cam.img_h - 1)
        u0 = jnp.min(u_for_min, axis=1).astype(jnp.int32)
        v0 = jnp.min(v_for_min, axis=1).astype(jnp.int32)
        chans, patch_ok = sample_patches(
            stacked, u0, v0, us, vs, ph=cfg.patch_h, pw=cfg.patch_w,
            tb=cfg.sample_tile, interpret=False, as_channels=True,
            splits=cfg.sampler_splits, count=vis.count)
        acc = sum(jnp.sum(c) for c in chans)
        return chain(v, acc)

    def s_rows(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        us, vs, z, in_img = proj(v, vis)
        pool = jnp.clip(vis.pool_idx, 0, cfg.num_blocks - 1)
        tsdf_old = v.tsdf[pool]
        rgbw_old = v.rgbw[pool]
        prob_old = v.prob[pool]
        acc = jnp.sum(tsdf_old) + jnp.sum(rgbw_old).astype(jnp.float32) + jnp.sum(prob_old)
        return chain(v, acc + jnp.sum(us).astype(jnp.float32))

    def s_fuse_noscatter(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        v2, rowmin, skipped = I.fuse_visible(v, vis, fr, d2r, cam, pose, MAX_DEPTH)
        # depend only on rowmin (the carve input), not the scattered pool
        return chain(v, jnp.sum(rowmin))

    def s_full(v):
        return I.integrate(v, fr, cam, pose, MAX_DEPTH)

    def fresh(v):
        return jax.tree.map(lambda x: x.copy(), v)

    def s_noop(v):
        # calibrates fixed per-dispatch overhead through the relay
        return chain(v, v.num_free)

    timeit(jax.jit(s_noop, donate_argnums=0), fresh(vol), 20, "noop (dispatch overhead)")
    timeit(jax.jit(s_vis, donate_argnums=0), fresh(vol), 20, "visible gather")
    timeit(jax.jit(s_proj, donate_argnums=0), fresh(vol), 20, "+ projection u/v/z")
    timeit(jax.jit(s_sample, donate_argnums=0), fresh(vol), 20, "+ sample kernel")
    timeit(jax.jit(s_rows, donate_argnums=0), fresh(vol), 20, "vis+proj+row gathers")
    timeit(jax.jit(s_fuse_noscatter, donate_argnums=0), fresh(vol), 20,
           "full fuse (scatter may DCE)")
    timeit(jax.jit(s_full, donate_argnums=0), fresh(vol), 20, "full integrate")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
