#!/usr/bin/env python
"""Finer fuse decomposition: cut the integrate program at the gather
boundary to locate the real 144 ms hotspot (the standalone image gather
is only ~3.5 ms, so the descriptor-wall theory is dead)."""
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
from disinfect_slam_tpu.core import voxel as vx  # noqa: E402
from disinfect_slam_tpu.ops import integrate as I  # noqa: E402

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)
CFG = TSDFConfig(
    voxel_size=0.004, truncation=0.024,
    num_buckets_log2=19, num_blocks_log2=17,
    max_candidates=32768, max_visible=32768,
    max_new_per_round=8192, max_probe=16,
)
MAX_DEPTH = 4.0


def timeit(fn, args, iters=10, label="", chain=0):
    """chain: index of arg to replace with matching output leaf count."""
    x = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(*args)
        # force dependency: block each iteration (adds sync overhead but
        # the programs here are >>1 ms so it is negligible)
        jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return x


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

    # ---- A: visibility + projection up to gather indices ----
    @jax.jit
    def proj(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        offs = vx.index_to_offset(jnp.arange(CFG.block_volume, dtype=jnp.int32), CFG)
        pos_grid = vx.block_to_point(vis.block_pos, CFG)[:, None, :] + offs[None, :, :]
        pos_world = pos_grid.astype(jnp.float32) * CFG.voxel_size
        pos_cam = pose.apply(pos_world)
        pih = cam.intrinsics.project(pos_cam)
        z = pih[..., 2]
        u = vx.round_half_away(pih[..., 0] / z).astype(jnp.int32)
        v_ = vx.round_half_away(pih[..., 1] / z).astype(jnp.int32)
        in_img = (u >= 0) & (u < cam.img_w) & (v_ >= 0) & (v_ < cam.img_h)
        us = jnp.clip(u, 0, cam.img_w - 1)
        vs = jnp.clip(v_, 0, cam.img_h - 1)
        return us, vs, z, in_img, vis

    out = timeit(proj, (vol,), 10, "A: visible+projection")
    us, vs, z, in_img, vis = out

    stacked = jnp.stack(
        [fr.depth, d2r, fr.rgb[..., 0], fr.rgb[..., 1], fr.rgb[..., 2],
         fr.ht, fr.lt, jnp.zeros_like(fr.depth)], axis=-1)

    # ---- B: gather + fusion math + scatter, given precomputed indices ----
    def fuse_given_idx(v, us, vs, z, in_img, pool_idx, mask):
        samp = stacked[vs, us]
        depth_s = samp[..., 0]; d2r_s = samp[..., 1]
        rgb_new = samp[..., 2:5]; ht_s = samp[..., 5]; lt_s = samp[..., 6]
        depth_ok = (depth_s > 0) & (depth_s <= MAX_DEPTH)
        sdf = d2r_s * (depth_s - z)
        sdf_ok = sdf > -CFG.truncation
        update = mask[:, None] & in_img & depth_ok & sdf_ok
        tsdf_new = jnp.minimum(1.0, sdf / CFG.truncation)
        w_new = (1.0 - depth_s / MAX_DEPTH) * 4.0
        pool = jnp.clip(pool_idx, 0, CFG.num_blocks - 1)
        tsdf_old = v.tsdf[pool]; w_old = v.weight[pool]
        rgb_old = v.rgb[pool]; prob_old = v.prob[pool]
        w_comb = w_old + w_new
        w_safe = jnp.where(w_comb == 0, 1.0, w_comb)
        tsdf_upd = (tsdf_old * w_old + tsdf_new * w_new) / w_safe
        rgb_upd = vx.round_half_away(
            (rgb_old * w_old[..., None] + rgb_new * w_new[..., None]) / w_safe[..., None])
        w_upd = jnp.minimum(vx.round_half_away(w_comb), CFG.max_weight)
        positive = jnp.exp(I._pow_log(prob_old, w_old / w_safe) + I._pow_log(ht_s, w_new / w_safe))
        negative = jnp.exp(I._pow_log(1.0 - prob_old, w_old / w_safe) + I._pow_log(lt_s, w_new / w_safe))
        denom = positive + negative
        prob_upd = jnp.where(denom > 0, positive / jnp.where(denom > 0, denom, 1.0), prob_old)
        tsdf_w = jnp.where(update, tsdf_upd, tsdf_old)
        w_w = jnp.where(update, w_upd, w_old)
        rgb_w = jnp.where(update[..., None], rgb_upd, rgb_old)
        prob_w = jnp.where(update, prob_upd, prob_old)
        wpool = jnp.where(mask, pool_idx, CFG.num_blocks)
        return v.replace(
            tsdf=v.tsdf.at[wpool].set(tsdf_w, mode="drop"),
            weight=v.weight.at[wpool].set(w_w, mode="drop"),
            rgb=v.rgb.at[wpool].set(rgb_w, mode="drop"),
            prob=v.prob.at[wpool].set(prob_w, mode="drop"),
        )

    timeit(jax.jit(fuse_given_idx), (vol, us, vs, z, in_img, vis.pool_idx, vis.mask),
           10, "B: gather+fusemath+scatter (idx as inputs)")

    # ---- C: fusion math only (samples precomputed) ----
    samp0 = jax.jit(lambda: stacked[vs, us])()
    jax.block_until_ready(samp0)

    def fuse_given_samp(v, samp, z, in_img, pool_idx, mask):
        depth_s = samp[..., 0]; d2r_s = samp[..., 1]
        rgb_new = samp[..., 2:5]; ht_s = samp[..., 5]; lt_s = samp[..., 6]
        depth_ok = (depth_s > 0) & (depth_s <= MAX_DEPTH)
        sdf = d2r_s * (depth_s - z)
        sdf_ok = sdf > -CFG.truncation
        update = mask[:, None] & in_img & depth_ok & sdf_ok
        tsdf_new = jnp.minimum(1.0, sdf / CFG.truncation)
        w_new = (1.0 - depth_s / MAX_DEPTH) * 4.0
        pool = jnp.clip(pool_idx, 0, CFG.num_blocks - 1)
        tsdf_old = v.tsdf[pool]; w_old = v.weight[pool]
        rgb_old = v.rgb[pool]; prob_old = v.prob[pool]
        w_comb = w_old + w_new
        w_safe = jnp.where(w_comb == 0, 1.0, w_comb)
        tsdf_upd = (tsdf_old * w_old + tsdf_new * w_new) / w_safe
        rgb_upd = vx.round_half_away(
            (rgb_old * w_old[..., None] + rgb_new * w_new[..., None]) / w_safe[..., None])
        w_upd = jnp.minimum(vx.round_half_away(w_comb), CFG.max_weight)
        positive = jnp.exp(I._pow_log(prob_old, w_old / w_safe) + I._pow_log(ht_s, w_new / w_safe))
        negative = jnp.exp(I._pow_log(1.0 - prob_old, w_old / w_safe) + I._pow_log(lt_s, w_new / w_safe))
        denom = positive + negative
        prob_upd = jnp.where(denom > 0, positive / jnp.where(denom > 0, denom, 1.0), prob_old)
        tsdf_w = jnp.where(update, tsdf_upd, tsdf_old)
        w_w = jnp.where(update, w_upd, w_old)
        rgb_w = jnp.where(update[..., None], rgb_upd, rgb_old)
        prob_w = jnp.where(update, prob_upd, prob_old)
        wpool = jnp.where(mask, pool_idx, CFG.num_blocks)
        return v.replace(
            tsdf=v.tsdf.at[wpool].set(tsdf_w, mode="drop"),
            weight=v.weight.at[wpool].set(w_w, mode="drop"),
            rgb=v.rgb.at[wpool].set(rgb_w, mode="drop"),
            prob=v.prob.at[wpool].set(prob_w, mode="drop"),
        )

    timeit(jax.jit(fuse_given_samp), (vol, samp0, z, in_img, vis.pool_idx, vis.mask),
           10, "C: fusemath+scatter (samples as inputs)")

    # ---- D: C without the prob transcendentals ----
    def fuse_noprob(v, samp, z, in_img, pool_idx, mask):
        depth_s = samp[..., 0]; d2r_s = samp[..., 1]
        rgb_new = samp[..., 2:5]
        depth_ok = (depth_s > 0) & (depth_s <= MAX_DEPTH)
        sdf = d2r_s * (depth_s - z)
        update = mask[:, None] & in_img & depth_ok & (sdf > -CFG.truncation)
        tsdf_new = jnp.minimum(1.0, sdf / CFG.truncation)
        w_new = (1.0 - depth_s / MAX_DEPTH) * 4.0
        pool = jnp.clip(pool_idx, 0, CFG.num_blocks - 1)
        tsdf_old = v.tsdf[pool]; w_old = v.weight[pool]
        rgb_old = v.rgb[pool]
        w_comb = w_old + w_new
        w_safe = jnp.where(w_comb == 0, 1.0, w_comb)
        tsdf_upd = (tsdf_old * w_old + tsdf_new * w_new) / w_safe
        rgb_upd = vx.round_half_away(
            (rgb_old * w_old[..., None] + rgb_new * w_new[..., None]) / w_safe[..., None])
        w_upd = jnp.minimum(vx.round_half_away(w_comb), CFG.max_weight)
        tsdf_w = jnp.where(update, tsdf_upd, tsdf_old)
        w_w = jnp.where(update, w_upd, w_old)
        rgb_w = jnp.where(update[..., None], rgb_upd, rgb_old)
        wpool = jnp.where(mask, pool_idx, CFG.num_blocks)
        return v.replace(
            tsdf=v.tsdf.at[wpool].set(tsdf_w, mode="drop"),
            weight=v.weight.at[wpool].set(w_w, mode="drop"),
            rgb=v.rgb.at[wpool].set(rgb_w, mode="drop"),
        )

    timeit(jax.jit(fuse_noprob), (vol, samp0, z, in_img, vis.pool_idx, vis.mask),
           10, "D: fusemath no-prob (no log/exp)")

    # ---- E: pool row gather+scatter only ----
    def rows_only(v, pool_idx, mask):
        pool = jnp.clip(pool_idx, 0, CFG.num_blocks - 1)
        tsdf_old = v.tsdf[pool]; w_old = v.weight[pool]
        rgb_old = v.rgb[pool]; prob_old = v.prob[pool]
        wpool = jnp.where(mask, pool_idx, CFG.num_blocks)
        return v.replace(
            tsdf=v.tsdf.at[wpool].set(tsdf_old + 1e-7, mode="drop"),
            weight=v.weight.at[wpool].set(w_old + 1e-7, mode="drop"),
            rgb=v.rgb.at[wpool].set(rgb_old + 1e-7, mode="drop"),
            prob=v.prob.at[wpool].set(prob_old + 1e-7, mode="drop"),
        )

    timeit(jax.jit(rows_only), (vol, vis.pool_idx, vis.mask),
           10, "E: pool row gather+scatter only")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
