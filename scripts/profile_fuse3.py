#!/usr/bin/env python
"""Validate the two fuse fixes suggested by profile_fuse2:
  1. optimization_barrier between the image gather and fusion math
     (stop XLA fusing the gather into the elementwise loop).
  2. merged pool payload (one row gather + one row scatter instead of 4+4)
     and donation.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

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
NB = CFG.num_blocks


def timeit(fn, args, iters=10, label=""):
    x = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(*args)
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

    us, vs, z, in_img, vis = proj(vol)
    jax.block_until_ready(us)

    stacked = jnp.stack(
        [fr.depth, d2r, fr.rgb[..., 0], fr.rgb[..., 1], fr.rgb[..., 2],
         fr.ht, fr.lt, jnp.zeros_like(fr.depth)], axis=-1)

    def fuse_math(v, samp, z, in_img, pool_idx, mask):
        depth_s = samp[..., 0]; d2r_s = samp[..., 1]
        rgb_new = samp[..., 2:5]; ht_s = samp[..., 5]; lt_s = samp[..., 6]
        depth_ok = (depth_s > 0) & (depth_s <= MAX_DEPTH)
        sdf = d2r_s * (depth_s - z)
        update = mask[:, None] & in_img & depth_ok & (sdf > -CFG.truncation)
        tsdf_new = jnp.minimum(1.0, sdf / CFG.truncation)
        w_new = (1.0 - depth_s / MAX_DEPTH) * 4.0
        pool = jnp.clip(pool_idx, 0, NB - 1)
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
        wpool = jnp.where(mask, pool_idx, NB)
        return v.replace(
            tsdf=v.tsdf.at[wpool].set(tsdf_w, mode="drop"),
            weight=v.weight.at[wpool].set(w_w, mode="drop"),
            rgb=v.rgb.at[wpool].set(rgb_w, mode="drop"),
            prob=v.prob.at[wpool].set(prob_w, mode="drop"),
        )

    # B (control, re-measured): gather fused into math
    def b_ctl(v, us, vs, z, in_img, pool_idx, mask):
        samp = stacked[vs, us]
        return fuse_math(v, samp, z, in_img, pool_idx, mask)

    # B+barrier
    def b_bar(v, us, vs, z, in_img, pool_idx, mask):
        samp = stacked[vs, us]
        samp = lax.optimization_barrier(samp)
        return fuse_math(v, samp, z, in_img, pool_idx, mask)

    args = (vol, us, vs, z, in_img, vis.pool_idx, vis.mask)
    timeit(jax.jit(b_ctl), args, 10, "B  control: fused gather+math")
    timeit(jax.jit(b_bar), args, 10, "B2 gather behind optimization_barrier")

    # ---- merged payload experiments ----
    # one [NB, 512*6] array: tsdf, weight, prob, r, g, b as 512-wide planes
    merged = jnp.concatenate(
        [vol.tsdf, vol.weight, vol.prob,
         vol.rgb[..., 0], vol.rgb[..., 1], vol.rgb[..., 2]], axis=1)
    jax.block_until_ready(merged)
    wpool = jnp.where(vis.mask, vis.pool_idx, NB)
    pool = jnp.clip(vis.pool_idx, 0, NB - 1)

    def e_merged(m):
        rows = m[pool]
        return m.at[wpool].set(rows + 1e-7, mode="drop")

    def e_merged_don(m):
        rows = m[pool]
        return m.at[wpool].set(rows + 1e-7, mode="drop")

    timeit(jax.jit(e_merged), (merged,), 10, "E2 merged rows gather+scatter")
    timeit(jax.jit(e_merged_don, donate_argnums=0), (merged.copy(),), 10,
           "E3 merged rows gather+scatter DONATED")

    # separate arrays donated (current layout + donation)
    def e_sep_don(t, w, p, r):
        return (t.at[wpool].set(t[pool] + 1e-7, mode="drop"),
                w.at[wpool].set(w[pool] + 1e-7, mode="drop"),
                p.at[wpool].set(p[pool] + 1e-7, mode="drop"),
                r.at[wpool].set(r[pool] + 1e-7, mode="drop"))

    timeit(jax.jit(e_sep_don, donate_argnums=(0, 1, 2, 3)),
           (vol.tsdf.copy(), vol.weight.copy(), vol.prob.copy(), vol.rgb.copy()),
           10, "E4 separate rows DONATED")

    # barrier + merged + donated: near-full fuse with both fixes
    def full_fix(m, us, vs, z, in_img, pool_idx, mask):
        samp = stacked[vs, us]
        samp = lax.optimization_barrier(samp)
        depth_s = samp[..., 0]; d2r_s = samp[..., 1]
        rgb_new = samp[..., 2:5]; ht_s = samp[..., 5]; lt_s = samp[..., 6]
        depth_ok = (depth_s > 0) & (depth_s <= MAX_DEPTH)
        sdf = d2r_s * (depth_s - z)
        update = mask[:, None] & in_img & depth_ok & (sdf > -CFG.truncation)
        tsdf_new = jnp.minimum(1.0, sdf / CFG.truncation)
        w_new = (1.0 - depth_s / MAX_DEPTH) * 4.0
        pool = jnp.clip(pool_idx, 0, NB - 1)
        rows = m[pool]  # [V, 512*6]
        tsdf_old = rows[:, 0:512]; w_old = rows[:, 512:1024]
        prob_old = rows[:, 1024:1536]
        r_old = rows[:, 1536:2048]; g_old = rows[:, 2048:2560]; b_old = rows[:, 2560:3072]
        w_comb = w_old + w_new
        w_safe = jnp.where(w_comb == 0, 1.0, w_comb)
        tsdf_upd = (tsdf_old * w_old + tsdf_new * w_new) / w_safe
        r_upd = vx.round_half_away((r_old * w_old + rgb_new[..., 0] * w_new) / w_safe)
        g_upd = vx.round_half_away((g_old * w_old + rgb_new[..., 1] * w_new) / w_safe)
        b_upd = vx.round_half_away((b_old * w_old + rgb_new[..., 2] * w_new) / w_safe)
        w_upd = jnp.minimum(vx.round_half_away(w_comb), CFG.max_weight)
        positive = jnp.exp(I._pow_log(prob_old, w_old / w_safe) + I._pow_log(ht_s, w_new / w_safe))
        negative = jnp.exp(I._pow_log(1.0 - prob_old, w_old / w_safe) + I._pow_log(lt_s, w_new / w_safe))
        denom = positive + negative
        prob_upd = jnp.where(denom > 0, positive / jnp.where(denom > 0, denom, 1.0), prob_old)
        new_rows = jnp.concatenate([
            jnp.where(update, tsdf_upd, tsdf_old),
            jnp.where(update, w_upd, w_old),
            jnp.where(update, prob_upd, prob_old),
            jnp.where(update, r_upd, r_old),
            jnp.where(update, g_upd, g_old),
            jnp.where(update, b_upd, b_old),
        ], axis=1)
        wpool2 = jnp.where(mask, pool_idx, NB)
        return m.at[wpool2].set(new_rows, mode="drop")

    timeit(jax.jit(full_fix, donate_argnums=0),
           (merged.copy(), us, vs, z, in_img, vis.pool_idx, vis.mask),
           10, "F  fuse with barrier + merged payload + donation")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
