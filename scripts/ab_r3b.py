#!/usr/bin/env python
"""Round-3 fuse decomposition + sample_tile sweep.

All timings chain a data-dependent (unfoldable) token through
iterations so XLA cannot DCE the measured work, and donate the volume
where it flows through.
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


def tok(x):
    """Data-dependent zero: unfoldable, cheap."""
    return (x > jnp.float32(1e30)).astype(jnp.int32).reshape(())


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

    # ---- precompute a frozen visible set + projection inputs ----
    @jax.jit
    def precompute(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        offs = vx.index_to_offset(jnp.arange(CFG.block_volume, dtype=jnp.int32), CFG)
        pos_grid = vx.block_to_point(vis.block_pos, CFG)[:, None, :] + offs[None, :, :]
        pos_world = pos_grid.astype(jnp.float32) * CFG.voxel_size
        pos_cam = pose.apply(pos_world)
        pih = cam.intrinsics.project(pos_cam)
        z = pih[..., 2]
        u = vx.round_half_away(pih[..., 0] / z).astype(jnp.int32)
        v_ = vx.round_half_away(pih[..., 1] / z).astype(jnp.int32)
        in_img = (u >= 0) & (u < W) & (v_ >= 0) & (v_ < H)
        us = jnp.clip(u, 0, W - 1)
        vs = jnp.clip(v_, 0, H - 1)
        u_for = jnp.where(in_img, us, W - 1)
        v_for = jnp.where(in_img, vs, H - 1)
        u0 = jnp.min(u_for, axis=1).astype(jnp.int32)
        v0 = jnp.min(v_for, axis=1).astype(jnp.int32)
        stacked = jnp.stack(
            [fr.depth, d2r, fr.rgb[..., 0], fr.rgb[..., 1], fr.rgb[..., 2],
             fr.ht, fr.lt, jnp.zeros_like(fr.depth)], axis=-1)
        return vis, us, vs, z, u0, v0, stacked

    vis, us, vs, z, u0, v0, stacked = jax.block_until_ready(precompute(vol))
    print(f"visible count: {int(vis.count)}", flush=True)

    def timeit(fn, args, iters=20, label="", donate=False):
        f = jax.jit(fn, donate_argnums=(0,) if donate else ())
        x = f(*args)
        jax.block_until_ready(x)
        args = list(args)
        t0 = time.perf_counter()
        for _ in range(iters):
            if donate:
                args[0] = x[0]
                x = f(*args)
            else:
                # chain the token into the count argument (shape-stable)
                args[-1] = args[-1] + x[-1] if isinstance(x, tuple) else args[-1]
                x = f(*args)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label}: {ms:.2f} ms", flush=True)
        return ms

    from disinfect_slam_tpu.ops.pallas.sample_kernel import sample_patches

    # 1) no-op floor: donated volume passthrough
    def noop(v, t):
        return (v.replace(num_free=v.num_free + t), tok(jnp.float32(0)))

    timeit(lambda v, t: noop(v, t),
           [jax.tree.map(lambda x: x.copy(), vol), jnp.int32(0)],
           20, "no-op floor (donated vol)", donate=True)

    # 2) sample kernel alone (count-exit at the real count)
    def samp_only(cnt):
        chans, ok = sample_patches(
            stacked, u0, v0, us, vs,
            ph=CFG.patch_h, pw=CFG.patch_w, tb=CFG.sample_tile,
            as_channels=True, splits=CFG.sampler_splits,
            count=vis.count + cnt,
        )
        s = chans[0][0, 0] + chans[5][0, 0]
        return (tok(s),)

    timeit(lambda cnt: samp_only(cnt), [jnp.int32(0)], 20, "sample kernel only")

    # 3) projection math alone (visible set fixed)
    def proj_only(cnt):
        offs = vx.index_to_offset(jnp.arange(CFG.block_volume, dtype=jnp.int32), CFG)
        bp = vis.block_pos + cnt  # depends on token: no cross-iter CSE
        pos_grid = vx.block_to_point(bp, CFG)[:, None, :] + offs[None, :, :]
        pos_world = pos_grid.astype(jnp.float32) * CFG.voxel_size
        pos_cam = pose.apply(pos_world)
        pih = cam.intrinsics.project(pos_cam)
        zz = pih[..., 2]
        uu = vx.round_half_away(pih[..., 0] / zz)
        vv = vx.round_half_away(pih[..., 1] / zz)
        return (tok(uu[0, 0] + vv[0, 0] + zz[0, 0]),)

    timeit(lambda cnt: proj_only(cnt), [jnp.int32(0)], 20, "projection math only")

    # 4) row gather+scatter + fusion math, fake samples (no kernel)
    def math_only(v, t):
        cfg = v.cfg
        pool = jnp.clip(vis.pool_idx, 0, cfg.num_blocks - 1)
        tsdf_old = v.tsdf[pool]
        rgbw_old = v.rgbw[pool]
        w_old = (rgbw_old >> 24).astype(jnp.float32) + t
        rgb_old = jnp.stack([
            (rgbw_old & 0xFF), (rgbw_old >> 8) & 0xFF,
            (rgbw_old >> 16) & 0xFF], -1).astype(jnp.float32)
        prob_old = v.prob[pool]
        depth_s = z * 1.01
        d2r_s = jnp.ones_like(z)
        sdf = d2r_s * (depth_s - z)
        update = vis.mask[:, None] & (sdf > -cfg.truncation)
        tsdf_new = jnp.minimum(1.0, sdf / cfg.truncation)
        w_new = (1.0 - depth_s / MAX_DEPTH) * 4.0
        w_comb = w_old + w_new
        w_safe = jnp.where(w_comb == 0, 1.0, w_comb)
        tsdf_upd = (tsdf_old * w_old + tsdf_new * w_new) / w_safe
        rgb_upd = vx.round_half_away(
            (rgb_old * w_old[..., None] + 128.0 * w_new[..., None]) / w_safe[..., None])
        w_upd = jnp.minimum(vx.round_half_away(w_comb), cfg.max_weight)
        prob_upd = jnp.clip(prob_old * 0.5 + 0.25, 0.0, 1.0)
        tsdf_w = jnp.where(update, tsdf_upd, tsdf_old)
        w_w = jnp.where(update, w_upd, w_old)
        rgb_w = jnp.where(update[..., None], rgb_upd, rgb_old)
        prob_w = jnp.where(update, prob_upd, prob_old)
        wpool = jnp.where(vis.mask, vis.pool_idx, cfg.num_blocks)
        rgbw_w = (rgb_w[..., 0].astype(jnp.uint32)
                  | (rgb_w[..., 1].astype(jnp.uint32) << 8)
                  | (rgb_w[..., 2].astype(jnp.uint32) << 16)
                  | (w_w.astype(jnp.uint32) << 24))
        v = v.replace(
            tsdf=v.tsdf.at[wpool].set(tsdf_w, mode="drop"),
            rgbw=v.rgbw.at[wpool].set(rgbw_w, mode="drop"),
            prob=v.prob.at[wpool].set(prob_w, mode="drop"),
        )
        return (v, tok(jnp.min(jnp.abs(tsdf_w))))

    timeit(math_only, [jax.tree.map(lambda x: x.copy(), vol), jnp.float32(0)],
           20, "rows+math+scatter only (no kernel)", donate=True)

    # 5) sample_tile sweep on the full step
    for tb in (32, 64):
        c2 = dataclasses.replace(CFG, sample_tile=tb)

        def full2(v, c2=c2):
            v = dataclasses.replace(v, cfg=c2)
            v = I.integrate(v, fr, cam, pose, MAX_DEPTH)
            return dataclasses.replace(v, cfg=CFG)

        f = jax.jit(full2, donate_argnums=0)
        x = f(jax.tree.map(lambda a: a.copy(), vol))
        jax.block_until_ready(x.tsdf)
        t0 = time.perf_counter()
        for _ in range(10):
            x = f(x)
        jax.block_until_ready(x.tsdf)
        print(f"full integrate [tb={tb}]: "
              f"{(time.perf_counter() - t0) / 10 * 1e3:.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
