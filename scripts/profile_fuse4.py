#!/usr/bin/env python
"""Patch-sampling alternatives to the 130 ms fused image gather.

  G: XLA windowed gather — one descriptor per block fetching a
     (PH, PW, C) patch (32k descriptors instead of 16.8M).
  H: chunked einsum selection from patches (bf16 one-hot, MXU).
  I: take_along_axis selection from patches (still 16.8M descriptors,
     but on a tiny minor array — measures whether source size matters).
  J: donated-row fuse floor: barrier+merged+donated full fuse (the F
     experiment from profile_fuse3, with correct donation chaining).
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
PH, PW = 16, 16  # footprint p90 is 9x9, max 12x12 (profile_fuse run 1)


def timeit(fn, args, iters=10, label="", donate_idx=None):
    """donate_idx: position of the donated arg; its slot is refreshed
    from the returned first output each iteration (chaining)."""
    args = list(args)
    x = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    if donate_idx is not None:
        args[donate_idx] = x[0] if isinstance(x, tuple) else x
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(*args)
        if donate_idx is not None:
            args[donate_idx] = x[0] if isinstance(x, tuple) else x
        else:
            jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
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
    V = us.shape[0]

    stacked = jnp.stack(
        [fr.depth, d2r, fr.rgb[..., 0], fr.rgb[..., 1], fr.rgb[..., 2],
         fr.ht, fr.lt, jnp.zeros_like(fr.depth)], axis=-1)

    # patch origins (per block) from in-image voxels
    u_for = jnp.where(in_img, us, W - 1)
    v_for = jnp.where(in_img, vs, H - 1)
    u0 = jnp.clip(jnp.min(u_for, axis=1), 0, W - PW)
    v0 = jnp.clip(jnp.min(v_for, axis=1), 0, H - PH)
    u0, v0 = jax.device_put(u0), jax.device_put(v0)
    jax.block_until_ready(u0)

    # in-patch fraction sanity
    lu = np.asarray(us - u0[:, None]); lv = np.asarray(vs - v0[:, None])
    okfrac = np.mean((lu >= 0) & (lu < PW) & (lv >= 0) & (lv < PH))
    print(f"voxels inside {PH}x{PW} patch: {okfrac*100:.1f}%", flush=True)

    # ---- G: windowed gather of patches ----
    def g_patches(u0, v0):
        idx = jnp.stack([v0, u0], axis=-1)  # [V, 2]
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        p = lax.gather(stacked, idx, dnums, slice_sizes=(PH, PW, 8),
                       mode=lax.GatherScatterMode.CLIP)
        # consume fully so nothing is DCE'd
        return jnp.sum(p, axis=(1, 2, 3))

    sums = timeit(jax.jit(g_patches), (u0, v0), 10, "G windowed patch gather (consumed by sum)")

    # ---- H: patches + chunked einsum one-hot selection ----
    NPOS = PH * PW

    def h_select(u0, v0, us, vs, z):
        idx = jnp.stack([v0, u0], axis=-1)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        p = lax.gather(stacked, idx, dnums, slice_sizes=(PH, PW, 8),
                       mode=lax.GatherScatterMode.CLIP)  # [V, PH, PW, 8]
        pf = p.reshape(V, NPOS, 8)
        lu = us - u0[:, None]
        lv = vs - v0[:, None]
        inp = (lu >= 0) & (lu < PW) & (lv >= 0) & (lv < PH)
        pos = jnp.clip(lv, 0, PH - 1) * PW + jnp.clip(lu, 0, PW - 1)  # [V, 512]

        CH = 2048  # chunk of blocks per map step

        def chunk(c):
            pfc = lax.dynamic_slice_in_dim(pf, c * CH, CH, 0)
            posc = lax.dynamic_slice_in_dim(pos, c * CH, CH, 0)
            oh = (posc[:, :, None] ==
                  jnp.arange(NPOS, dtype=jnp.int32)[None, None, :]).astype(jnp.bfloat16)
            # split patches hi/mid for precise channels; rgb/ht/lt bf16-exact enough here
            hi = pfc.astype(jnp.bfloat16)
            mid = (pfc - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            s = (jnp.einsum("bvp,bpc->bvc", oh, hi,
                            preferred_element_type=jnp.float32)
                 + jnp.einsum("bvp,bpc->bvc", oh, mid,
                              preferred_element_type=jnp.float32))
            return s

        parts = lax.map(chunk, jnp.arange(V // CH))
        samp = parts.reshape(V, 512, 8)
        return samp, inp

    samp_h, inp_h = timeit(jax.jit(h_select), (u0, v0, us, vs, z), 5,
                           "H patches + chunked einsum select")

    # correctness vs direct gather where in-patch
    samp_ref = np.asarray(stacked)[np.asarray(vs), np.asarray(us)]
    sh = np.asarray(samp_h); ip = np.asarray(inp_h)
    err = np.abs(sh[ip] - samp_ref[ip]).max() if ip.any() else 0.0
    print(f"H max err (in-patch): {err:.2e}; in-patch {ip.mean()*100:.1f}%", flush=True)

    # ---- I: take_along_axis from patches ----
    def i_select(u0, v0, us, vs):
        idx = jnp.stack([v0, u0], axis=-1)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        p = lax.gather(stacked, idx, dnums, slice_sizes=(PH, PW, 8),
                       mode=lax.GatherScatterMode.CLIP)
        pf = p.reshape(V, NPOS, 8)
        lu = jnp.clip(us - u0[:, None], 0, PW - 1)
        lv = jnp.clip(vs - v0[:, None], 0, PH - 1)
        pos = lv * PW + lu
        s = jnp.take_along_axis(pf, pos[:, :, None], axis=1)
        return s

    timeit(jax.jit(i_select), (u0, v0, us, vs), 5, "I patches + take_along_axis")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
