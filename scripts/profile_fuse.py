#!/usr/bin/env python
"""Per-stage TPU profile of the integrate step at bench scale.

Times jitted stage compositions (differences give per-stage cost) and
microbenches the fusion image gather under channel-count / dtype
variations to establish whether the wall is descriptor-rate or payload
bytes.  All timing loops chain outputs into the next iteration (axon
relay reports nonsense for unchained same-input loops).
"""
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


def timeit(fn, arg, iters=10, label=""):
    x = fn(arg)  # warmup consumes arg (donated); chain from its output
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

    def mkframe(f):
        pose, rgb, depth, ht, lt = f
        return I.FrameInput(
            rgb=jax.device_put(jnp.asarray(rgb)),
            depth=jax.device_put(jnp.asarray(depth)),
            ht=jax.device_put(jnp.asarray(ht)),
            lt=jax.device_put(jnp.asarray(lt)),
        ), SE3.from_matrix(jnp.asarray(pose))

    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(CFG)
    print("populating volume (30 frames)...", flush=True)
    for f in frames:
        pose, rgb, depth, ht, lt = f
        fr = I.FrameInput(rgb=jnp.asarray(rgb), depth=jnp.asarray(depth),
                          ht=jnp.asarray(ht), lt=jnp.asarray(lt))
        vol = step(vol, fr, jnp.asarray(pose))
    jax.block_until_ready(vol.tsdf)
    print(f"active blocks: {int(vol.num_active_blocks)}", flush=True)

    fr, pose = mkframe(frames[0])

    # ---- stage compositions (chained on vol) ----
    def stage_a(v):
        return I.allocate_blocks(v, fr.depth, d2r, cam, pose, MAX_DEPTH)

    def stage_av(v):
        v = I.allocate_blocks(v, fr.depth, d2r, cam, pose, MAX_DEPTH)
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        # touch vis so it isn't dead-code eliminated
        return v.replace(tsdf=v.tsdf.at[0, 0].add(0.0 * vis.count))

    def stage_avf(v):
        v = I.allocate_blocks(v, fr.depth, d2r, cam, pose, MAX_DEPTH)
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        v, _, _ = I.fuse_visible(v, vis, fr, d2r, cam, pose, MAX_DEPTH)
        return v

    def full(v):
        return I.integrate(v, fr, cam, pose, MAX_DEPTH)

    def fresh(v):
        return jax.tree_util.tree_map(lambda a: a.copy(), v)

    va = timeit(jax.jit(stage_a, donate_argnums=0), fresh(vol), 10, "allocate")
    vav = timeit(jax.jit(stage_av, donate_argnums=0), fresh(vol), 10, "alloc+visible")
    vavf = timeit(jax.jit(stage_avf, donate_argnums=0), fresh(vol), 10, "alloc+vis+fuse")
    vfull = timeit(jax.jit(full, donate_argnums=0), fresh(vol), 10, "full integrate")

    # ---- gather microbench at the real working-set shape ----
    # real us/vs from the populated volume + this frame
    @jax.jit
    def uvz(v):
        vis = I.gather_visible(v, cam, pose, fr.depth, d2r)
        offs = vx.index_to_offset(jnp.arange(CFG.block_volume, dtype=jnp.int32), CFG)
        pos_grid = vx.block_to_point(vis.block_pos, CFG)[:, None, :] + offs[None, :, :]
        pos_world = pos_grid.astype(jnp.float32) * CFG.voxel_size
        pos_cam = pose.apply(pos_world)
        pih = cam.intrinsics.project(pos_cam)
        z = pih[..., 2]
        u = vx.round_half_away(pih[..., 0] / z).astype(jnp.int32)
        v_ = vx.round_half_away(pih[..., 1] / z).astype(jnp.int32)
        us = jnp.clip(u, 0, cam.img_w - 1)
        vs = jnp.clip(v_, 0, cam.img_h - 1)
        return us, vs, vis

    us, vs, vis = uvz(vol)
    jax.block_until_ready(us)
    nvox = us.size
    print(f"gather working set: {nvox/1e6:.1f} M descriptors", flush=True)

    def mk_stacked(c, dtype):
        chans = [fr.depth, d2r, fr.rgb[..., 0], fr.rgb[..., 1],
                 fr.rgb[..., 2], fr.ht, fr.lt, jnp.zeros_like(fr.depth)][:c]
        return jnp.stack(chans, axis=-1).astype(dtype)

    for c, dt, lbl in [
        (8, jnp.float32, "gather 8ch f32"),
        (4, jnp.float32, "gather 4ch f32"),
        (2, jnp.float32, "gather 2ch f32"),
        (1, jnp.float32, "gather 1ch f32"),
        (8, jnp.bfloat16, "gather 8ch bf16"),
        (2, jnp.bfloat16, "gather 2ch bf16"),
    ]:
        img = mk_stacked(c, dt)

        def g(uv, img=img):
            u, v = uv
            s = img[v, u]
            carry = (s[..., 0].astype(jnp.int32) * 0)
            return (u + carry[..., :u.shape[-1]] * 0, v)

        # chain: u feeds back (forced dependency on s)
        def g2(uv, img=img):
            u, v = uv
            s = img[v, u]
            dep = s.reshape(-1)[0].astype(jnp.int32) * 0
            return (u + dep, v)

        timeit(jax.jit(g2), (us, vs), 10, lbl)

    # flat 1D gather (single channel, linearized index) — pure descriptor rate
    img1 = fr.depth.reshape(-1)
    lin = (vs * W + us).reshape(us.shape[0], -1)

    def gflat(l):
        s = img1[l]
        dep = s.reshape(-1)[0].astype(jnp.int32) * 0
        return l + dep

    timeit(jax.jit(gflat), lin, 10, "gather 1ch flat-index")

    # u32-packed: depth(f16) + d2r can be recomputed; rgb u8x3 + ht/lt u8 -> 2x u32
    packed = (
        fr.rgb[..., 0].astype(jnp.uint32)
        | (fr.rgb[..., 1].astype(jnp.uint32) << 8)
        | (fr.rgb[..., 2].astype(jnp.uint32) << 16)
    )

    def gpack(l):
        s = packed.reshape(-1)[l]
        dep = s.reshape(-1)[0].astype(jnp.int32) * 0
        return l + dep

    timeit(jax.jit(gpack), lin, 10, "gather packed-u32 flat")

    # row-dedup estimate: how many unique pixels per block row
    un = np.asarray(us[:2048]); vn = np.asarray(vs[:2048])
    linn = vn * W + un
    uniq_frac = np.mean([len(np.unique(r)) / r.size for r in linn])
    print(f"unique pixels per 512-voxel block row: {uniq_frac*512:.0f} ({uniq_frac*100:.0f}%)", flush=True)
    # block screen bbox stats
    ubb = un.max(1) - un.min(1) + 1
    vbb = vn.max(1) - vn.min(1) + 1
    print(f"block bbox u: p50={np.percentile(ubb,50):.0f} p90={np.percentile(ubb,90):.0f} max={ubb.max()}", flush=True)
    print(f"block bbox v: p50={np.percentile(vbb,50):.0f} p90={np.percentile(vbb,90):.0f} max={vbb.max()}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
