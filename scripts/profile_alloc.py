#!/usr/bin/env python
"""Decompose the allocate stage (12.7 ms at the r3 config): candidate
DDA, neighbor thin, presence gather, compaction, visibility, insert.

Each stage is timed as a chained donated jit program that returns the
volume plus an anti-DCE scalar folded from the stage outputs.
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
from disinfect_slam_tpu.ops import hash as h  # noqa: E402

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
    world_T_cam = pose.inverse()
    cfg = vol.cfg
    sent = vx.sentinel_key(cfg)

    # anti-DCE: fold stage outputs into a tiny perturbation of the
    # volume's oob counter so each chained call depends on the last
    def chain(v, scalar):
        # anti-DCE: oob_count += (scalar == INT32_MIN) — always 0 in
        # practice but XLA cannot fold it, so the stage must run
        probe = (scalar.astype(jnp.int32) == jnp.iinfo(jnp.int32).min).astype(
            jnp.int32
        )
        return v.replace(oob_count=v.oob_count + probe)

    def s_cand(v):
        keys, oob = I.generate_candidates(
            fr.depth, d2r, cam, pose, world_T_cam, MAX_DEPTH, cfg
        )
        return chain(v, jnp.sum(keys) + oob)

    def s_thin(v):
        keys, oob = I.generate_candidates(
            fr.depth, d2r, cam, pose, world_T_cam, MAX_DEPTH, cfg
        )
        left = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
        keys = jnp.where(keys == left, sent, keys)
        return chain(v, jnp.sum(keys) + oob)

    def presence(v, keys):
        ks = jnp.where(keys < sent, keys, 0)
        cb = cfg.coord_bits
        koff = 1 << (cb - 1)
        kmask = (1 << cb) - 1
        cell, in_range = h.table_index_xyz(
            (ks & kmask) - koff,
            ((ks >> cb) & kmask) - koff,
            ((ks >> (2 * cb)) & kmask) - koff,
            cfg,
        )
        exists = v.block_table[cell] >= 0
        return (keys < sent) & in_range & ~exists

    def s_presence(v):
        keys, oob = I.generate_candidates(
            fr.depth, d2r, cam, pose, world_T_cam, MAX_DEPTH, cfg
        )
        left = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
        keys = jnp.where(keys == left, sent, keys)
        new = presence(v, keys)
        return chain(v, jnp.sum(new.astype(jnp.int32)))

    def s_compact(v):
        keys, oob = I.generate_candidates(
            fr.depth, d2r, cam, pose, world_T_cam, MAX_DEPTH, cfg
        )
        left = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
        keys = jnp.where(keys == left, sent, keys)
        new = presence(v, keys)
        rank = jnp.cumsum(new.astype(jnp.int32)) - 1
        slot = jnp.where(new & (rank < cfg.max_candidates), rank, cfg.max_candidates)
        compact = (
            jnp.full((cfg.max_candidates,), sent, jnp.int32)
            .at[slot]
            .set(keys, mode="drop")
        )
        return chain(v, jnp.sum(compact))

    def s_vis(v):
        keys, oob = I.generate_candidates(
            fr.depth, d2r, cam, pose, world_T_cam, MAX_DEPTH, cfg
        )
        left = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
        keys = jnp.where(keys == left, sent, keys)
        new = presence(v, keys)
        rank = jnp.cumsum(new.astype(jnp.int32)) - 1
        slot = jnp.where(new & (rank < cfg.max_candidates), rank, cfg.max_candidates)
        compact = (
            jnp.full((cfg.max_candidates,), sent, jnp.int32)
            .at[slot]
            .set(keys, mode="drop")
        )
        valid = compact < sent
        coords = vx.unpack_block_coord(jnp.where(valid, compact, 0), cfg)
        valid = valid & I.block_visibility(coords, pose, cam, cfg, full=True)
        return chain(v, jnp.sum(valid.astype(jnp.int32)))

    def s_full(v):
        return I.allocate_blocks(v, fr.depth, d2r, cam, pose, MAX_DEPTH)

    # ---- insert internals (mirrors hash._insert_dense stages) ----
    from disinfect_slam_tpu.ops.hash import table_index

    def _compacted(v):
        keys, oob = I.generate_candidates(
            fr.depth, d2r, cam, pose, world_T_cam, MAX_DEPTH, cfg
        )
        left = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
        keys = jnp.where(keys == left, sent, keys)
        new = presence(v, keys)
        rank = jnp.cumsum(new.astype(jnp.int32)) - 1
        slot = jnp.where(new & (rank < cfg.max_candidates), rank, cfg.max_candidates)
        compact = (
            jnp.full((cfg.max_candidates,), sent, jnp.int32)
            .at[slot]
            .set(keys, mode="drop")
        )
        valid = compact < sent
        coords = vx.unpack_block_coord(jnp.where(valid, compact, 0), cfg)
        valid = valid & I.block_visibility(coords, pose, cam, cfg, full=True)
        return coords, valid

    def s_claims(v):
        coords, valid = _compacted(v)
        m = coords.shape[0]
        idx, in_range = table_index(coords, cfg)
        exists = v.block_table[idx] >= 0
        pending = valid & in_range & ~exists
        cand_id = jnp.arange(m, dtype=jnp.int32)
        claim_slot = jnp.where(pending, idx, cfg.grid_cells)
        claims = (
            jnp.full((cfg.grid_cells,), -1, jnp.int32)
            .at[claim_slot]
            .max(cand_id, mode="drop")
        )
        won = pending & (claims[idx] == cand_id)
        return chain(v, jnp.sum(won.astype(jnp.int32)))

    def s_tables(v):
        coords, valid = _compacted(v)
        m = coords.shape[0]
        idx, in_range = table_index(coords, cfg)
        exists = v.block_table[idx] >= 0
        pending = valid & in_range & ~exists
        cand_id = jnp.arange(m, dtype=jnp.int32)
        claim_slot = jnp.where(pending, idx, cfg.grid_cells)
        claims = (
            jnp.full((cfg.grid_cells,), -1, jnp.int32)
            .at[claim_slot]
            .max(cand_id, mode="drop")
        )
        won = pending & (claims[idx] == cand_id)
        w = cfg.max_new_per_round
        rank = jnp.cumsum(won.astype(jnp.int32)) - 1
        heap_idx = v.num_free - 1 - rank
        ok = won & (heap_idx >= 0) & (rank < w)
        pool_idx = v.heap[jnp.clip(heap_idx, 0, cfg.num_blocks - 1)]
        block_table = v.block_table.at[jnp.where(ok, idx, cfg.grid_cells)].set(
            pool_idx, mode="drop"
        )
        wslot = jnp.where(ok, pool_idx, cfg.num_blocks)
        entry_block = v.entry_block.at[wslot].set(pool_idx, mode="drop")
        entry_key = v.entry_key.at[wslot].set(
            vx.pack_block_coord(coords, cfg), mode="drop"
        )
        v = v.replace(
            block_table=block_table, entry_block=entry_block, entry_key=entry_key
        )
        return chain(v, jnp.sum(ok.astype(jnp.int32)))

    def fresh(v):
        return jax.tree.map(lambda x: x.copy(), v)

    timeit(jax.jit(s_cand, donate_argnums=0), fresh(vol), 20, "candidates (DDA only)")
    timeit(jax.jit(s_thin, donate_argnums=0), fresh(vol), 20, "+ neighbor thin")
    timeit(jax.jit(s_presence, donate_argnums=0), fresh(vol), 20, "+ presence gather")
    timeit(jax.jit(s_compact, donate_argnums=0), fresh(vol), 20, "+ cumsum/scatter compact")
    timeit(jax.jit(s_vis, donate_argnums=0), fresh(vol), 20, "+ visibility gate")
    timeit(jax.jit(s_claims, donate_argnums=0), fresh(vol), 20, "+ insert: claims scatter-max")
    timeit(jax.jit(s_tables, donate_argnums=0), fresh(vol), 20, "+ insert: table scatters")
    timeit(jax.jit(s_full, donate_argnums=0), fresh(vol), 20, "full allocate (payload resets incl.)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
