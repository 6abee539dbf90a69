#!/usr/bin/env python
"""Splat z-buffer kernel v2 probe: per-block COMPACT [16, 32] patch built
from bbox-relative coords (16 rows x 32 lanes instead of 32 x 256),
placed into the aligned window via dynamic sublane+lane rolls
(pltpu.roll with traced shifts — verified working on this stack).

Compares against the v1 formulation (32-row loop over [512, 256]) for
both correctness and time at surf-block scale (S=12288).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BIG = 2**30
H, W = 480, 640
HPAD, WPAD = 496, 768
S = 12288  # surface blocks at bench scale
CW = 32    # compact patch lanes (footprint <= 15 in u)
CH = 16    # compact patch rows  (footprint <= 15 in v)
TB = 8


def _v2_kernel(bu_ref, bv_ref, n_ref, lu_ref, lv_ref, dq_ref, zbuf_ref,
               patch_ref):
    """lu/lv are bbox-relative (0-based); bu/bv are RAW bbox origins."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zbuf_ref[...] = jnp.full(zbuf_ref.shape, BIG, jnp.int32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
    for b in range(TB):
        idx = i * TB + b

        @pl.when(idx < n_ref[0])
        def _(b=b, idx=idx):
            lu = lu_ref[b]
            lv = lv_ref[b]
            dq = dq_ref[b]
            # width-128 rows: lanes >= CW have no matching voxel (lu < CW)
            # so the masked min leaves them BIG; 128-wide writes respect
            # the lane-slicing alignment rules
            mcol = (cols == lu[:, None]) | (cols == lu[:, None] + 1)
            for qv in range(CH):
                rmask = (lv == qv) | (lv == qv - 1)
                vals = jnp.where(rmask, dq, BIG)
                row = jnp.min(jnp.where(mcol, vals[:, None], BIG), axis=0)
                patch_ref[b, qv, 0:128] = row

            bu = bu_ref[idx]
            bv = bv_ref[idx]
            u0a = pl.multiple_of(
                jnp.minimum((bu >> 7) << 7, WPAD - 256), 128)
            v0a = pl.multiple_of(
                jnp.minimum((bv >> 3) << 3, HPAD - 24), 8)
            rx = bu - u0a
            ry = bv - v0a
            p = patch_ref[b]  # [24, 256], rows CH.. and lanes CW.. are BIG
            p = pltpu.roll(p, ry, axis=0)
            p = pltpu.roll(p, rx, axis=1)
            win = zbuf_ref[pl.ds(v0a, 24), pl.ds(u0a, 256)]
            zbuf_ref[pl.ds(v0a, 24), pl.ds(u0a, 256)] = jnp.minimum(win, p)


@jax.jit
def run_v2(bu, bv, n, lu, lv, dq):
    row = pl.BlockSpec((TB, 512), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S // TB,),
        in_specs=[row, row, row],
        out_specs=pl.BlockSpec((HPAD, WPAD), lambda i, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((TB, 24, 256), jnp.int32)],
    )
    return pl.pallas_call(
        _v2_kernel,
        out_shape=jax.ShapeDtypeStruct((HPAD, WPAD), jnp.int32),
        grid_spec=grid_spec,
    )(bu, bv, n.reshape(1), lu, lv, dq)


def _v2_init_kernel(bu_ref, bv_ref, n_ref, lu_ref, lv_ref, dq_ref, zbuf_ref,
                    patch_ref):
    # pre-fill scratch ONCE with BIG so the pad area never needs rewriting
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        patch_ref[...] = jnp.full(patch_ref.shape, BIG, jnp.int32)

    _v2_kernel(bu_ref, bv_ref, n_ref, lu_ref, lv_ref, dq_ref, zbuf_ref,
               patch_ref)


@jax.jit
def run_v2i(bu, bv, n, lu, lv, dq):
    row = pl.BlockSpec((TB, 512), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S // TB,),
        in_specs=[row, row, row],
        out_specs=pl.BlockSpec((HPAD, WPAD), lambda i, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((TB, 24, 256), jnp.int32)],
    )
    return pl.pallas_call(
        _v2_init_kernel,
        out_shape=jax.ShapeDtypeStruct((HPAD, WPAD), jnp.int32),
        grid_spec=grid_spec,
    )(bu, bv, n.reshape(1), lu, lv, dq)



def _v3_kernel(bu_ref, bv_ref, n_ref, lu_ref, lv_ref, dq_ref, zbuf_ref,
               patch_ref):
    """Transposed splat: patch rows (y) on sublanes, voxels on lanes.
    Per qu column: double-masked [CH, 512] min over lanes -> one patch
    column, placed by a static lane mask.  No sublane<->lane relayouts.
    patch_ref scratch is [TB, 24, 256] (reused layout; only [:CH, :CW]
    is written per block, the rest stays BIG from the one-time init)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zbuf_ref[...] = jnp.full(zbuf_ref.shape, BIG, jnp.int32)
        patch_ref[...] = jnp.full(patch_ref.shape, BIG, jnp.int32)

    qv_iota = jax.lax.broadcasted_iota(jnp.int32, (CH, 512), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 1)
    for b in range(TB):
        idx = i * TB + b

        @pl.when(idx < n_ref[0])
        def _(b=b, idx=idx):
            lu = lu_ref[b]  # [512] voxels on lanes
            lv = lv_ref[b]
            dq = dq_ref[b]
            # row membership: voxel contributes to patch row qv iff
            # lv in {qv-1, qv}; build once for all rows [CH, 512]
            rmask = (qv_iota == lv[None, :]) | (qv_iota == lv[None, :] + 1)
            vals0 = jnp.where(rmask, dq[None, :], BIG)  # [CH, 512]
            acc = jnp.full((CH, 128), BIG, jnp.int32)
            for qu in range(CW):
                cmask = (lu == qu) | (lu == qu - 1)  # [512]
                col = jnp.min(jnp.where(cmask[None, :], vals0, BIG),
                              axis=1, keepdims=True)  # [CH, 1]
                acc = jnp.minimum(
                    acc, jnp.where(lane_row == qu, col, BIG))
            patch_ref[b, 0:CH, 0:128] = acc

            bu = bu_ref[idx]
            bv = bv_ref[idx]
            u0a = pl.multiple_of(
                jnp.minimum((bu >> 7) << 7, WPAD - 256), 128)
            v0a = pl.multiple_of(
                jnp.minimum((bv >> 3) << 3, HPAD - 24), 8)
            rx = bu - u0a
            ry = bv - v0a
            p = patch_ref[b]
            p = pltpu.roll(p, ry, axis=0)
            p = pltpu.roll(p, rx, axis=1)
            win = zbuf_ref[pl.ds(v0a, 24), pl.ds(u0a, 256)]
            zbuf_ref[pl.ds(v0a, 24), pl.ds(u0a, 256)] = jnp.minimum(win, p)


@jax.jit
def run_v3(bu, bv, n, lu, lv, dq):
    row = pl.BlockSpec((TB, 512), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S // TB,),
        in_specs=[row, row, row],
        out_specs=pl.BlockSpec((HPAD, WPAD), lambda i, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((TB, 24, 256), jnp.int32)],
    )
    return pl.pallas_call(
        _v3_kernel,
        out_shape=jax.ShapeDtypeStruct((HPAD, WPAD), jnp.int32),
        grid_spec=grid_spec,
    )(bu, bv, n.reshape(1), lu, lv, dq)


def main():
    rng = np.random.default_rng(0)
    # synthetic blocks: footprints <= 13x13 at random positions
    bu = rng.integers(0, W - 16, S).astype(np.int32)
    bv = rng.integers(0, H - 16, S).astype(np.int32)
    lu = rng.integers(0, 13, (S, 512)).astype(np.int32)
    lv = rng.integers(0, 13, (S, 512)).astype(np.int32)
    dq = rng.integers(100, 2**20, (S, 512)).astype(np.int32)
    dead = rng.uniform(size=(S, 512)) < 0.75  # ~128 live voxels per block
    dq = np.where(dead, BIG, dq)

    # numpy reference z-buffer
    zref = np.full((HPAD, WPAD), BIG, np.int64)
    uu = (bu[:, None] + lu).reshape(-1)
    vv = (bv[:, None] + lv).reshape(-1)
    dd = dq.reshape(-1).astype(np.int64)
    for du in (0, 1):
        for dv in (0, 1):
            np.minimum.at(zref, (vv + dv, uu + du), dd)

    args = [jnp.asarray(x) for x in
            (bu, bv, np.array(S, np.int32), lu, lv, dq)]

    for name, fn in (("v3", run_v3), ("v2", run_v2i)):
        try:
            out = fn(*args)
            jax.block_until_ready(out)
            ok = np.array_equal(np.asarray(out).astype(np.int64), zref)
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(*args)
                jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{name}: {ms:.2f} ms exact={ok}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:4000]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
