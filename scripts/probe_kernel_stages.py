#!/usr/bin/env python
"""Sub-kernel stage attribution for the patch sampler.

Times stripped variants of the sample kernel at bench scale (22.3k live
blocks of a 32k cap, 24x32 patch, 8 channels):

  dma_only     patch DMAs + trivial writes (DMA issue + bytes)
  mxu          + K-stacked one-hot matmul (a_t), write a_t[:C]
  mask_fold    + column mask + fold tree (the full compute)
  full         the real kernel (sample_patches)

Differences give per-stage cost. All variants write all outputs so
Mosaic cannot drop work; iterations chain through the count scalar.
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

from disinfect_slam_tpu.ops.pallas.sample_kernel import _NT_DNUMS  # noqa: E402

W, H, C = 640, 480, 8
PH, PW, TB = 24, 32, 16
VCAP = 32768
COUNT = 22336  # live blocks (multiple of TB)
SPLITS = 2


def make_kernel(mode):
    def kernel(u0_ref, v0_ref, count_ref, img_ref, lu_ref, lv_ref,
               *refs):
        out_refs = refs[:C]
        valid_ref = refs[C]
        patch_ref = refs[C + 1]
        sems = refs[C + 2]
        i = pl.program_id(0)
        count = count_ref[0]

        def _dma(tile, b):
            v0 = pl.multiple_of(v0_ref[tile * TB + b], 8)
            u0c = pl.multiple_of(u0_ref[tile * TB + b] * C, 128)
            slot = jax.lax.rem(tile, 2)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(v0, PH), pl.ds(u0c, PW * C)],
                patch_ref.at[slot, b], sems.at[slot, b])

        @pl.when((i == 0) & (count > 0))
        def _():
            for b in range(TB):
                _dma(i, b).start()

        @pl.when((i + 1) * TB < count)
        def _():
            for b in range(TB):
                _dma(i + 1, b).start()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (SPLITS * PH, 512), 0)
        rowsel_i = jax.lax.rem(rows_i, jnp.int32(PH))
        pcol_i = jax.lax.broadcasted_iota(jnp.int32, (PW * C, 512), 0) // C
        slot = jax.lax.rem(i, 2)

        @pl.when(i * TB < count)
        def _compute():
          for b in range(TB):
            u0 = u0_ref[i * TB + b]
            v0 = v0_ref[i * TB + b]
            _dma(i, b).wait()
            lu = lu_ref[b] - u0
            lv = lv_ref[b] - v0
            in_patch = (lu >= 0) & (lu < PW) & (lv >= 0) & (lv < PH)
            lu_c = jnp.clip(lu, 0, PW - 1)
            lv_c = jnp.clip(lv, 0, PH - 1)
            vmask = in_patch.astype(jnp.float32)

            if mode == "dma_only":
                # NOTE: scalar VMEM reads (patch[0, 0]) cost ~0.8 us
                # each here — a probe landmine, not a DMA cost.  The
                # async copies have semaphore side effects, so Mosaic
                # keeps them even though the patch data goes unused.
                for cc in range(C):
                    out_refs[cc][b] = lu_c.astype(jnp.float32)
                valid_ref[b] = vmask
                continue

            p_full = patch_ref[slot, b]
            p_hi = p_full.astype(jnp.bfloat16)
            r1 = p_full - p_hi.astype(jnp.float32)
            p_mid = r1.astype(jnp.bfloat16)
            oh_t = (rowsel_i == lv_c[None, :]).astype(jnp.bfloat16)
            p_k = jnp.concatenate([p_hi, p_mid], axis=0)
            a_t = jax.lax.dot_general(
                p_k, oh_t, _NT_DNUMS, preferred_element_type=jnp.float32)

            if mode == "mxu":
                for cc in range(C):
                    out_refs[cc][b] = a_t[cc, :]
                valid_ref[b] = vmask
                continue

            m = a_t * (pcol_i == lu_c[None, :]).astype(jnp.float32)
            fold = PW * C
            while fold > C:
                fold //= 2
                m = m[:fold, :] + m[fold:2 * fold, :]
            for cc in range(C):
                out_refs[cc][b] = m[cc, :] * vmask
            valid_ref[b] = vmask

    return kernel


def make_vmem_kernel():
    """Whole image resident in VMEM: per-block patch is a direct
    dynamic slice — no DMA starts, no semaphores, no patch scratch."""
    def kernel(u0_ref, v0_ref, count_ref, img_ref, lu_ref, lv_ref, *refs):
        out_refs = refs[:C]
        valid_ref = refs[C]
        i = pl.program_id(0)
        count = count_ref[0]
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (2 * PH, 512), 0)
        rowsel_i = jax.lax.rem(rows_i, jnp.int32(PH))
        pcol_i = jax.lax.broadcasted_iota(jnp.int32, (PW * C, 512), 0) // C

        @pl.when(i * TB < count)
        def _compute():
          for b in range(TB):
            u0 = pl.multiple_of(u0_ref[i * TB + b] * C, 128)
            v0 = pl.multiple_of(v0_ref[i * TB + b], 8)
            lu = lu_ref[b] - u0_ref[i * TB + b]
            lv = lv_ref[b] - v0_ref[i * TB + b]
            in_patch = (lu >= 0) & (lu < PW) & (lv >= 0) & (lv < PH)
            lu_c = jnp.clip(lu, 0, PW - 1)
            lv_c = jnp.clip(lv, 0, PH - 1)
            vmask = in_patch.astype(jnp.float32)
            p_full = img_ref[pl.ds(v0, PH), pl.ds(u0, PW * C)]
            p_hi = p_full.astype(jnp.bfloat16)
            r1 = p_full - p_hi.astype(jnp.float32)
            p_mid = r1.astype(jnp.bfloat16)
            oh_t = (rowsel_i == lv_c[None, :]).astype(jnp.bfloat16)
            p_k = jnp.concatenate([p_hi, p_mid], axis=0)
            a_t = jax.lax.dot_general(
                p_k, oh_t, _NT_DNUMS, preferred_element_type=jnp.float32)
            m = a_t * (pcol_i == lu_c[None, :]).astype(jnp.float32)
            fold = PW * C
            while fold > C:
                fold //= 2
                m = m[:fold, :] + m[fold:2 * fold, :]
            for cc in range(C):
                out_refs[cc][b] = m[cc, :] * vmask
            valid_ref[b] = vmask

    return kernel


def run_variant(mode, u0, v0, img_flat, u, v):
    row_spec = pl.BlockSpec((TB, 512), lambda i, *_: (i, 0))
    out_shape = tuple(
        jax.ShapeDtypeStruct((VCAP, 512), jnp.float32) for _ in range(C + 1))
    if mode == "vmem_img":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(VCAP // TB,),
            in_specs=[
                pl.BlockSpec((H, W * C), lambda i, *_: (0, 0)),  # whole image, VMEM
                row_spec, row_spec,
            ],
            out_specs=tuple(row_spec for _ in range(C + 1)),
            scratch_shapes=[],
        )

        @jax.jit
        def go(cnt):
            outs = pl.pallas_call(
                make_vmem_kernel(), out_shape=out_shape, grid_spec=grid_spec,
            )(u0, v0, cnt, img_flat, u, v)
            return (outs[0][0, 0:1] > 1e30).astype(jnp.int32)

        cnt = jnp.full((1,), COUNT, jnp.int32)
        x = go(cnt)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            x = go(cnt + x[0])
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{mode}: {ms:.2f} ms", flush=True)
        return ms
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(VCAP // TB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), row_spec, row_spec],
        out_specs=tuple(row_spec for _ in range(C + 1)),
        scratch_shapes=[
            pltpu.VMEM((2, TB, PH, PW * C), jnp.float32),
            pltpu.SemaphoreType.DMA((2, TB)),
        ],
    )

    @jax.jit
    def go(cnt):
        outs = pl.pallas_call(
            make_kernel(mode), out_shape=out_shape, grid_spec=grid_spec,
        )(u0, v0, cnt, img_flat, u, v)
        return (outs[0][0, 0:1] > 1e30).astype(jnp.int32)

    cnt = jnp.full((1,), COUNT, jnp.int32)
    x = go(cnt)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        x = go(cnt + x[0])
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{mode}: {ms:.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (H, W * C)).astype(np.float32)
    u0 = ((rng.integers(0, (W - PW) // 16, VCAP)) * 16).astype(np.int32)
    v0 = ((rng.integers(0, (H - PH) // 8, VCAP)) * 8).astype(np.int32)
    u = (u0[:, None] + rng.integers(0, 16, (VCAP, 512))).astype(np.int32)
    v = (v0[:, None] + rng.integers(0, 16, (VCAP, 512))).astype(np.int32)
    args = tuple(jax.device_put(jnp.asarray(a)) for a in (u0, v0, img, u, v))
    jax.block_until_ready(args[0])
    for mode in ("mask_fold", "vmem_img"):
        run_variant(mode, *args)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
