#!/usr/bin/env python
"""Isolate the Pallas sampler's cost components at full scale (32k
blocks): full selection vs DMA-only (trivial selection) vs no-DMA.
Tells whether the 313 ms pallas integrate is DMA/grid-bound or
selection-bound."""
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

H, W, C = 480, 640, 8
V = 32768
PH, PW = 24, 32
TB = 16


def make_kernel(mode):
    def kernel(u0_ref, v0_ref, img_ref, lu_ref, lv_ref, *refs,
               tb=TB, ph=PH, pw=PW, c=C):
        out_refs = refs[:c]
        valid_ref = refs[c]
        patch_ref = refs[c + 1]
        sems = refs[c + 2]
        i = pl.program_id(0)
        n_tiles = pl.num_programs(0)

        def _dma(tile, b):
            v0 = pl.multiple_of(v0_ref[tile * tb + b], 8)
            u0c = pl.multiple_of(u0_ref[tile * tb + b] * c, 128)
            slot = jax.lax.rem(tile, 2)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(v0, ph), pl.ds(u0c, pw * c)],
                patch_ref.at[slot, b],
                sems.at[slot, b],
            )

        if mode != "nodma":
            @pl.when(i == 0)
            def _():
                for b in range(tb):
                    _dma(i, b).start()

            @pl.when(i + 1 < n_tiles)
            def _():
                for b in range(tb):
                    _dma(i + 1, b).start()

        for b in range(tb):
            u0 = u0_ref[i * tb + b]
            v0 = v0_ref[i * tb + b]
            if mode != "nodma":
                _dma(i, b).wait()
            lu = lu_ref[b] - u0
            lv = lv_ref[b] - v0
            in_patch = (lu >= 0) & (lu < pw) & (lv >= 0) & (lv < ph)
            vmask = in_patch.astype(jnp.float32)

            if mode == "dma_only":
                p_full = patch_ref[jax.lax.rem(i, 2), b]
                row0 = p_full[0, :]  # touch the patch so DMA isn't dead
                for cc in range(c):
                    out_refs[cc][b] = vmask * row0[cc]
                valid_ref[b] = vmask
                continue
            if mode == "nodma":
                for cc in range(c):
                    out_refs[cc][b] = vmask * float(cc)
                valid_ref[b] = vmask
                continue

            lu_c = jnp.clip(lu, 0, pw - 1)
            lv_c = jnp.clip(lv, 0, ph - 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (512, ph), 1)
            oh_v = (rows == lv_c[:, None]).astype(jnp.bfloat16)
            p_full = patch_ref[jax.lax.rem(i, 2), b]
            p_hi = p_full.astype(jnp.bfloat16)
            r1 = p_full - p_hi.astype(jnp.float32)
            p_mid = r1.astype(jnp.bfloat16)
            p_lo = (r1 - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            a = (jnp.dot(oh_v, p_hi, preferred_element_type=jnp.float32)
                 + jnp.dot(oh_v, p_mid, preferred_element_type=jnp.float32)
                 + jnp.dot(oh_v, p_lo, preferred_element_type=jnp.float32))
            if mode == "stage1":
                for cc in range(c):
                    out_refs[cc][b] = a[:, cc] * vmask
                valid_ref[b] = vmask
                continue
            pcol = jax.lax.broadcasted_iota(jnp.int32, (512, pw * c), 1)
            d = pcol - lu_c[:, None] * c
            oh_wc = ((d >= 0) & (d < c)).astype(jnp.float32)
            m = a * oh_wc
            fold = pw * c
            while fold > c:
                fold //= 2
                m = m[:, :fold] + m[:, fold:2 * fold]
            for cc in range(c):
                out_refs[cc][b] = m[:, cc] * vmask
            valid_ref[b] = vmask
    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run(img_flat, u0, v0, u, v, mode):
    row_spec = pl.BlockSpec((TB, 512), lambda i, *_: (i, 0))
    out_shape = tuple(
        jax.ShapeDtypeStruct((V, 512), jnp.float32) for _ in range(C + 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V // TB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), row_spec, row_spec],
        out_specs=tuple(row_spec for _ in range(C + 1)),
        scratch_shapes=[
            pltpu.VMEM((2, TB, PH, PW * C), jnp.float32),
            pltpu.SemaphoreType.DMA((2, TB)),
        ],
    )
    return pl.pallas_call(
        make_kernel(mode), out_shape=out_shape, grid_spec=grid_spec,
    )(u0, v0, img_flat, u, v)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W * C)).astype(np.float32))
    u0 = jnp.asarray((rng.integers(0, (W - PW) // 16, V) * 16).astype(np.int32))
    v0 = jnp.asarray((rng.integers(0, (H - PH) // 8, V) * 8).astype(np.int32))
    u = jnp.asarray((np.asarray(u0)[:, None] + rng.integers(0, 16, (V, 512))).astype(np.int32))
    v = jnp.asarray((np.asarray(v0)[:, None] + rng.integers(0, 16, (V, 512))).astype(np.int32))

    for mode in ("nodma", "dma_only", "stage1", "full"):
        outs = run(img, u0, v0, u, v, mode)
        jax.block_until_ready(outs[0])
        t0 = time.perf_counter()
        for _ in range(10):
            outs = run(img, u0, v0, u, v, mode)
            jax.block_until_ready(outs[0])
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{mode}: {ms:.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
