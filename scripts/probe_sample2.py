#!/usr/bin/env python
"""Probe v2: can batching fix the sampler?

  empty_tb16 / empty_tb64: grid+output overhead vs tile size, single
      merged [TB, 512*(C+1)] output instead of 9 refs.
  bd_tb16: block-diagonal row-select — ONE [8192, 384]@[384, 256]
      matmul (x3 bf16 splits) per 16-block step + fold column select.
  bd_tb64: 64 blocks per step as 4x 16-block-diagonal matmuls.
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

H, W, C = 480, 640, 8
V = 32768
PH, PW = 24, 32


def make_kernel(mode, tb, group=8):  # blocks per block-diagonal matmul (VMEM-bounded)

    def kernel(u0_ref, v0_ref, img_ref, lu_ref, lv_ref, out_ref,
               patch_ref, sems):
        i = pl.program_id(0)
        n_tiles = pl.num_programs(0)

        def _dma(tile, b):
            v0 = pl.multiple_of(v0_ref[tile * tb + b], 8)
            u0c = pl.multiple_of(u0_ref[tile * tb + b] * C, 128)
            slot = jax.lax.rem(tile, 2)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(v0, PH), pl.ds(u0c, PW * C)],
                patch_ref.at[slot, b],
                sems.at[slot, b],
            )

        if mode != "empty":
            @pl.when(i == 0)
            def _():
                for b in range(tb):
                    _dma(i, b).start()

            @pl.when(i + 1 < n_tiles)
            def _():
                for b in range(tb):
                    _dma(i + 1, b).start()

        if mode == "empty":
            out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)
            return

        for b in range(tb):
            _dma(i, b).wait()

        slot = jax.lax.rem(i, 2)
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, group * PH), 1)
        pcol = jax.lax.broadcasted_iota(jnp.int32, (512, PW * C), 1)
        for g in range(tb // group):
            oh_parts, mask_parts, vmasks = [], [], []
            for b in range(group):
                idx = i * tb + g * group + b
                lu_l = lu_ref[g * group + b] - u0_ref[idx]  # [512]
                lv_l = lv_ref[g * group + b] - v0_ref[idx]
                in_patch = (lu_l >= 0) & (lu_l < PW) & (lv_l >= 0) & (lv_l < PH)
                lu_c = jnp.clip(lu_l, 0, PW - 1)
                lv_c = jnp.clip(lv_l, 0, PH - 1)
                oh_parts.append(
                    (rows == (lv_c + b * PH)[:, None]).astype(jnp.bfloat16))
                d = pcol - lu_c[:, None] * C
                mask_parts.append(((d >= 0) & (d < C)).astype(jnp.float32))
                vmasks.append(in_patch.astype(jnp.float32))
            oh = jnp.concatenate(oh_parts, axis=0)      # [G*512, G*PH]
            colmask = jnp.concatenate(mask_parts, axis=0)  # [G*512, PW*C]

            ps = [patch_ref[slot, g * group + b] for b in range(group)]
            pstack = jnp.concatenate(ps, axis=0)  # [G*PH, PW*C]

            p_hi = pstack.astype(jnp.bfloat16)
            r1 = pstack - p_hi.astype(jnp.float32)
            p_mid = r1.astype(jnp.bfloat16)
            p_lo = (r1 - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            a = (jnp.dot(oh, p_hi, preferred_element_type=jnp.float32)
                 + jnp.dot(oh, p_mid, preferred_element_type=jnp.float32)
                 + jnp.dot(oh, p_lo, preferred_element_type=jnp.float32))
            # [G*512, PW*C]
            m = a * colmask
            fold = PW * C
            while fold > C:
                fold //= 2
                m = m[:, :fold] + m[:, fold:2 * fold]
            # m [G*512, C]
            for b in range(group):
                segv = m[b * 512:(b + 1) * 512, :]  # [512, C]
                row = []
                for cc in range(C):
                    row.append(segv[:, cc] * vmasks[b])
                row.append(vmasks[b])
                for cc in range(C + 1):
                    out_ref[g * group + b, pl.ds(cc * 512, 512)] = row[cc]

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "tb", "group"))
def run(img_flat, u0, v0, u, v, mode, tb, group=8):
    out_spec = pl.BlockSpec((tb, 512 * (C + 1)), lambda i, *_: (i, 0))
    row_spec = pl.BlockSpec((tb, 512), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V // tb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), row_spec, row_spec],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, tb, PH, PW * C), jnp.float32),
            pltpu.SemaphoreType.DMA((2, tb)),
        ],
    )
    return pl.pallas_call(
        make_kernel(mode, tb, group),
        out_shape=jax.ShapeDtypeStruct((V, 512 * (C + 1)), jnp.float32),
        grid_spec=grid_spec,
    )(u0, v0, img_flat, u, v)


def main():
    rng = np.random.default_rng(0)
    img_np = rng.uniform(0, 255, (H, W, C)).astype(np.float32)
    img = jnp.asarray(img_np.reshape(H, W * C))
    u0_np = (rng.integers(0, (W - PW) // 16, V) * 16).astype(np.int32)
    v0_np = (rng.integers(0, (H - PH) // 8, V) * 8).astype(np.int32)
    u_np = (u0_np[:, None] + rng.integers(0, 16, (V, 512))).astype(np.int32)
    v_np = (v0_np[:, None] + rng.integers(0, 16, (V, 512))).astype(np.int32)
    u0, v0 = jnp.asarray(u0_np), jnp.asarray(v0_np)
    u, v = jnp.asarray(u_np), jnp.asarray(v_np)

    for mode, tb, group in (("bd", 4, 4), ("bd", 8, 8), ("bd", 16, 16)):
        try:
            out = run(img, u0, v0, u, v, mode, tb, group)
            jax.block_until_ready(out)
            if mode == "bd":
                # verify correctness on first 64 blocks
                o = np.asarray(out[:64]).reshape(64, C + 1, 512)
                ref = img_np[v_np[:64], u_np[:64]]  # [64, 512, C]
                ok = np.allclose(o[:, :C].transpose(0, 2, 1), ref, atol=1e-4)
                exact = np.array_equal(o[:, :C].transpose(0, 2, 1), ref)
                print(f"  bd tb={tb} g={group} correct={ok} exact={exact}", flush=True)
            t0 = time.perf_counter()
            for _ in range(10):
                out = run(img, u0, v0, u, v, mode, tb, group)
                jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{mode}_tb{tb}_g{group}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"{mode}_tb{tb}_g{group}: FAIL {str(e)[:300]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
