#!/usr/bin/env python
"""Probe v4: int8 bit-plane selection.

Instead of 3 bf16 hi/mid/lo matmuls reconstructing f32, split the f32
patch BITS into four byte planes (exact), select all four with ONE s8
matmul (2x the bf16 MXU rate), fold each plane separately, and
reassemble the bits in u32.  Every product has exactly one nonzero term
so the selection is bit-exact by construction.
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
TB = 16
NT_DNUMS = (((0,), (0,)), ((), ()))


def _kernel(u0_ref, v0_ref, img_ref, lu_ref, lv_ref, *refs):
    out_refs = refs[:C]
    valid_ref = refs[C]
    patch_ref = refs[C + 1]
    sems = refs[C + 2]
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def _dma(tile, b):
        v0 = pl.multiple_of(v0_ref[tile * TB + b], 8)
        u0c = pl.multiple_of(u0_ref[tile * TB + b] * C, 128)
        slot = jax.lax.rem(tile, 2)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(v0, PH), pl.ds(u0c, PW * C)],
            patch_ref.at[slot, b],
            sems.at[slot, b],
        )

    @pl.when(i == 0)
    def _():
        for b in range(TB):
            _dma(i, b).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        for b in range(TB):
            _dma(i + 1, b).start()

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (PH, 512), 0)
    pos_i = jax.lax.broadcasted_iota(jnp.int32, (4 * PW * C, 512), 0)
    pos_mod = jax.lax.rem(pos_i, PW * C)
    slot = jax.lax.rem(i, 2)
    for b in range(TB):
        idx = i * TB + b
        _dma(i, b).wait()
        lu = lu_ref[b] - u0_ref[idx]
        lv = lv_ref[b] - v0_ref[idx]
        in_patch = (lu >= 0) & (lu < PW) & (lv >= 0) & (lv < PH)
        lu_c = jnp.clip(lu, 0, PW - 1)
        lv_c = jnp.clip(lv, 0, PH - 1)

        oh_t = (rows_i == lv_c[None, :]).astype(jnp.int8)  # [PH, 512]
        p_full = patch_ref[slot, b]  # [PH, PW*C] f32
        bits = jax.lax.bitcast_convert_type(p_full, jnp.uint32)
        planes = [
            (jax.lax.shift_right_logical(bits, jnp.uint32(8 * k))
             & jnp.uint32(0xFF)).astype(jnp.int32) - 128
            for k in range(4)
        ]
        pb = jnp.concatenate(planes, axis=1).astype(jnp.int8)  # [PH, 4*PW*C]
        a_t = jax.lax.dot_general(
            pb, oh_t, NT_DNUMS, preferred_element_type=jnp.int32
        )  # [4*PW*C, 512] each entry in [-128, 127] + 0s

        d = pos_mod - lu_c[None, :] * C
        sel = ((d >= 0) & (d < C))
        # selected byte-128 where this row is the voxel's pixel; the
        # one-hot row select already zeroed other rows, but 0 == byte
        # 128 - 128 is ambiguous -> add 128 inside the mask instead:
        m = jnp.where(sel, a_t + 128, 0)  # [4*PW*C, 512] in [0, 255]
        planes_sel = []
        for k in range(4):
            mk = m[k * PW * C:(k + 1) * PW * C, :]
            fold = PW * C
            while fold > C:
                fold //= 2
                mk = mk[:fold, :] + mk[fold:2 * fold, :]
            planes_sel.append(mk.astype(jnp.uint32))  # [C, 512]
        bits_sel = (
            planes_sel[0]
            | (planes_sel[1] << jnp.uint32(8))
            | (planes_sel[2] << jnp.uint32(16))
            | (planes_sel[3] << jnp.uint32(24))
        )
        samp = jax.lax.bitcast_convert_type(bits_sel, jnp.float32)  # [C, 512]
        vmask = in_patch.astype(jnp.float32)
        for cc in range(C):
            out_refs[cc][b] = samp[cc, :] * vmask
        valid_ref[b] = vmask


@jax.jit
def run(img_flat, u0, v0, u, v):
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
        _kernel, out_shape=out_shape, grid_spec=grid_spec,
    )(u0, v0, img_flat, u, v)


def main():
    rng = np.random.default_rng(0)
    img_np = rng.uniform(0, 255, (H, W, C)).astype(np.float32)
    img = jnp.asarray(img_np.reshape(H, W * C))
    u0_np = (rng.integers(0, (W - PW) // 16, V) * 16).astype(np.int32)
    v0_np = (rng.integers(0, (H - PH) // 8, V) * 8).astype(np.int32)
    u_np = (u0_np[:, None] + rng.integers(0, 16, (V, 512))).astype(np.int32)
    v_np = (v0_np[:, None] + rng.integers(0, 16, (V, 512))).astype(np.int32)
    args = [jnp.asarray(x) for x in (u0_np, v0_np, u_np, v_np)]

    try:
        outs = run(img, *args)
        jax.block_until_ready(outs[0])
        samp = np.stack([np.asarray(o) for o in outs[:C]], axis=-1)
        ref = img_np[v_np, u_np]
        print(f"exact={np.array_equal(samp, ref)}", flush=True)
        t0 = time.perf_counter()
        for _ in range(10):
            outs = run(img, *args)
            jax.block_until_ready(outs[0])
        print(f"int8 bit-plane sampler: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
              flush=True)
    except Exception as e:
        print(f"FAIL {str(e)[:500]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
