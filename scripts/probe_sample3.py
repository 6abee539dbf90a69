#!/usr/bin/env python
"""Probe v3: TRANSPOSED selection — voxels ride lanes end-to-end.

The 264 ms mystery of probes 1-2 was never matmul dispatch: compute had
voxels on sublanes while output refs want voxels on lanes, so every
per-channel write was a [512] sublane->lane relayout (72-128 per step).

Here: a_T [PW*C, 512] = dot_general(patch [PH, PW*C], oh_T [PH, 512])
contracting dim0 x dim0 (the MXU-native lhsT form), column mask + fold
tree over SUBLANES (256 -> 8, all tile-aligned), and each channel lands
as a single-sublane row [512] written straight to its output lane
vector.  No relayouts anywhere.
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
NT_DNUMS = (((0,), (0,)), ((), ()))  # contract lhs dim0 with rhs dim0


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
    pos_i = jax.lax.broadcasted_iota(jnp.int32, (PW * C, 512), 0)
    slot = jax.lax.rem(i, 2)
    for b in range(TB):
        idx = i * TB + b
        _dma(i, b).wait()
        lu = lu_ref[b] - u0_ref[idx]  # [512] lanes
        lv = lv_ref[b] - v0_ref[idx]
        in_patch = (lu >= 0) & (lu < PW) & (lv >= 0) & (lv < PH)
        lu_c = jnp.clip(lu, 0, PW - 1)
        lv_c = jnp.clip(lv, 0, PH - 1)

        oh_t = (rows_i == lv_c[None, :]).astype(jnp.bfloat16)  # [PH, 512]
        p_full = patch_ref[slot, b]  # [PH, PW*C]
        p_hi = p_full.astype(jnp.bfloat16)
        r1 = p_full - p_hi.astype(jnp.float32)
        p_mid = r1.astype(jnp.bfloat16)
        p_lo = (r1 - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        a_t = (
            jax.lax.dot_general(p_hi, oh_t, NT_DNUMS,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(p_mid, oh_t, NT_DNUMS,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(p_lo, oh_t, NT_DNUMS,
                                  preferred_element_type=jnp.float32)
        )  # [PW*C, 512] — voxels on lanes

        d = pos_i - lu_c[None, :] * C
        m = a_t * ((d >= 0) & (d < C)).astype(jnp.float32)
        fold = PW * C
        while fold > C:
            fold //= 2
            m = m[:fold, :] + m[fold:2 * fold, :]
        # m [C, 512]
        vmaskf = in_patch.astype(jnp.float32)
        for cc in range(C):
            out_refs[cc][b] = m[cc, :] * vmaskf
        valid_ref[b] = vmaskf


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

    outs = run(img, *args)
    jax.block_until_ready(outs[0])
    samp = np.stack([np.asarray(o) for o in outs[:C]], axis=-1)  # [V,512,C]
    ref = img_np[v_np, u_np]
    print(f"exact={np.array_equal(samp, ref)} "
          f"close={np.allclose(samp, ref, atol=1e-4)}", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        outs = run(img, *args)
        jax.block_until_ready(outs[0])
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"transposed sampler: {ms:.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
