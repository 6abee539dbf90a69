#!/usr/bin/env python
"""Bisect which part of the splat v2 kernel fails to lower: 3D-scratch
row writes, roll-of-scratch-read, or the dynamic-window RMW."""
import os
import sys

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

BIG = 2**30
HPAD, WPAD = 496, 768
S, TB, CH = 64, 8, 16


def make_kernel(mode):
    def k(bu_ref, bv_ref, n_ref, lu_ref, lv_ref, dq_ref, zbuf_ref, patch_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            zbuf_ref[...] = jnp.full(zbuf_ref.shape, BIG, jnp.int32)
            patch_ref[...] = jnp.full(patch_ref.shape, BIG, jnp.int32)

        cols = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
        for b in range(TB):
            idx = i * TB + b

            @pl.when(idx < n_ref[0])
            def _(b=b, idx=idx):
                lu = lu_ref[b]
                lv = lv_ref[b]
                dq = dq_ref[b]
                if mode in ("rowwrite", "full", "norollfull"):
                    mcol = (cols == lu[:, None]) | (cols == lu[:, None] + 1)
                    for qv in range(CH):
                        rmask = (lv == qv) | (lv == qv - 1)
                        vals = jnp.where(rmask, dq, BIG)
                        row = jnp.min(
                            jnp.where(mcol, vals[:, None], BIG), axis=0)
                        patch_ref[b, qv, 0:128] = row
                bu = bu_ref[idx]
                bv = bv_ref[idx]
                u0a = pl.multiple_of(
                    jnp.minimum((bu >> 7) << 7, WPAD - 256), 128)
                v0a = pl.multiple_of(
                    jnp.minimum((bv >> 3) << 3, HPAD - 24), 8)
                rx = bu - u0a
                ry = bv - v0a
                p = patch_ref[b]
                if mode in ("roll", "full"):
                    p = pltpu.roll(p, ry, axis=0)
                    p = pltpu.roll(p, rx, axis=1)
                if mode in ("roll", "full", "norollfull", "rmw"):
                    win = zbuf_ref[pl.ds(v0a, 24), pl.ds(u0a, 256)]
                    zbuf_ref[pl.ds(v0a, 24), pl.ds(u0a, 256)] = jnp.minimum(
                        win, p)

    return k


def run(mode, args):
    row = pl.BlockSpec((TB, 512), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S // TB,),
        in_specs=[row, row, row],
        out_specs=pl.BlockSpec((HPAD, WPAD), lambda i, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((TB, 24, 256), jnp.int32)],
    )
    return pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((HPAD, WPAD), jnp.int32),
        grid_spec=grid_spec,
    )(*args)


def main():
    rng = np.random.default_rng(0)
    bu = rng.integers(0, 600, S).astype(np.int32)
    bv = rng.integers(0, 460, S).astype(np.int32)
    lu = rng.integers(0, 13, (S, 512)).astype(np.int32)
    lv = rng.integers(0, 13, (S, 512)).astype(np.int32)
    dq = rng.integers(100, 2**20, (S, 512)).astype(np.int32)
    args = [jnp.asarray(x) for x in
            (bu, bv, np.array(S, np.int32).reshape(1), lu, lv, dq)]
    for mode in ("rmw", "rowwrite", "roll", "norollfull", "full"):
        try:
            out = run(mode, args)
            jax.block_until_ready(out)
            print(f"{mode}: OK", flush=True)
        except Exception as e:
            print(f"{mode}: FAIL {str(e)[:200]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
