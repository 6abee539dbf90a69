#!/usr/bin/env python
"""MXU cost model probe for the one-hot select matmuls (round 3).

The sample kernel spends ~17 ms/frame on [K=24, M=256] x [K=24, N=512]
bf16 matmuls (3 precision splits x 32k blocks).  Whether batching
several blocks into one matmul (bigger K and/or N) saves time depends
on how Mosaic/MXU cost scales with each dim.  This probe times a
VMEM-resident matmul loop at the candidate shapes.

Shapes (lhsT convention: lhs [K, M], rhs [K, N] -> out [M, N]):
  A  24 x 256 x 512     current per-block select (x3 splits x32k)
  B  120 x 256 x 2560   5 blocks batched along K+N (block-diag one-hot)
  C  48 x 512 x 512     superblock patch (4x wider patch, same N)
  D  24 x 256 x 2048    4 blocks batched along N only (shared patch rows?)
  E  128 x 256 x 512    K padded to full MXU depth
  F  24 x 512 x 512     M doubled (wider patch)
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

_NT = (((0,), (0,)), ((), ()))


def make_bench(k, m, n, reps):
    def kernel(lhs_ref, rhs_ref, out_ref):
        acc = jnp.zeros((m, n), jnp.float32)
        lhs = lhs_ref[...]
        rhs = rhs_ref[...]
        for r in range(reps):
            # nudge rhs per rep so Mosaic can't hoist the matmul
            acc = acc + jax.lax.dot_general(
                lhs, rhs + jnp.bfloat16(r), _NT,
                preferred_element_type=jnp.float32)
        out_ref[...] = acc

    @jax.jit
    def run(lhs, rhs):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        )(lhs, rhs)

    return run


def main():
    shapes = {
        "A 24x256x512": (24, 256, 512),
        "B 120x256x2560": (120, 256, 2560),
        "C 48x512x512": (48, 512, 512),
        "D 24x256x2048": (24, 256, 2048),
        "E 128x256x512": (128, 256, 512),
        "F 24x512x512": (24, 512, 512),
    }
    reps = 64
    key = jax.random.PRNGKey(0)
    for label, (k, m, n) in shapes.items():
        lhs = jax.random.normal(key, (k, m), jnp.bfloat16)
        rhs = jax.random.normal(key, (k, n), jnp.bfloat16)
        run = make_bench(k, m, n, reps)
        out = run(lhs, rhs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = run(lhs, rhs + out[:1, :1].astype(jnp.bfloat16))
        jax.block_until_ready(out)
        us = (time.perf_counter() - t0) / (iters * reps) * 1e6
        flops = 2 * k * m * n
        eff = flops / (us * 1e-6) / 197e12 * 100  # vs ~197 TF/s bf16 v5e
        # per-512-voxel-block cost if this shape serves nb blocks at once
        nb = n // 512
        print(f"{label}: {us:8.2f} us/matmul  {eff:5.1f}% MXU  "
              f"-> {us / max(nb,1):7.2f} us/block", flush=True)


if __name__ == "__main__":
    main()
