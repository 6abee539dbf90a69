#!/usr/bin/env python
"""Does a row-scatter's cost scale with the OPERAND size on TPU?

Context: the integrate step's fixed (non-allocate) frame cost rises
~6-9 ms from 2^17 to 2^18 block capacity (PROGRESS.md "open measurement
question"), yet every per-frame op is O(visible)/O(entries), and the
CPU-compiled HLO is structurally identical at both capacities (6 payload
scatters, no dataflow-forced copies).  Two TPU-specific suspects remain:

  A. XLA:TPU lowers scatter with an O(operand) pass (e.g. a full-array
     select against the scattered mask) instead of per-update DUS;
  B. buffer assignment fails to alias a donated operand through the
     scatter chain and inserts a full-pool copy.

This probe times ONE donated row-scatter of U=8192 rows into f32/u32
[N,512] pools at N = 2^16..2^18, chained (output feeds the next
iteration) so the relay can't overlap timing.  O(U) lowering -> flat
times; O(N) -> doubling.  It then times the 3-array payload-write
pattern from _insert_dense + fuse_visible (reset-scatter, row-gather,
fuse-scatter on tsdf/rgbw/prob) to see the composed effect.

Run serially on an idle chip (PROGRESS.md contention warning).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

U = 8192  # updates per scatter (= max_new_per_round in the bench config)
V = 512


def timeit(fn, *args, iters=20, label=""):
    # keep a copy of the donated arg0 BEFORE warmup consumes it
    keep = jax.tree.map(lambda a: a.copy(), args[0])
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    x = keep
    for _ in range(iters):
        x = fn(x, *args[1:])
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {label}: {ms:.3f} ms", flush=True)
    return ms


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    # genuinely unique rows (unique_indices=True with real duplicates
    # would be UB and mis-measure)
    rows = jnp.asarray(
        np.random.choice(1 << 16, size=U, replace=False), jnp.int32
    )
    upd = jnp.asarray(np.random.rand(U, V), jnp.float32)

    rows_sorted = jnp.sort(rows)

    print(f"-- single donated row-scatter, {U} rows of {V} f32 --", flush=True)
    for log2 in (16, 17, 18):
        n = 1 << log2

        @jax.jit
        def mk(n=n):
            return jnp.zeros((n, V), jnp.float32)

        def scat(p, r, u):
            # chain: derive the update from the pool so iterations serialize
            return p.at[r].set(u + p[0, 0], mode="drop")

        def scat_unique(p, r, u):
            return p.at[r].set(u + p[0, 0], mode="drop", unique_indices=True)

        def scat_hinted(p, r, u):
            return p.at[r].set(
                u + p[0, 0], mode="drop", unique_indices=True,
                indices_are_sorted=True,
            )

        timeit(jax.jit(scat, donate_argnums=0), mk(), rows, upd,
               label=f"N=2^{log2} scatter (no hints)")
        timeit(jax.jit(scat_unique, donate_argnums=0), mk(), rows, upd,
               label=f"N=2^{log2} scatter (unique)")
        timeit(jax.jit(scat_hinted, donate_argnums=0), mk(), rows_sorted, upd,
               label=f"N=2^{log2} scatter (unique+sorted)")

    print(f"-- payload pattern: reset-scatter + row-gather + fuse-scatter "
          f"on 3 arrays (tsdf f32 / rgbw u32 / prob f32) --", flush=True)
    VIS = 32768
    vrows = jnp.asarray(np.random.randint(0, 1 << 16, size=(VIS,)), jnp.int32)
    for log2 in (16, 17, 18):
        n = 1 << log2

        @jax.jit
        def mk3(n=n):
            return (
                jnp.ones((n, V), jnp.float32),
                jnp.ones((n, V), jnp.uint32),
                jnp.ones((n, V), jnp.float32),
            )

        state = mk3()

        def step(state, rnew, rvis):
            t, c, p = state
            # allocation resets (compact rows)
            t = t.at[rnew].set(jnp.full((U, V), 1.0, jnp.float32), mode="drop")
            c = c.at[rnew].set(jnp.zeros((U, V), jnp.uint32), mode="drop")
            p = p.at[rnew].set(jnp.full((U, V), 0.5, jnp.float32), mode="drop")
            # fuse: gather visible rows, math, scatter back
            tg = t[rvis]
            cg = c[rvis]
            pg = p[rvis]
            tg = tg * 0.5 + 0.1
            cg = cg + 1
            pg = pg * 0.9
            t = t.at[rvis].set(tg, mode="drop")
            c = c.at[rvis].set(cg, mode="drop")
            p = p.at[rvis].set(pg, mode="drop")
            return (t, c, p)

        f = jax.jit(step, donate_argnums=0)
        timeit(f, state, rows, vrows, label=f"N=2^{log2} 3-array pattern")


if __name__ == "__main__":
    main()
