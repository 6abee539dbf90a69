#!/usr/bin/env python
"""Time ONE splat-render configuration in a fresh process.

Usage: python scripts/splat_one.py CW CH TB [W H] [--zpass] [--equal]

Companion to ab_splat_narrow.py: on the axon-relay TPU client,
alternating two render executables in one process wedges the device
nondeterministically (INVALID_ARGUMENT on every later dispatch — seen
with BOTH the default and narrow programs, so it is a client/relay
instability, not a kernel bug; single-program timed loops are stable).
Each configuration therefore measures in its own process.  --equal
additionally renders the (32,16) default ONCE first and bit-compares
(two executions total of the reference program, which stays inside the
stable envelope).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import load_replay_frames, make_orbit_frames  # noqa: E402
from disinfect_slam_tpu.config import TSDFConfig  # noqa: E402
from disinfect_slam_tpu.core.geometry import (  # noqa: E402
    SE3, CameraIntrinsics, CameraParams,
)
from disinfect_slam_tpu.core.state import TSDFVolume  # noqa: E402
from disinfect_slam_tpu.ops import integrate as I  # noqa: E402
from disinfect_slam_tpu.ops.pallas.splat_kernel import (  # noqa: E402
    splat_depth_pallas, splat_render_pallas,
)

W, H = 640, 480
K = (525.1, 525.3, 319.6, 239.7)
MAX_DEPTH = 4.0
CFG = TSDFConfig(
    voxel_size=0.004, truncation=0.024,
    num_buckets_log2=19, num_blocks_log2=18,
    max_candidates=32768, max_visible=32768, max_new_per_round=8192,
    max_probe=16, sampler_splits=2, alloc_stride=4, alloc_every=3,
)


def main():
    cw, ch, tb = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    rw, rh = W, H
    rest = [a for a in sys.argv[4:] if not a.startswith("--")]
    if len(rest) >= 2:
        rw, rh = int(rest[0]), int(rest[1])
    zpass = "--zpass" in sys.argv
    prep = "--prep" in sys.argv
    equal = "--equal" in sys.argv

    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    frames = load_replay_frames(30, W, H) or make_orbit_frames(30, W, H, K)
    step = jax.jit(
        lambda v, f, m: I.integrate(v, f, cam, SE3.from_matrix(m), MAX_DEPTH),
        donate_argnums=0,
    )
    vol = TSDFVolume.create(CFG)
    for f in frames:
        fr = I.FrameInput(rgb=jnp.asarray(f[1]), depth=jnp.asarray(f[2]),
                          ht=jnp.asarray(f[3]), lt=jnp.asarray(f[4]))
        vol = step(vol, fr, jnp.asarray(f[0]))
    jax.block_until_ready(vol.tsdf)
    print(f"active blocks: {int(vol.num_active_blocks)}", flush=True)
    poses = [jnp.asarray(f[0]) for f in frames[:10]]

    if (rw, rh) != (W, H):
        sc = rw / W
        rcam = CameraParams.create(
            CameraIntrinsics.create(K[0] * sc, K[1] * sc,
                                    K[2] * sc, K[3] * rh / H), rh, rw)
    else:
        rcam = cam

    if prep:
        from disinfect_slam_tpu.ops.pallas.splat_kernel import _prep_splat_blocks

        f = jax.jit(lambda v, m: _prep_splat_blocks(
            v, rcam, SE3.from_matrix(m), MAX_DEPTH, 1.25, 512,
            cw=cw, ch=ch)[0].dq_k)
        kindname = "prep"
    else:
        render_fn = splat_depth_pallas if zpass else splat_render_pallas
        f = jax.jit(lambda v, m: render_fn(
            v, rcam, SE3.from_matrix(m), MAX_DEPTH, tb=tb, cw=cw, ch=ch))
        kindname = "zpass" if zpass else "render"

    out = f(vol, poses[0])
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        out = f(vol, poses[i % len(poses)])
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"[splat_one] {kindname} ({cw},{ch}) tb={tb} {rw}x{rh}: {ms:.2f} ms",
          flush=True)

    if equal and not zpass and (rw, rh) == (W, H):
        fd = jax.jit(lambda v, m: splat_render_pallas(
            v, rcam, SE3.from_matrix(m), MAX_DEPTH, tb=8, cw=32, ch=16))
        ref = fd(vol, poses[0])
        jax.block_until_ready(jax.tree_util.tree_leaves(ref)[0])
        cand = f(vol, poses[0])
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(ref),
                            jax.tree_util.tree_leaves(cand))
        )
        print(f"[splat_one] bit-equal vs (32,16): {same}", flush=True)


if __name__ == "__main__":
    main()
