#!/usr/bin/env python
"""H2D transfer decomposition through the axon relay (VERDICT r4 #1).

profile_online.py measured 20.84 ms/frame for the online path's three
device_put calls (u8 rgb 900 KB + u16 depth 600 KB + f32 pose 64 B) —
as large as the whole compute step.  This probe separates per-call
latency from bandwidth:

  1. 3 separate device_put calls (the current online staging)
  2. one device_put of the (rgb, depth, pose) tuple
  3. one device_put of a single packed u8 buffer (rgb bytes ++ depth
     bytes ++ pose bytes) unpacked on device
  4. tiny 64 B put (pure per-call latency)
  5. 8 MB put (pure bandwidth)

Run on an idle host (PROGRESS.md contention rule).
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

H, W = 480, 640
N = 20


def timed(label, fn, n=N):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    depth = rng.integers(0, 20000, (H, W), dtype=np.uint16)
    pose = np.eye(4, dtype=np.float32)

    print(f"platform={jax.devices()[0].platform}", flush=True)

    timed("3 separate puts (rgb u8 + depth u16 + pose)",
          lambda: jax.block_until_ready(
              (jax.device_put(rgb), jax.device_put(depth),
               jax.device_put(pose))))

    timed("1 tuple put ((rgb, depth, pose))",
          lambda: jax.block_until_ready(
              jax.device_put((rgb, depth, pose))))

    packed = np.concatenate(
        [rgb.reshape(-1), depth.view(np.uint8).reshape(-1),
         pose.view(np.uint8).reshape(-1)]
    )
    timed(f"1 packed u8 put ({packed.nbytes / 1e6:.2f} MB)",
          lambda: jax.block_until_ready(jax.device_put(packed)))

    tiny = np.zeros(64, np.uint8)
    timed("tiny 64 B put (per-call latency)",
          lambda: jax.block_until_ready(jax.device_put(tiny)))

    big = rng.integers(0, 255, (8 * 1024 * 1024,), dtype=np.uint8)
    ms = timed("8 MB put (bandwidth)",
               lambda: jax.block_until_ready(jax.device_put(big)))
    print(f"  -> {8.0 / (ms / 1e3) / 1024:.2f} GB/s", flush=True)

    # packed put + on-device unpack to the online step's input formats
    @jax.jit
    def unpack(buf):
        nrgb = H * W * 3
        ndep = H * W * 2
        rgb_d = buf[:nrgb].reshape(H, W, 3)
        dep_d = jax.lax.bitcast_convert_type(
            buf[nrgb:nrgb + ndep].reshape(H * W, 2), jnp.uint16
        ).reshape(H, W)
        pose_d = jax.lax.bitcast_convert_type(
            buf[nrgb + ndep:nrgb + ndep + 64].reshape(4, 4, 4), jnp.float32
        )
        return rgb_d, dep_d, pose_d

    def put_unpack():
        out = unpack(jax.device_put(packed))
        jax.block_until_ready(out)
        return out

    timed("packed put + device unpack", put_unpack)

    # overlap check: does a put overlap a running compute?  Dispatch a
    # long matmul chain, then put, then block on both.
    a = jax.device_put(np.ones((4096, 4096), np.float32))

    @jax.jit
    def burn(x):
        for _ in range(8):
            x = x @ x * 1e-3
        return x

    out = burn(a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = burn(a)
    jax.block_until_ready(out)
    burn_ms = (time.perf_counter() - t0) * 1e3
    print(f"burn alone: {burn_ms:.2f} ms", flush=True)

    t0 = time.perf_counter()
    out = burn(a)
    got = jax.device_put(packed)
    jax.block_until_ready((out, got))
    both_ms = (time.perf_counter() - t0) * 1e3
    print(f"burn + packed put overlapped: {both_ms:.2f} ms "
          f"(put hidden if ~= burn alone)", flush=True)


if __name__ == "__main__":
    main()
