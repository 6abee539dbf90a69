#!/usr/bin/env python
"""Feature-probe this Mosaic/libtpu stack (jax 0.9.0) for primitives the
round-1 notes assumed missing: dynamic roll (lanes/sublanes),
take_along_axis in-kernel, f32 MXU dot, 2D reshapes, strided lane
slicing.  Each probe compiles a tiny kernel and checks numerics."""
import functools
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


def probe(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {msg}", flush=True)


def roll_lanes():
    def k(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], axis=1)

    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    s = jnp.array([37], jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((8, 256), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((8, 256), lambda i, *_: (0, 0)),
        ),
    )(s, x)
    return np.array_equal(np.asarray(out), np.roll(np.asarray(x), 37, axis=1))


def roll_sublanes():
    def k(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], axis=0)

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    s = jnp.array([5], jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((64, 128), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((64, 128), lambda i, *_: (0, 0)),
        ),
    )(s, x)
    return np.array_equal(np.asarray(out), np.roll(np.asarray(x), 5, axis=0))


def take_along_lanes():
    def k(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (256, 256)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 256, (256, 256)).astype(np.int32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    return np.array_equal(np.asarray(out), ref)


def f32_dot():
    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (256, 256)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (256, 256)).astype(np.float32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )(a, b)
    ref = np.asarray(a) @ np.asarray(b)
    return np.allclose(np.asarray(out), ref, atol=1e-3)


def reshape_2d_split():
    # (24, 256) -> (768, 8): minor-dim split into sublanes
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(768, 8)

    x = jnp.arange(24 * 256, dtype=jnp.float32).reshape(24, 256)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((768, 8), jnp.float32),
    )(x)
    return np.array_equal(np.asarray(out), np.asarray(x).reshape(768, 8))


def reshape_2d_merge():
    # (512, 16) -> (8192, 1)
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(8192, 1)

    x = jnp.arange(512 * 16, dtype=jnp.float32).reshape(512, 16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8192, 1), jnp.float32),
    )(x)
    return np.array_equal(np.asarray(out), np.asarray(x).reshape(8192, 1))


def strided_lane_slice():
    # every 8th lane: [8, 256] -> [8, 32]
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, ::8]

    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
    )(x)
    return np.array_equal(np.asarray(out), np.asarray(x)[:, ::8])


def cast_2d_3d():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(8, 32, 8).sum(axis=2)

    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
    )(x)
    return np.array_equal(
        np.asarray(out), np.asarray(x).reshape(8, 32, 8).sum(axis=2))


def main():
    probe("roll_lanes_dynamic", roll_lanes)
    probe("roll_sublanes_dynamic", roll_sublanes)
    probe("take_along_axis_lanes", take_along_lanes)
    probe("f32_mxu_dot", f32_dot)
    probe("reshape_(24,256)->(768,8)", reshape_2d_split)
    probe("reshape_(512,16)->(8192,1)", reshape_2d_merge)
    probe("strided_lane_slice", strided_lane_slice)
    probe("cast_2d_3d_reshape", cast_2d_3d)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
