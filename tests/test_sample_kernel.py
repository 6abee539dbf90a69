"""Pallas patch-sampling kernel tests (interpret mode on CPU; the same
kernel is verified bit-exact on TPU hardware)."""

import jax.numpy as jnp
import numpy as np

from disinfect_slam_tpu.ops.pallas.sample_kernel import sample_patches


def make_case(seed=0, V=16, H=64, W=128, C=8):
    # footprints <= 16x16: the 24x32 default patch covers any such
    # footprint even after the kernel aligns origins down (u0%16, v0%8)
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (H, W, C)).astype(np.float32)
    u0 = rng.integers(0, W - 32, V).astype(np.int32)
    v0 = rng.integers(0, H - 24, V).astype(np.int32)
    u = (u0[:, None] + rng.integers(0, 16, (V, 512))).astype(np.int32)
    v = (v0[:, None] + rng.integers(0, 16, (V, 512))).astype(np.int32)
    return img, u0, v0, u, v


def run(img, u0, v0, u, v, **kw):
    return sample_patches(
        jnp.asarray(img), jnp.asarray(u0), jnp.asarray(v0),
        jnp.asarray(u), jnp.asarray(v), interpret=True, **kw
    )


def test_exact_selection():
    img, u0, v0, u, v = make_case()
    s, valid = run(img, u0, v0, u, v)
    ref = img[v, u]
    val = np.asarray(valid)
    assert val.mean() > 0.99
    np.testing.assert_array_equal(np.asarray(s)[val], ref[val])


def test_out_of_patch_flagged():
    img, u0, v0, u, v = make_case()
    # push some voxels far outside their block's patch
    u = u.copy()
    u[0, :32] = (u0[0] + 300) % img.shape[1]
    s, valid = run(img, u0, v0, u, v)
    val = np.asarray(valid)
    assert not val[0, :32].any()
    # flagged samples are zeroed, not garbage
    assert np.asarray(s)[0, :32].sum() == 0


def test_origin_alignment_preserves_coverage():
    """Unaligned origins must still cover a 16x16 footprint after the
    kernel aligns them down (u0%16, v0%8)."""
    img, u0, v0, u, v = make_case(seed=3)
    u0 = u0 + 13  # deliberately unaligned
    v0 = v0 + 5
    u0 = np.clip(u0, 0, img.shape[1] - 32)
    v0 = np.clip(v0, 0, img.shape[0] - 24)
    u = np.clip(u0[:, None] + np.random.default_rng(4).integers(0, 16, u.shape), 0, img.shape[1] - 1).astype(np.int32)
    v = np.clip(v0[:, None] + np.random.default_rng(5).integers(0, 16, v.shape), 0, img.shape[0] - 1).astype(np.int32)
    s, valid = run(img, u0.astype(np.int32), v0.astype(np.int32), u, v)
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(s), img[v, u])
