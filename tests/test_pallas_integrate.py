"""End-to-end equivalence: integrate with the Pallas patch sampler must
produce the identical volume as the XLA gather sampler (interpret mode
on CPU; the kernel itself is verified bit-exact on TPU)."""

import dataclasses
from unittest import mock

import numpy as np

from disinfect_slam_tpu.ops.pallas import fuse_kernel

from disinfect_slam_tpu.core.geometry import SE3, CameraIntrinsics, CameraParams
from disinfect_slam_tpu.core.state import TSDFVolume
from disinfect_slam_tpu.ops.integrate import integrate
from disinfect_slam_tpu.ops.pallas import sample_kernel

from .scenes import look_at, render_wall
from .test_integrate import CFG_DENSE, H, K, MAX_DEPTH, W, make_frame


def test_pallas_sampler_matches_gather():
    cfg_g = dataclasses.replace(CFG_DENSE, sampler="gather")
    cfg_p = dataclasses.replace(CFG_DENSE, sampler="pallas", max_visible=256)
    cfg_g = dataclasses.replace(cfg_g, max_visible=256)

    pose = look_at((0.033, -0.041, 0.017), (0.11, 0.07, 2.0131))
    depth = render_wall(W, H, K, pose, wall_z=2.0131)
    ht = np.full((H, W), 0.7, np.float32)
    lt = np.full((H, W), 0.4, np.float32)
    frame = make_frame(depth, ht=ht, lt=lt)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    se3 = SE3.from_matrix(pose)

    orig = sample_kernel.sample_patches

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    vol_g = TSDFVolume.create(cfg_g)
    vol_g = integrate(vol_g, frame, cam, se3, MAX_DEPTH)

    with mock.patch.object(sample_kernel, "sample_patches", side_effect=interp):
        vol_p = TSDFVolume.create(cfg_p)
        vol_p = integrate(vol_p, frame, cam, se3, MAX_DEPTH)

    assert int(vol_g.num_active_blocks) == int(vol_p.num_active_blocks)
    np.testing.assert_array_equal(np.asarray(vol_g.tsdf), np.asarray(vol_p.tsdf))
    np.testing.assert_array_equal(np.asarray(vol_g.weight), np.asarray(vol_p.weight))
    np.testing.assert_array_equal(np.asarray(vol_g.rgb), np.asarray(vol_p.rgb))
    np.testing.assert_allclose(
        np.asarray(vol_g.prob), np.asarray(vol_p.prob), atol=1e-6
    )


def test_fused_kernel_matches_gather():
    """The single-pass fused kernel (sampling + fusion math in Pallas)
    must match the gather reference (interpret mode on CPU)."""
    cfg_g = dataclasses.replace(CFG_DENSE, sampler="gather", max_visible=256)
    cfg_f = dataclasses.replace(CFG_DENSE, sampler="pallas_fused", max_visible=256)

    pose = look_at((0.033, -0.041, 0.017), (0.11, 0.07, 2.0131))
    depth = render_wall(W, H, K, pose, wall_z=2.0131)
    ht = np.full((H, W), 0.7, np.float32)
    lt = np.full((H, W), 0.4, np.float32)
    frame = make_frame(depth, ht=ht, lt=lt)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    se3 = SE3.from_matrix(pose)

    vol_g = TSDFVolume.create(cfg_g)
    vol_f = TSDFVolume.create(cfg_f)
    for _ in range(2):
        vol_g = integrate(vol_g, frame, cam, se3, MAX_DEPTH)
        vol_f = integrate(vol_f, frame, cam, se3, MAX_DEPTH)

    # equality up to 1 ulp: XLA fuses a*b+c into fma while the kernel
    # evaluates the written op order
    assert int(vol_g.num_active_blocks) == int(vol_f.num_active_blocks)
    np.testing.assert_allclose(
        np.asarray(vol_g.tsdf), np.asarray(vol_f.tsdf), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(vol_g.weight), np.asarray(vol_f.weight))
    rgb_diff = np.abs(np.asarray(vol_g.rgb) - np.asarray(vol_f.rgb))
    assert (rgb_diff <= 1.0).all() and (rgb_diff > 0).mean() < 1e-3
    np.testing.assert_allclose(
        np.asarray(vol_g.prob), np.asarray(vol_f.prob), atol=1e-5
    )


def test_fused_patch_dma_fallback_matches_gather():
    """Frames too large for the VMEM-resident image must route to the
    patch-DMA fuse_rows fallback and still match the gather reference.
    Forces the fallback by shrinking the VMEM threshold (test frames
    otherwise always fit)."""
    cfg_g = dataclasses.replace(CFG_DENSE, sampler="gather", max_visible=512)
    cfg_f = dataclasses.replace(
        CFG_DENSE, sampler="pallas_fused", max_visible=512
    )

    pose = look_at((0.033, -0.041, 0.017), (0.11, 0.07, 2.0131))
    depth = render_wall(W, H, K, pose, wall_z=2.0131)
    ht = np.full((H, W), 0.7, np.float32)
    lt = np.full((H, W), 0.4, np.float32)
    frame = make_frame(depth, ht=ht, lt=lt)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    se3 = SE3.from_matrix(pose)

    vol_g = TSDFVolume.create(cfg_g)
    vol_g = integrate(vol_g, frame, cam, se3, MAX_DEPTH)
    packed_calls = []
    orig_packed = fuse_kernel.fuse_rows_packed
    with mock.patch.object(fuse_kernel, "VMEM_IMG_BYTES", 0), \
         mock.patch.object(
             fuse_kernel, "fuse_rows_packed",
             side_effect=lambda *a, **k: packed_calls.append(1)
             or orig_packed(*a, **k),
         ):
        vol_f = TSDFVolume.create(cfg_f)
        vol_f = integrate(vol_f, frame, cam, se3, MAX_DEPTH)
    assert not packed_calls, "expected the patch-DMA fallback, not packed"

    assert int(vol_g.num_active_blocks) == int(vol_f.num_active_blocks)
    np.testing.assert_allclose(
        np.asarray(vol_g.tsdf), np.asarray(vol_f.tsdf), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(vol_g.weight), np.asarray(vol_f.weight)
    )
    rgb_diff = np.abs(np.asarray(vol_g.rgb) - np.asarray(vol_f.rgb))
    assert (rgb_diff <= 1.0).all()
    np.testing.assert_allclose(
        np.asarray(vol_g.prob), np.asarray(vol_f.prob), atol=1e-5
    )
