"""Pallas splat z-buffer kernel vs the XLA scatter path (interpret mode).

Both derive from the same projection (_project_for_splat), so depth and
hit must match bit-for-bit whenever the overflow fallback cap suffices.
"""

import numpy as np
import pytest

from disinfect_slam_tpu.core.geometry import SE3, CameraIntrinsics, CameraParams
from disinfect_slam_tpu.ops.pallas.splat_kernel import splat_depth_pallas
from disinfect_slam_tpu.ops.render_fast import splat_render

from .scenes import look_at, render_sphere, render_wall
from .test_integrate import CFG_DENSE, H, K, MAX_DEPTH, W, make_frame
from .test_raycast import fuse_frames


def _fused_scene(eye=(0.21, -0.33, -0.27)):
    pose_np = look_at(eye, (0.05, 0.08, 1.4))
    depth = render_sphere(W, H, K, pose_np, center=(0.05, 0.08, 1.4), radius=0.37)
    depth = np.where(depth > 0, depth, render_wall(W, H, K, pose_np, wall_z=2.6))
    vol, cam = fuse_frames([(make_frame(depth.astype(np.float32)), pose_np)] * 2,
                           cfg=CFG_DENSE)
    return vol, cam, pose_np


@pytest.mark.parametrize("eye", [(0.21, -0.33, -0.27), (0.05, 0.1, 0.55)],
                         ids=["normal", "close"])
def test_pallas_splat_matches_xla(eye):
    """`close` puts the camera ~0.5 m from the sphere so some block
    footprints overflow the patch window and exercise the fallback."""
    vol, cam, pose_np = _fused_scene(eye)
    pose = SE3.from_matrix(pose_np)

    ref = splat_render(vol, cam, pose, MAX_DEPTH)
    depth, hit = splat_depth_pallas(vol, cam, pose, MAX_DEPTH, interpret=True)

    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(depth), np.asarray(ref.depth))
    assert np.asarray(hit).mean() > 0.05


def test_pallas_splat_empty_volume():
    from disinfect_slam_tpu.core.state import TSDFVolume

    vol = TSDFVolume.create(CFG_DENSE)
    cam = CameraParams.create(CameraIntrinsics.create(*K), H, W)
    depth, hit = splat_depth_pallas(vol, cam, SE3.identity(), MAX_DEPTH,
                                    interpret=True)
    assert not bool(np.asarray(hit).any())
    assert float(np.asarray(depth).sum()) == 0.0


@pytest.mark.parametrize("eye", [(0.21, -0.33, -0.27), (0.05, 0.1, 0.55)],
                         ids=["normal", "close"])
def test_pallas_full_render_matches_xla(eye):
    """rgba/normal/depth/hit must all equal the XLA splat bit-for-bit
    (shared projection + packing + winner rule + image assembly)."""
    from disinfect_slam_tpu.ops.pallas.splat_kernel import splat_render_pallas

    vol, cam, pose_np = _fused_scene(eye)
    pose = SE3.from_matrix(pose_np)
    ref = splat_render(vol, cam, pose, MAX_DEPTH)
    res = splat_render_pallas(vol, cam, pose, MAX_DEPTH, interpret=True)
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(res.depth), np.asarray(ref.depth))
    np.testing.assert_array_equal(np.asarray(res.rgba), np.asarray(ref.rgba))
    # normal shading runs in two different jitted programs; XLA's fma
    # fusion can differ by 1 ulp, which may flip the u8 quantization of
    # the diffuse shade by +/-2 (buffers themselves are bit-identical)
    nd = np.abs(np.asarray(res.normal).astype(int) - np.asarray(ref.normal).astype(int))
    assert nd.max() <= 2, nd.max()


def test_surf_cap_filter_is_lossless_when_cap_holds():
    """The surface-band prefilter must not change the rendered images
    while the cap covers every surface block (min/max merges are
    order-independent)."""
    vol, cam, pose_np = _fused_scene()
    import jax.numpy as jnp

    pose = SE3.from_matrix(jnp.asarray(pose_np))
    a = splat_render(vol, cam, pose, MAX_DEPTH, surf_cap=None)
    b = splat_render(vol, cam, pose, MAX_DEPTH)  # default cap
    np.testing.assert_array_equal(np.asarray(a.rgba), np.asarray(b.rgba))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))


@pytest.mark.parametrize("eye", [(0.21, -0.33, -0.27), (0.05, 0.1, 0.55)],
                         ids=["normal", "close"])
def test_pallas_splat_narrow_patch_matches_xla(eye):
    """The narrow (cw=16, ch=16) compact mode — half the per-block
    column loop — must still match the XLA path bit-for-bit: blocks
    whose footprint exceeds the smaller patch route through the overflow
    scatter instead."""
    from disinfect_slam_tpu.ops.pallas.splat_kernel import splat_render_pallas

    vol, cam, pose_np = _fused_scene(eye)
    pose = SE3.from_matrix(pose_np)

    ref = splat_render(vol, cam, pose, MAX_DEPTH)
    depth, hit = splat_depth_pallas(
        vol, cam, pose, MAX_DEPTH, interpret=True, cw=16, ch=16
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(depth), np.asarray(ref.depth))

    res = splat_render_pallas(
        vol, cam, pose, MAX_DEPTH, interpret=True, cw=16, ch=16
    )
    np.testing.assert_array_equal(np.asarray(res.rgba), np.asarray(ref.rgba))
    np.testing.assert_array_equal(np.asarray(res.depth), np.asarray(ref.depth))
