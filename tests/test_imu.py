"""Gyro preintegration tests."""

import numpy as np
from scipy.spatial.transform import Rotation

from disinfect_slam_tpu.systems.imu import (
    GyroPreintegrator,
    seed_pose_with_gyro,
)


def test_constant_rate_rotation():
    pre = GyroPreintegrator()
    # 0.5 rad/s about y for 1 s at 400 Hz
    for i in range(401):
        pre.add_raw(i * 2.5, gyro=(0.0, 0.5, 0.0))
    r = pre.relative_rotation(0.0, 1000.0)
    # camera rotated +0.5 rad about y -> world seen from camera rotates -0.5
    ang = Rotation.from_matrix(r).as_rotvec()
    np.testing.assert_allclose(ang, [0.0, -0.5, 0.0], atol=5e-3)


def test_bias_estimation():
    pre = GyroPreintegrator()
    rng = np.random.default_rng(0)
    bias = np.array([0.01, -0.02, 0.005])
    for i in range(400):
        pre.add_raw(i * 2.5, gyro=bias + rng.normal(0, 1e-4, 3))
    pre.estimate_bias(window_ms=1000.0)
    np.testing.assert_allclose(pre.bias, bias, atol=1e-3)
    r = pre.relative_rotation(0.0, 997.5)
    assert Rotation.from_matrix(r).magnitude() < 1e-2


def test_seed_pose():
    pre = GyroPreintegrator()
    for i in range(201):
        pre.add_raw(i * 2.5, gyro=(0.0, 0.0, 0.4))
    prev = np.eye(4)
    seeded = seed_pose_with_gyro(prev, pre, 0.0, 500.0)
    ang = Rotation.from_matrix(seeded[:3, :3]).as_rotvec()
    np.testing.assert_allclose(ang, [0.0, 0.0, 0.2], atol=5e-3)


def test_mesh_ply_with_attributes(tmp_path):
    import os

    from disinfect_slam_tpu.ops.mesh import (
        compact_mesh,
        extract_mesh,
        merge_vertices,
        save_ply,
        vertex_attributes,
    )

    # build a tiny fused volume inline
    from .scenes import look_at, render_sphere
    from .test_integrate import CFG_DENSE, H, K, W, make_frame
    from .test_raycast import fuse_frames

    center, radius = (0.013, -0.021, 1.007), 0.613
    pose = look_at((0.0, 0.0, -1.5), center)
    depth = render_sphere(W, H, K, pose, center=center, radius=radius)
    ht = np.full((H, W), 0.9, np.float32)
    lt = np.full((H, W), 0.1, np.float32)
    vol, _ = fuse_frames([(make_frame(depth, ht=ht, lt=lt), pose)] * 3, cfg=CFG_DENSE)

    tris = compact_mesh(extract_mesh(vol, max_tris=1 << 16))
    verts, faces = merge_vertices(tris)
    rgb, prob = vertex_attributes(vol, verts)
    assert rgb.shape == (len(verts), 3)
    # fused ht=0.9 -> vertex probabilities high
    assert np.median(prob) > 0.7

    p = os.path.join(tmp_path, "m.ply")
    save_ply(p, verts, faces, rgb, prob)
    data = open(p, "rb").read()
    assert data.startswith(b"ply")
    assert b"ht_probability" in data[:400]
    assert len(data) > len(verts) * 19 + len(faces) * 13


def test_gravity_alignment_recovers_tilt():
    from disinfect_slam_tpu.systems.imu import ImuPreintegrator

    # camera tilted: rotate the world up vector into the camera frame
    # by a known attitude (roll 20 deg, pitch -35 deg)
    att = Rotation.from_euler("xy", [20.0, -35.0], degrees=True)
    up_cam = att.apply([0.0, 0.0, 1.0])
    pre = ImuPreintegrator()
    rng = np.random.default_rng(1)
    for i in range(200):
        pre.add_raw(i * 2.5, gyro=(0, 0, 0),
                    accel=9.80665 * up_cam + rng.normal(0, 0.02, 3))
    up = pre.estimate_gravity()
    np.testing.assert_allclose(up, up_cam, atol=2e-3)
    w_T_c = pre.gravity_aligned_pose()
    # the recovered world rotation must map the measured up to world +z
    np.testing.assert_allclose(
        w_T_c[:3, :3] @ up_cam, [0.0, 0.0, 1.0], atol=2e-3
    )
    # orthonormal, right-handed
    np.testing.assert_allclose(
        w_T_c[:3, :3] @ w_T_c[:3, :3].T, np.eye(3), atol=1e-9
    )
    assert np.linalg.det(w_T_c[:3, :3]) > 0.99


def test_gravity_alignment_fail_open():
    from disinfect_slam_tpu.systems.imu import ImuPreintegrator

    pre = ImuPreintegrator()
    # no samples -> identity
    np.testing.assert_array_equal(pre.gravity_aligned_pose(), np.eye(4))
    # implausible magnitude (free fall) -> identity
    for i in range(100):
        pre.add_raw(i * 2.5, gyro=(0, 0, 0), accel=(0.0, 0.0, 0.1))
    assert pre.estimate_gravity() is None
    np.testing.assert_array_equal(pre.gravity_aligned_pose(), np.eye(4))
    # antiparallel (camera exactly upside down) -> a 180-degree flip,
    # still orthonormal and mapping up to +z
    pre2 = ImuPreintegrator()
    for i in range(100):
        pre2.add_raw(i * 2.5, gyro=(0, 0, 0), accel=(0.0, 0.0, -9.80665))
    r = pre2.gravity_aligned_pose()[:3, :3]
    np.testing.assert_allclose(r @ [0, 0, -1.0], [0, 0, 1.0], atol=1e-9)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
