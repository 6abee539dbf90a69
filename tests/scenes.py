"""Synthetic RGB-D scenes for golden tests and benchmarks."""

from __future__ import annotations

import numpy as np


def look_at(eye, target, up=(0, -1, 0)):
    """cam_T_world for a camera at `eye` looking at `target` (+z forward)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(np.asarray(up, np.float64), fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    world_T_cam = np.eye(4)
    world_T_cam[:3, 0] = right
    world_T_cam[:3, 1] = down
    world_T_cam[:3, 2] = fwd
    world_T_cam[:3, 3] = eye
    return np.linalg.inv(world_T_cam)


def render_wall(w, h, K, cam_T_world, wall_z=2.0):
    """Depth (z-depth) of an infinite wall at world z = wall_z, camera
    assumed looking roughly +z in world. Returns depth [h, w] f32."""
    fx, fy, cx, cy = K
    world_T_cam = np.linalg.inv(cam_T_world)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    dirs_cam = np.stack([(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu, np.float64)], -1)
    r = world_T_cam[:3, :3]
    o = world_T_cam[:3, 3]
    dirs_w = dirs_cam @ r.T
    # o_z + t * d_z = wall_z  -> depth along camera z is t (since dirs_cam z=1)
    dz = dirs_w[..., 2]
    t = np.where(np.abs(dz) > 1e-9, (wall_z - o[2]) / dz, 0.0)
    return np.where(t > 0, t, 0.0).astype(np.float32)


def render_sphere(w, h, K, cam_T_world, center, radius):
    """Depth of a sphere; 0 where the ray misses."""
    fx, fy, cx, cy = K
    world_T_cam = np.linalg.inv(cam_T_world)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    dirs_cam = np.stack(
        [(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu, np.float64)], -1
    )
    norm = np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    r = world_T_cam[:3, :3]
    o = world_T_cam[:3, 3]
    d = (dirs_cam / norm) @ r.T
    oc = o - np.asarray(center, np.float64)
    b = 2 * (d @ oc)
    c = oc @ oc - radius * radius
    disc = b * b - 4 * c
    t = np.where(disc >= 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
    # convert range back to z-depth: depth = t / |dirs_cam| * 1 (z comp)
    depth = t / norm[..., 0]
    return np.where((disc >= 0) & (t > 0), depth, 0.0).astype(np.float32)


def checker_rgb(w, h, size=8):
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    c = ((uu // size + vv // size) % 2).astype(np.float32)
    rgb = np.stack([c * 200 + 30, (1 - c) * 180 + 40, c * 90 + 80], -1)
    return rgb.astype(np.float32)
