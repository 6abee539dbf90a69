"""cfg.alloc_every semantics: fusion every frame, allocation every N-th.

On a static view the skipped allocation pass is a provable no-op, so
alloc_every=2 must reproduce the every-frame volume exactly; on a moving
camera the divergence is bounded to the newly-revealed fringe (the same
fail-open class as the reference's lock-miss drop, voxel_hash.cu:83-89).
"""

import dataclasses

import numpy as np
import pytest

from disinfect_slam_tpu.systems.tsdf_grid import TSDFGrid

from .scenes import checker_rgb, look_at, render_sphere, render_wall
from .test_integrate import CFG_DENSE_FILTER, H, K, MAX_DEPTH, W


def _scene(pose):
    d1 = render_sphere(W, H, K, pose, center=(0.1, 0.0, 1.5), radius=0.45)
    d2 = render_wall(W, H, K, pose, wall_z=2.4131)
    return np.where(d1 > 0, d1, d2).astype(np.float32)


def _run(alloc_every, poses):
    cfg = dataclasses.replace(CFG_DENSE_FILTER, alloc_every=alloc_every)
    grid = TSDFGrid(cfg.voxel_size, cfg.truncation, cfg=cfg)
    rgb = checker_rgb(W, H)
    for pose in poses:
        grid.integrate(rgb, _scene(pose), None, None, MAX_DEPTH, K,
                       np.asarray(pose, np.float32))
    return grid.volume


def _active_records(vol):
    """Sorted (x, y, z, tsdf, weight, prob) rows of LIVE voxels only —
    free pool blocks keep stale payloads until re-acquired (reference
    parity: release doesn't clear, voxel_mem_test.cu release semantics),
    so whole-pool comparison would see carve-churn garbage."""
    from disinfect_slam_tpu.ops.gather import gather_valid

    st = gather_valid(vol)
    n = int(st.count)
    m = np.asarray(st.mask)
    rows = np.concatenate(
        [
            np.asarray(st.position)[m][:n],
            np.asarray(st.tsdf)[m][:n, None],
            np.asarray(st.weight)[m][:n, None],
            np.asarray(st.prob)[m][:n, None],
        ],
        axis=1,
    )
    return rows[np.lexsort(rows[:, :3].T[::-1])]


@pytest.mark.parametrize("every", [2, 3])
def test_static_view_exact(every):
    pose = look_at((0.02, -0.03, -1.48), (0.1, 0.0, 1.5))
    poses = [pose] * 4
    v1 = _run(1, poses)
    v2 = _run(every, poses)
    assert int(v1.num_active_blocks) == int(v2.num_active_blocks)
    r1, r2 = _active_records(v1), _active_records(v2)
    # identical voxel SET; values to ~1 ulp (the allocate and no-allocate
    # programs are separate XLA compilations whose fusion math may
    # reassociate fma differently)
    np.testing.assert_array_equal(r1[:, :3], r2[:, :3])
    np.testing.assert_allclose(r1, r2, atol=1e-6)


@pytest.mark.parametrize("every", [2, 3])
def test_moving_view_bounded_divergence(every):
    # every=3 is the shipped bench default (scripts/ab_alloc_every.py
    # sweep: same measured divergence class as every=2)
    poses = [
        look_at((np.sin(a) * 1.5, 0.01, -1.5 * np.cos(a) + 0.1), (0.1, 0.0, 1.5))
        for a in np.linspace(0, 0.25, 6)
    ]
    v1 = _run(1, poses)
    v2 = _run(every, poses)
    a1 = int(v1.num_active_blocks)
    a2 = int(v2.num_active_blocks)
    # the fringe first seen on skipped frames defers by one frame; the
    # final active set stays within a few percent and never exceeds the
    # exact run's
    assert a2 <= a1
    assert a1 - a2 <= max(8, int(0.05 * a1)), (a1, a2)
    t1 = float(np.abs(np.asarray(v1.tsdf)).sum())
    t2 = float(np.abs(np.asarray(v2.tsdf)).sum())
    assert abs(t1 - t2) / t1 < 0.05, (t1, t2)
