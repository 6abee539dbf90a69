"""Voxel export: full-volume and bounding-box gathers + the binary dump.

Rework of TSDFGrid::GatherValid / GatherVoxels / GatherBlock
(voxel_tsdf.cu:399-472) and the VoxelSpatialTSDF record
(voxel_types.cuh:48-57).  Compaction is cumsum + drop-scatter; the only
host transfer is the final (optional) device_get of the fixed-capacity
result, replacing the reference's per-call cudaMalloc + D2H + sync.

The on-disk dump layout is bit-compatible with the reference's
/tmp/data.bin consumer (TSDF2Mesh): little-endian float32 records of
(x, y, z, tsdf) in world metres (offline.cc:184-190).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import voxel as vx
from ..core.state import TSDFVolume
from .integrate import VisibleSet, compact_mask


class BoundingCube(NamedTuple):
    """Axis-aligned bounds in world metres (voxel_tsdf.cuh:12-27)."""

    xmin: float
    xmax: float
    ymin: float
    ymax: float
    zmin: float
    zmax: float


class SpatialTSDF(NamedTuple):
    """Fixed-capacity export: [max_visible * 512] records + live count."""

    position: jnp.ndarray  # f32 [N, 3] world metres
    tsdf: jnp.ndarray  # f32 [N]
    weight: jnp.ndarray  # f32 [N]
    prob: jnp.ndarray  # f32 [N]
    mask: jnp.ndarray  # bool [N]
    count: jnp.ndarray  # i32 [] valid records


def _download(vol: TSDFVolume, vis: VisibleSet) -> SpatialTSDF:
    """download_tsdf_kernel rework (voxel_tsdf.cu:34-46): expand visible
    blocks to per-voxel world positions + payloads."""
    cfg = vol.cfg
    bv = cfg.block_volume
    offs = vx.index_to_offset(jnp.arange(bv, dtype=jnp.int32), cfg)
    pos_grid = vx.block_to_point(vis.block_pos, cfg)[:, None, :] + offs[None, :, :]
    pos_world = pos_grid.astype(jnp.float32) * cfg.voxel_size

    # dense-backend pool indices are ascending after compaction (see
    # ops/integrate.py fuse_visible)
    dense = cfg.backend == "dense" and cfg.index_hints
    pool = jnp.clip(vis.pool_idx, 0, cfg.num_blocks - 1)
    tsdf = vol.tsdf.at[pool].get(indices_are_sorted=dense)
    weight = (vol.rgbw.at[pool].get(indices_are_sorted=dense) >> 24).astype(
        jnp.float32
    )
    prob = vol.prob.at[pool].get(indices_are_sorted=dense)
    mask = jnp.broadcast_to(vis.mask[:, None], tsdf.shape)
    return SpatialTSDF(
        position=pos_world.reshape(-1, 3),
        tsdf=tsdf.reshape(-1),
        weight=weight.reshape(-1),
        prob=prob.reshape(-1),
        mask=mask.reshape(-1),
        count=vis.count * bv,
    )


def gather_valid(vol: TSDFVolume) -> SpatialTSDF:
    """All live blocks (GatherValid, voxel_tsdf.cu:399-425)."""
    live = vol.entry_block >= 0
    vis = compact_mask(vol, live)
    return _download(vol, vis)


def gather_voxels(vol: TSDFVolume, volume: BoundingCube) -> SpatialTSDF:
    """Blocks fully inside a world-space bbox (GatherVoxels +
    check_bound_kernel, voxel_tsdf.cu:14-25, 427-454).

    Bounds are scaled to grid coords with the same truncating cast the
    reference uses (BoundingCube::Scale<short>)."""
    cfg = vol.cfg
    scale = 1.0 / cfg.voxel_size
    g = [int(v * scale) for v in volume]  # truncation toward zero, like (short)
    xmin, xmax, ymin, ymax, zmin, zmax = g
    bl = cfg.block_len

    first = vx.block_to_point(vol.entry_pos, cfg)  # [E, 3]
    inside = (
        (vol.entry_block >= 0)
        & (first[:, 0] >= xmin)
        & (first[:, 1] >= ymin)
        & (first[:, 2] >= zmin)
        & (first[:, 0] + bl - 1 <= xmax)
        & (first[:, 1] + bl - 1 <= ymax)
        & (first[:, 2] + bl - 1 <= zmax)
    )
    vis = compact_mask(vol, inside)
    return _download(vol, vis)


def to_numpy_records(st: SpatialTSDF) -> np.ndarray:
    """Compact to a [count, 4] float32 (x, y, z, tsdf) array on host."""
    n = int(st.count)
    mask = np.asarray(st.mask)
    pos = np.asarray(st.position)[mask][:n]
    tsdf = np.asarray(st.tsdf)[mask][:n]
    return np.concatenate([pos, tsdf[:, None]], axis=1).astype("<f4")


def dump_spatial_tsdf(st: SpatialTSDF, path: str) -> int:
    """Write the VoxelSpatialTSDF binary (offline.cc:184-190 format).

    Returns the number of records written."""
    rec = to_numpy_records(st)
    rec.tofile(path)
    return rec.shape[0]


def load_spatial_tsdf(path: str) -> np.ndarray:
    """Read a VoxelSpatialTSDF binary -> [N, 4] float32."""
    raw = np.fromfile(path, dtype="<f4")
    return raw.reshape(-1, 4)


def infer_voxel_size(records: np.ndarray) -> float:
    """Infer the voxel size from dump records: every block dumps all 512
    voxels, so adjacent positions one voxel apart always exist — the
    smallest positive unique-coordinate spacing per axis IS the voxel
    size (records carry no header; the reference's TSDF2Mesh consumer is
    told the size out of band)."""
    best = np.inf
    for a in range(3):
        u = np.unique(records[:, a].astype(np.float64))
        if u.size > 1:
            d = np.diff(u)
            best = min(best, float(d[d > 1e-9].min()))
    if not np.isfinite(best):
        raise ValueError("cannot infer voxel size from a single-voxel dump")
    return best


def volume_from_spatial_records(
    records: np.ndarray,
    voxel_size: float | None = None,
    truncation: float | None = None,
) -> TSDFVolume:
    """Rebuild a TSDFVolume from VoxelSpatialTSDF dump records so the
    binary artifact is consumable in-framework (mesh it, render it,
    query it) — the role the reference delegates to the external
    TSDF2Mesh tool (README.md:69, 91).

    The dump carries (position, tsdf) only; rebuilt voxels get weight 1
    (observed) and the default probability, exactly the information loss
    the reference's dump consumer lives with.  A gather_valid of the
    returned volume reproduces the input records (order aside)."""
    from ..config import TSDFConfig
    from . import hash as h

    rec = np.asarray(records, np.float32).reshape(-1, 4)
    if voxel_size is None:
        voxel_size = infer_voxel_size(rec)
    coords = np.rint(rec[:, :3].astype(np.float64) / voxel_size).astype(
        np.int32
    )
    blocks = coords >> 3
    offs = coords - (blocks << 3)
    vidx = offs[:, 0] + 8 * offs[:, 1] + 64 * offs[:, 2]
    ublocks, inv = np.unique(blocks, axis=0, return_inverse=True)
    nb = ublocks.shape[0]

    blog = max(6, int(np.ceil(np.log2(2 * nb))))
    cbits = int(np.abs(ublocks).max(initial=1)).bit_length() + 1
    cfg = TSDFConfig(
        voxel_size=float(voxel_size),
        truncation=float(truncation) if truncation else 6.0 * voxel_size,
        backend="hash",
        num_blocks_log2=blog,
        num_buckets_log2=blog + 2,
        coord_bits=max(10, cbits),
        max_candidates=1 << blog,
        max_new_per_round=1 << blog,
        max_visible=1 << blog,
    )
    vol = TSDFVolume.create(cfg)
    pad = (1 << blog) - nb
    cand = jnp.asarray(np.pad(ublocks, ((0, pad), (0, 0))))
    pending = jnp.asarray(np.arange(1 << blog) < nb)
    # claim rounds are fail-open (drops retry next frame in the live
    # engine, voxel_hash.cu:83-89); a one-shot rebuild retries here
    for _ in range(16):
        if not bool(np.asarray(pending).any()):
            break
        vol, pending = h.insert(vol, cand, pending)
    else:  # pragma: no cover
        raise RuntimeError("hash insert kept dropping blocks at 50% load")

    pool = np.asarray(h.lookup(vol, jnp.asarray(ublocks)))
    assert (pool >= 0).all(), "inserted block missing on lookup"
    tsdf = np.asarray(vol.tsdf).copy()
    rgbw = np.asarray(vol.rgbw).copy()
    rows = pool[inv]
    tsdf[rows, vidx] = rec[:, 3]
    rgbw[rows, vidx] |= np.uint32(1) << np.uint32(24)  # weight 1: observed
    return vol.replace(tsdf=jnp.asarray(tsdf), rgbw=jnp.asarray(rgbw))
