"""Surface mesh extraction from the TSDF volume.

The reference delegates meshing to external tools: KrisLibrary's
SparseTSDFReconstruction::ExtractMesh in the ROS path
(examples/ros_camera_driver/ros_offline.cc:279-287) and the offline
TSDF2Mesh consumer of the /tmp/data.bin dump (README.md:69, 91).  This
module makes the framework self-contained with a *marching tetrahedra*
extractor — chosen over classic marching cubes because its case tables
are derivable from first principles (6 tetrahedra per cell, 16 sign
cases each, no large lookup tables) and the whole extraction vectorizes
into plain gathers/selects that XLA maps well onto the VPU.

Vertices land on zero-crossings by linear interpolation, matching the
sub-voxel surface placement the raycaster's bisection refinement finds.
Output is a fixed-capacity triangle soup + count (jit-friendly); use
`compact_mesh` on host for the trimmed arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import voxel as vx
from ..core.state import TSDFVolume
from . import hash as h
from .integrate import compact_mask

# The 6 tetrahedra of a unit cell, as corner indices into the cube's 8
# corners (corner c = (x, y, z) bits = (c&1, (c>>1)&1, (c>>2)&1)).
# This decomposition shares the main diagonal 0-7 so faces are consistent
# across neighboring tetrahedra.
_TETS = np.array(
    [
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
    ],
    np.int32,
)

_CORNER_OFFSETS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.int32
)

# Tetrahedron edge list: the 6 edges as (corner_a, corner_b) local
# indices 0..3 within a tet.
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)


def _build_tet_tables():
    """Derive the 16-case marching-tetrahedra triangle table.

    Case bit i set <=> corner i is inside (tsdf < 0).  Each case yields
    0, 1, or 2 triangles, each triangle as 3 edge indices into _TET_EDGES
    (-1 padding).  Orientation: triangles wind so normals point toward
    the positive (outside) region, consistent with tsdf > 0 = outside.
    """
    # edge index lookup by corner pair
    eidx = {}
    for k, (a, b) in enumerate(_TET_EDGES):
        eidx[(a, b)] = k
        eidx[(b, a)] = k

    table = -np.ones((16, 2, 3), np.int32)
    for case in range(1, 15):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        if len(inside) == 1:
            (a,) = inside
            b, c, d = outside
            # one triangle on edges a-b, a-c, a-d
            table[case, 0] = [eidx[(a, b)], eidx[(a, c)], eidx[(a, d)]]
        elif len(inside) == 3:
            (a,) = outside
            b, c, d = inside
            table[case, 0] = [eidx[(a, b)], eidx[(a, d)], eidx[(a, c)]]
        elif len(inside) == 2:
            a, b = inside
            c, d = outside
            # quad on edges (a,c), (a,d), (b,d), (b,c) -> two triangles
            q = [eidx[(a, c)], eidx[(a, d)], eidx[(b, d)], eidx[(b, c)]]
            table[case, 0] = [q[0], q[1], q[2]]
            table[case, 1] = [q[0], q[2], q[3]]
    return table


_TET_TABLE = _build_tet_tables()
_NUM_TRIS = np.array(
    [np.sum(_TET_TABLE[c, :, 0] >= 0) for c in range(16)], np.int32
)


class Mesh(NamedTuple):
    vertices: jnp.ndarray  # f32 [max_tris, 3, 3] world metres
    valid: jnp.ndarray  # bool [max_tris]
    count: jnp.ndarray  # i32 []


def extract_mesh(vol: TSDFVolume, max_tris: int = 1 << 18) -> Mesh:
    """Triangle soup of the zero isosurface over all live blocks.

    Cells with any unobserved corner (weight == 0 or unallocated) are
    skipped so the initial-value tsdf never fabricates surface.

    NOTE: this single-shot variant materializes buffers proportional to
    cfg.max_visible x 512 x 12 triangles; for big volumes prefer
    extract_mesh_chunked (bounded memory, loops on host).
    """
    cfg = vol.cfg
    live = vol.entry_block >= 0
    vis = compact_mask(vol, live)
    return _extract_from_blocks(
        vol, vis.block_pos, vis.pool_idx, vis.mask, max_tris
    )


def extract_mesh_chunked(
    vol: TSDFVolume,
    max_tris_per_chunk: int = 1 << 16,
    chunk: int = 1024,
):
    """Memory-bounded extraction: iterates the live blocks in fixed-size
    chunks (one compiled program reused across chunks) and concatenates
    compacted host triangles.  Returns [N, 3, 3] float32."""
    import jax

    live = np.asarray(vol.entry_block) >= 0
    block_pos = np.asarray(vol.entry_pos)[live]
    pool_idx = np.asarray(vol.entry_block)[live]
    n = len(pool_idx)
    if n == 0:
        return np.zeros((0, 3, 3), np.float32)

    fn = jax.jit(
        lambda v, bp, pi, m: _extract_from_blocks(v, bp, pi, m, max_tris_per_chunk)
    )
    outs = []
    for s0 in range(0, n, chunk):
        bp = np.zeros((chunk, 3), np.int32)
        pi = np.full((chunk,), vol.cfg.num_blocks, np.int32)
        m = np.zeros((chunk,), bool)
        sel = slice(s0, min(s0 + chunk, n))
        k = sel.stop - sel.start
        bp[:k] = block_pos[sel]
        pi[:k] = pool_idx[sel]
        m[:k] = True
        mesh = fn(vol, jnp.asarray(bp), jnp.asarray(pi), jnp.asarray(m))
        outs.append(compact_mesh(mesh))
    return np.concatenate(outs, axis=0)


def _extract_from_blocks(
    vol: TSDFVolume,
    block_pos: jnp.ndarray,  # [V, 3]
    pool_idx: jnp.ndarray,  # [V]
    mask: jnp.ndarray,  # [V]
    max_tris: int,
) -> Mesh:
    cfg = vol.cfg
    vcap = block_pos.shape[0]
    bl = cfg.block_len

    # sample a (bl+1)^3 field per block (corners reach into +1 neighbors)
    grid = jnp.arange(bl + 1, dtype=jnp.int32)
    gx, gy, gz = jnp.meshgrid(grid, grid, grid, indexing="ij")
    local = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [(bl+1)^3, 3]
    base = vx.block_to_point(block_pos, cfg)  # [V, 3]
    pts = base[:, None, :] + local[None, :, :]  # [V, P, 3]
    n_pts = (bl + 1) ** 3
    flat = pts.reshape(-1, 3)
    tsdf, _, weight, _ = h.read_voxels(vol, flat)
    # observed = carries fused data: weight > 0 OR tsdf moved off the
    # reset/default value (far-depth fusion rounds weight to 0 while
    # still writing tsdf, voxel_tsdf.cu:182,192)
    observed = ((weight > 0) | (jnp.abs(tsdf) < 0.999)).reshape(vcap, n_pts)
    tsdf = tsdf.reshape(vcap, n_pts)

    # cell corner indices within the sampled field
    s = bl + 1
    cell = jnp.arange(bl, dtype=jnp.int32)
    cx, cy, cz = jnp.meshgrid(cell, cell, cell, indexing="ij")
    cflat = jnp.stack([cx, cy, cz], -1).reshape(-1, 3)  # [bl^3, 3]
    corner_off = jnp.asarray(_CORNER_OFFSETS)  # [8, 3]
    cc = cflat[:, None, :] + corner_off[None, :, :]  # [bl^3, 8, 3]
    cidx = cc[..., 0] * s * s + cc[..., 1] * s + cc[..., 2]  # [bl^3, 8]

    f = tsdf[:, cidx]  # [V, bl^3, 8]
    ok = jnp.all(observed[:, cidx], axis=-1) & mask[:, None]  # [V, bl^3]

    # world positions of cell corners
    cpos = (cflat[None, :, None, :] + corner_off[None, None, :, :] + base[:, None, None, :])
    cpos = cpos.astype(jnp.float32) * cfg.voxel_size  # [V, bl^3, 8, 3]

    tets = jnp.asarray(_TETS)  # [6, 4]
    vcount = vcap * (bl ** 3)
    fv = f.reshape(vcount, 8)
    pv = cpos.reshape(vcount, 8, 3)
    okv = ok.reshape(vcount)

    tri_vs = []
    tri_valid = []
    for t in range(6):
        corners = tets[t]  # [4]
        ft = fv[:, corners]  # [N, 4]
        pt = pv[:, corners]  # [N, 4, 3]
        case = (
            (ft[:, 0] < 0).astype(jnp.int32)
            | ((ft[:, 1] < 0).astype(jnp.int32) << 1)
            | ((ft[:, 2] < 0).astype(jnp.int32) << 2)
            | ((ft[:, 3] < 0).astype(jnp.int32) << 3)
        )
        # interpolated vertex on each of the 6 tet edges
        ea = jnp.asarray(_TET_EDGES[:, 0])
        eb = jnp.asarray(_TET_EDGES[:, 1])
        fa = ft[:, ea]  # [N, 6]
        fb = ft[:, eb]
        denom = fa - fb
        alpha = jnp.where(jnp.abs(denom) > 1e-12, fa / jnp.where(denom == 0, 1.0, denom), 0.5)
        alpha = jnp.clip(alpha, 0.0, 1.0)
        everts = pt[:, ea] + alpha[..., None] * (pt[:, eb] - pt[:, ea])  # [N, 6, 3]

        # outward direction: from the centroid of inside (tsdf < 0)
        # corners toward the centroid of outside corners; used to orient
        # each emitted triangle (the 6 cube tets have mixed parity, so
        # windings are fixed geometrically rather than via the table)
        neg = (ft < 0).astype(jnp.float32)  # [N, 4]
        pos = 1.0 - neg
        n_neg = jnp.maximum(neg.sum(-1, keepdims=True), 1.0)
        n_pos = jnp.maximum(pos.sum(-1, keepdims=True), 1.0)
        cent_neg = jnp.sum(pt * neg[..., None], axis=1) / n_neg
        cent_pos = jnp.sum(pt * pos[..., None], axis=1) / n_pos
        outward = cent_pos - cent_neg  # [N, 3]

        table = jnp.asarray(_TET_TABLE)  # [16, 2, 3]
        tris = table[case]  # [N, 2, 3] edge ids or -1
        for k in range(2):
            tk = tris[:, k]  # [N, 3]
            valid = okv & (tk[:, 0] >= 0)
            tk_safe = jnp.clip(tk, 0, 5)
            v3 = jnp.take_along_axis(
                everts, tk_safe[:, :, None].astype(jnp.int32), axis=1
            )  # [N, 3, 3]
            nrm = jnp.cross(v3[:, 1] - v3[:, 0], v3[:, 2] - v3[:, 0])
            flip = jnp.sum(nrm * outward, axis=-1) < 0
            v3 = jnp.where(flip[:, None, None], v3[:, [0, 2, 1]], v3)
            tri_vs.append(v3)
            tri_valid.append(valid)

    all_tris = jnp.concatenate(tri_vs, axis=0)  # [12*N, 3, 3]
    all_valid = jnp.concatenate(tri_valid, axis=0)

    # compact into the fixed-capacity output
    rank = jnp.cumsum(all_valid.astype(jnp.int32)) - 1
    slot = jnp.where(all_valid & (rank < max_tris), rank, max_tris)
    out = jnp.zeros((max_tris, 3, 3), jnp.float32).at[slot].set(all_tris, mode="drop")
    count = jnp.minimum(jnp.sum(all_valid.astype(jnp.int32)), max_tris)
    valid = jnp.arange(max_tris) < count
    return Mesh(vertices=out, valid=valid, count=count)


def compact_mesh(mesh: Mesh) -> np.ndarray:
    """Host-side: [count, 3, 3] float32 triangle array."""
    n = int(mesh.count)
    return np.asarray(mesh.vertices)[:n]


def merge_vertices(tris: np.ndarray, tol: float = 1e-5):
    """Triangle soup -> indexed mesh (vertices, faces) by welding
    coincident vertices (the MergeVertices(mesh, eps) step of
    ros_interface.cpp:103)."""
    flat = tris.reshape(-1, 3)
    key = np.round(flat / tol).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    verts = np.zeros((len(uniq), 3), np.float64)
    counts = np.zeros(len(uniq), np.int64)
    np.add.at(verts, inv, flat)
    np.add.at(counts, inv, 1)
    verts /= np.maximum(counts[:, None], 1)
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[good]


def vertex_attributes(vol: TSDFVolume, verts: np.ndarray):
    """Sample (rgb u8 [N, 3], ht probability f32 [N]) at mesh vertices."""
    pts = jnp.asarray(
        np.round(verts / vol.cfg.voxel_size).astype(np.int32)
    )
    _, rgb, _, prob = h.read_voxels(vol, pts)
    return (
        np.clip(np.asarray(rgb), 0, 255).astype(np.uint8),
        np.asarray(prob, np.float32),
    )


def save_ply(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    rgb: np.ndarray | None = None,
    prob: np.ndarray | None = None,
) -> None:
    """Write a PLY mesh, optionally with per-vertex color and the
    high-touch probability as a custom scalar — the semantic mesh output
    the reference's geometry-only pipeline cannot produce."""
    has_color = rgb is not None
    has_prob = prob is not None
    with open(path, "wb") as fp:
        head = ["ply", "format binary_little_endian 1.0",
                f"element vertex {len(verts)}",
                "property float x", "property float y", "property float z"]
        if has_color:
            head += ["property uchar red", "property uchar green",
                     "property uchar blue"]
        if has_prob:
            head += ["property float ht_probability"]
        head += [f"element face {len(faces)}",
                 "property list uchar int vertex_indices", "end_header"]
        fp.write(("\n".join(head) + "\n").encode())
        for i in range(len(verts)):
            fp.write(np.asarray(verts[i], "<f4").tobytes())
            if has_color:
                fp.write(np.asarray(rgb[i], np.uint8).tobytes())
            if has_prob:
                fp.write(np.asarray(prob[i], "<f4").tobytes())
        for f in faces:
            fp.write(np.uint8(3).tobytes())
            fp.write(np.asarray(f, "<i4").tobytes())


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Write a Wavefront OBJ (the portable stand-in for the reference's
    shape_msgs/Mesh publication)."""
    with open(path, "w") as fp:
        for v in verts:
            fp.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces + 1:
            fp.write(f"f {f[0]} {f[1]} {f[2]}\n")
