"""Pallas TPU kernel: per-block image patch sampling for TSDF fusion.

The fusion stage needs, for every voxel of every visible block, the
stacked frame channels at its projected pixel — ~16.7M random image
samples per frame at 640x480/4mm.  XLA lowers that to an elementwise
gather, which on TPU is descriptor-bound (~140M samples/s -> ~120 ms).

This kernel exploits the structure TPUs love: the 512 voxels of one
block project into a small contiguous image patch.  Per visible block:

  1. DMA the block's (PH, PW, C) patch from the HBM image into VMEM
     (bulk copy: ~40 KB, amortized over 512 samples);
  2. select each voxel's pixel in-register instead of gathering, with
     voxels riding the LANE dimension end-to-end:
       A_T  = dot_general(patch [PH, PW*C], onehot_T [PH, 512],
                          contract dim0 x dim0)        -> [PW*C, 512]
       samp = sublane fold-tree(A_T * colmask_T)       -> [C, 512]
     The row select runs as three bf16 matmuls over a hi/mid/lo split
     of the patch (the f32 MXU path miscompiles on this stack; each
     output element receives exactly one product term per matmul so the
     sum reconstructs f32 exactly).  The column select zeroes all rows
     except the voxel's C-wide pixel group and halves the sublane count
     log2(PW) times — each output is a sum with exactly one nonzero f32
     term (exact).

     Layout is the whole ballgame here: the output refs are [TB, 512]
     with voxels on lanes, so any formulation that computes with voxels
     on sublanes pays a [512] sublane->lane relayout per channel write —
     measured 264 ms/frame at 32k blocks, swamping matmuls and DMA
     combined.  The transposed form writes each channel as a
     single-sublane row and runs at 55 ms for the same work.

Out-of-patch voxels (blocks whose screen footprint exceeds the static
patch, i.e. very close to the camera) are flagged invalid and must be
handled by the caller (they skip fusion for the frame).

Layout notes: voxels ride the sublane dim (512 = 4 x 128-row f32 tiles),
patch pixels the lane dim; PH/PW*C are padded to tile boundaries by
Mosaic automatically.  Kernel outputs are one [V, 512] array per channel
— a [V, 512, C] output would get its minor dim lane-padded C -> 128 in
the pallas boundary layout (an 8 GB allocation at full scale; this is
what OOM'd the round-2 sweep).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# patch extent in pixels; a block (8 voxels across, diagonal ~14 voxels)
# fits while fx * 8 * voxel_size * sqrt(3) / z <= PH, i.e. z >= ~0.7 m at
# 4 mm voxels with fx=525.  Origins are tile-aligned (v0 % 8 == 0,
# u0 % 16 == 0 so u0*C lands on a 128-lane boundary), so the patch
# covers footprints up to PH-8 x PW-16 past the aligned origin.  Sized
# from measured screen footprints at the bench workload (p90 9x9 px,
# max 12x12): 24x32 fits everything with alignment slack to spare and
# halves both stage-1 matmul work and patch DMA vs the former 32x48.
DEFAULT_PH = 24
DEFAULT_PW = 32

# dot_general dimension numbers contracting lhs dim0 with rhs dim0 — the
# MXU-native lhsT form; keeps voxels on lanes through the selection
_NT_DNUMS = (((0,), (0,)), ((), ()))

# Whole-image-in-VMEM threshold: when the stacked frame fits on chip
# (640x480x8 f32 = 9.8 MB of the ~16 MB VMEM), per-block patches are
# direct dynamic slices of the resident image — no per-block DMA
# starts/waits/semaphores at all.  Measured on v5e at bench scale the
# selection drops from ~30 ms (strided patch DMAs, issue-bound) to
# ~7 ms.  Larger frames (the reference supports up to 1920x1080) fall
# back to the patch-DMA path automatically.
VMEM_IMG_BYTES = 10 * 1024 * 1024


def _onehot_select(p_full, lv_c, lu_c, rowsel_i, pcol_i, splits, pw, c):
    """Per-block one-hot selection: patch [PH, PW*C] -> [C, 512] samples
    with voxels on lanes end-to-end.

    Row select: one MXU matmul whose bf16 precision splits are stacked
    along K (the one-hot repeated per split band), so the cross-split
    sum happens inside the f32 MXU accumulator — exact reconstruction
    at splits=3, no [PW*C, 512] output adds.  Column select: zero rows
    of other pixel columns (one compare against the static lane ->
    pixel-column iota), then a fold tree halves the sublane count down
    to C — each output is a sum with exactly one nonzero f32 term."""
    p_hi = p_full.astype(jnp.bfloat16)
    terms = [p_hi]
    if splits >= 2:
        r1 = p_full - p_hi.astype(jnp.float32)
        p_mid = r1.astype(jnp.bfloat16)
        terms.append(p_mid)
        if splits >= 3:
            terms.append((r1 - p_mid.astype(jnp.float32)).astype(jnp.bfloat16))
    oh_t = (rowsel_i == lv_c[None, :]).astype(jnp.bfloat16)
    p_k = terms[0] if splits == 1 else jnp.concatenate(terms, axis=0)
    a_t = jax.lax.dot_general(
        p_k, oh_t, _NT_DNUMS, preferred_element_type=jnp.float32
    )  # [PW*C, 512]
    m = a_t * (pcol_i == lu_c[None, :]).astype(jnp.float32)
    fold = pw * c
    while fold > c:
        fold //= 2
        m = m[:fold, :] + m[fold:2 * fold, :]
    return m  # [C, 512]


def _sample_kernel_vmem(
    # scalar prefetch
    u0_ref,  # [V] i32 aligned patch origin x per block
    v0_ref,  # [V] i32 aligned patch origin y per block
    count_ref,  # [1] i32 live-block count
    # array inputs
    img_ref,  # [H, W*C] f32 WHOLE IMAGE, VMEM-resident
    lu_ref,  # [TB, 512] i32 absolute pixel x per voxel
    lv_ref,  # [TB, 512] i32 absolute pixel y per voxel
    *refs,  # C out refs + valid ref (no scratch: no DMA in this path)
    tb: int,
    ph: int,
    pw: int,
    c: int,
    splits: int,
):
    out_refs = refs[:c]
    valid_ref = refs[c]
    i = pl.program_id(0)
    count = count_ref[0]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (splits * ph, 512), 0)
    rowsel_i = jax.lax.rem(rows_i, jnp.int32(ph)) if splits > 1 else rows_i
    pcol_i = jax.lax.broadcasted_iota(jnp.int32, (pw * c, 512), 0) // c

    @pl.when(i * tb < count)
    def _compute():
      for b in range(tb):
        u0 = u0_ref[i * tb + b]
        v0 = v0_ref[i * tb + b]
        lu = lu_ref[b] - u0
        lv = lv_ref[b] - v0
        in_patch = (lu >= 0) & (lu < pw) & (lv >= 0) & (lv < ph)
        lu_c = jnp.clip(lu, 0, pw - 1)
        lv_c = jnp.clip(lv, 0, ph - 1)
        # the patch is a direct aligned slice of the resident image
        p_full = img_ref[
            pl.ds(pl.multiple_of(v0, 8), ph),
            pl.ds(pl.multiple_of(u0 * c, 128), pw * c),
        ]
        m = _onehot_select(p_full, lv_c, lu_c, rowsel_i, pcol_i, splits, pw, c)
        vmask = in_patch.astype(jnp.float32)
        for cc in range(c):
            out_refs[cc][b] = m[cc, :] * vmask
        valid_ref[b] = vmask


def _sample_kernel(
    # scalar prefetch
    u0_ref,  # [V] i32 patch origin x per block
    v0_ref,  # [V] i32 patch origin y per block
    count_ref,  # [1] i32 number of live blocks (tiles past it skip)
    # array inputs
    img_ref,  # [H, W*C] f32 in ANY/HBM (flattened channels)
    lu_ref,  # [TB, 512] i32 in-patch... absolute pixel x per voxel
    lv_ref,  # [TB, 512] i32 absolute pixel y per voxel
    # outputs: C x [TB, 512] channel samples, then validity
    *refs,  # out_ref_0..out_ref_{C-1}, valid_ref, patch_ref, sems
    tb: int,
    ph: int,
    pw: int,
    c: int,
    img_h: int,
    img_w: int,
    splits: int,
):
    out_refs = refs[:c]
    valid_ref = refs[c]
    patch_ref = refs[c + 1]  # [2, TB, PH, PW*C] f32 scratch
    sems = refs[c + 2]  # DMA semaphores [2, TB]

    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    count = count_ref[0]

    # Double-buffered patch DMAs across grid tiles: tile i's compute
    # overlaps tile i+1's copies (scratch persists across grid steps on
    # TPU).  Origins are pre-aligned by the caller; assert that to Mosaic
    # so the dynamic DMA slice provably lands on tile boundaries.
    def _dma(tile, b):
        v0 = pl.multiple_of(v0_ref[tile * tb + b], 8)
        u0c = pl.multiple_of(u0_ref[tile * tb + b] * c, 128)
        slot = jax.lax.rem(tile, 2)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(v0, ph), pl.ds(u0c, pw * c)],
            patch_ref.at[slot, b],
            sems.at[slot, b],
        )

    # Tiles at or past the live-block count skip their DMAs and compute
    # entirely: fuse/carve cost then scales with the frame's actual
    # visible count instead of the padded max_visible cap (~45% wasted at
    # steady state on the bench orbit).  Rows >= count have vis.mask
    # False downstream, so their (unwritten, garbage) outputs are never
    # consumed.
    @pl.when((i == 0) & (count > 0))
    def _():
        for b in range(tb):
            _dma(i, b).start()

    @pl.when((i + 1) * tb < count)
    def _():
        for b in range(tb):
            _dma(i + 1, b).start()

    # static row -> in-patch row map (row r of the K-stacked operand
    # selects patch row r % PH; the rem is loop-invariant)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (splits * ph, 512), 0)
    rowsel_i = jax.lax.rem(rows_i, jnp.int32(ph)) if splits > 1 else rows_i
    # static lane -> pixel-column map: patch lane p holds channel p % C
    # of pixel column p // C, so the column-select mask is ONE compare
    # against this iota (the former (d >= 0) & (d < C) range test cost
    # three extra [PW*C, 512] VPU passes per block)
    pcol_i = jax.lax.broadcasted_iota(jnp.int32, (pw * c, 512), 0) // c
    slot = jax.lax.rem(i, 2)

    @pl.when(i * tb < count)
    def _compute():
      for b in range(tb):
        u0 = u0_ref[i * tb + b]
        v0 = v0_ref[i * tb + b]
        _dma(i, b).wait()

        lu = lu_ref[b] - u0  # [512] local x, voxels on lanes
        lv = lv_ref[b] - v0  # [512] local y
        in_patch = (lu >= 0) & (lu < pw) & (lv >= 0) & (lv < ph)
        lu_c = jnp.clip(lu, 0, pw - 1)
        lv_c = jnp.clip(lv, 0, ph - 1)

        # transposed one-hot row select on the MXU (lhsT contraction is
        # the MXU-native form).  The f32 MXU path miscompiles on this
        # stack (output lanes broadcast); `splits` bf16 terms over a
        # hi/mid/lo split of the patch reconstruct f32 (each output
        # element receives exactly one product term per split):
        #   3: exact f32 (bit-exact vs an XLA gather)
        #   2: rel err <= 2^-16 (~61 um on a 4 m depth; << 1 voxel)
        #   1: plain bf16, rel err <= 2^-8 (integral rgb <= 255 stays
        #      exact; depth err up to ~16 mm at 4 m — NOT for fusion)
        # The split terms are STACKED ALONG K (sublanes) with the
        # one-hot repeated, so the cross-split sum happens inside the
        # MXU accumulator — one matmul, no [PW*C, 512] output adds.
        m = _onehot_select(
            patch_ref[slot, b], lv_c, lu_c, rowsel_i, pcol_i, splits, pw, c
        )
        # m [C, 512]: each channel is one sublane row -> writes need no
        # relayout (the [512, C] form cost a sublane->lane transpose per
        # channel write: 264 ms/frame at 32k blocks, the dominant cost)
        vmask = in_patch.astype(jnp.float32)
        for cc in range(c):
            out_refs[cc][b] = m[cc, :] * vmask
        valid_ref[b] = vmask


@functools.partial(
    jax.jit,
    static_argnames=("ph", "pw", "tb", "interpret", "as_channels", "splits"),
)
def sample_patches(
    img: jnp.ndarray,  # [H, W, C] f32 stacked frame channels
    u0: jnp.ndarray,  # [V] i32 patch origin x (clipped to [0, W-PW])
    v0: jnp.ndarray,  # [V] i32 patch origin y (clipped to [0, H-PH])
    u: jnp.ndarray,  # [V, 512] i32 absolute pixel x per voxel
    v: jnp.ndarray,  # [V, 512] i32 absolute pixel y per voxel
    ph: int = DEFAULT_PH,
    pw: int = DEFAULT_PW,
    tb: int = 16,
    interpret: bool = False,
    as_channels: bool = False,
    splits: int = 3,
    count: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample img at (v, u) per voxel.  Returns ([V, 512, C] values,
    [V, 512] validity), or (tuple of C [V, 512] arrays, validity) with
    as_channels=True — callers fusing at full scale should take the
    channel form to avoid materializing the stacked array.  Samples
    outside the per-block patch come back invalid.

    count: optional device scalar of live rows; tiles wholly past it are
    skipped (their outputs are garbage and MUST be masked by the caller,
    e.g. via vis.mask).  splits: precision of the bf16 hi/mid/lo matmul
    split (3 = bit-exact f32, 2 = rel err <= 2^-16, 1 = plain bf16)."""
    img_h, img_w, c = img.shape
    vcap = u0.shape[0]
    assert vcap % tb == 0, (vcap, tb)
    # the column-select fold tree halves PW*C down to C
    assert pw & (pw - 1) == 0 and c & (c - 1) == 0, (pw, c)
    assert splits in (1, 2, 3), splits
    grid = (vcap // tb,)
    if count is None:
        count_arr = jnp.full((1,), vcap, jnp.int32)
    else:
        count_arr = jnp.asarray(count, jnp.int32).reshape(1)

    # align origins to the DMA tiling (sublane 8, lane 128 => u0*C % 128);
    # the upper clip is rounded down too so clipped origins stay aligned
    ualign = max(128 // c, 1)
    u0 = jnp.clip((u0 // ualign) * ualign, 0, ((img_w - pw) // ualign) * ualign)
    v0 = jnp.clip((v0 // 8) * 8, 0, ((img_h - ph) // 8) * 8)

    img_flat = img.reshape(img_h, img_w * c)

    row_spec = pl.BlockSpec((tb, 512), lambda i, *_: (i, 0))
    out_shape = tuple(
        jax.ShapeDtypeStruct((vcap, 512), jnp.float32) for _ in range(c + 1)
    )
    if img_h * img_w * c * 4 <= VMEM_IMG_BYTES:
        # whole image resident in VMEM: patches are direct slices
        kernel = functools.partial(
            _sample_kernel_vmem, tb=tb, ph=ph, pw=pw, c=c, splits=splits,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((img_h, img_w * c), lambda i, *_: (0, 0)),
                row_spec,
                row_spec,
            ],
            out_specs=tuple(row_spec for _ in range(c + 1)),
            scratch_shapes=[],
        )
    else:
        # large frames: double-buffered per-block patch DMAs
        kernel = functools.partial(
            _sample_kernel,
            tb=tb,
            ph=ph,
            pw=pw,
            c=c,
            img_h=img_h,
            img_w=img_w,
            splits=splits,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # img stays in HBM
                row_spec,
                row_spec,
            ],
            out_specs=tuple(row_spec for _ in range(c + 1)),
            scratch_shapes=[
                pltpu.VMEM((2, tb, ph, pw * c), jnp.float32),
                pltpu.SemaphoreType.DMA((2, tb)),
            ],
        )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(u0, v0, count_arr, img_flat, u, v)
    chans, valid = outs[:c], outs[c] > 0.5
    if as_channels:
        return chans, valid
    return jnp.stack(chans, axis=-1), valid
