"""Pallas TPU kernel: fused patch sampling + TSDF fusion math.

One kernel pass per visible-block tile does everything between the pool
row gather and the row scatter-back:

  patch DMA -> one-hot selection of per-voxel frame samples (see
  sample_kernel.py for the selection scheme and the bf16-split
  workaround) -> the reference's fusion formulas (voxel_tsdf.cu:149-205)
  evaluated in VMEM -> updated payload rows out.

Versus the two-stage path (sample kernel + XLA fusion) this removes the
[V, 512, 8] sampled-array HBM round trip and all intermediate
elementwise materialization; XLA keeps only the (fast, contiguous) row
gather/scatter and the carve reduction.

Rounding parity: roundf (half away from zero) is computed inline as
where(x >= 0, floor(x + .5), ceil(x - .5)) exactly like ops/integrate.py.

Exactness note: fusion math here matches the XLA path to ~1 ulp (fma
contraction differs between the kernel and XLA's fusion choices).  A
block whose min |tsdf| sits exactly at the carve threshold can therefore
carve under one sampler and survive under another — the same class of
nondeterminism the reference has across CUDA atomics scheduling.  The
golden suite pins each sampler against the oracle on scenes away from
the threshold.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sample_kernel import (
    DEFAULT_PH,
    DEFAULT_PW,
    VMEM_IMG_BYTES,
    _NT_DNUMS,
    _onehot_select,
)


def _rha(x):
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def _fuse_math(
    m, z, live_gate, in_patch, word,
    tsdf_old, prob_old,
    *, truncation, max_depth, max_weight, prob_eps,
):
    """Shared fusion formulas (voxel_tsdf.cu:149-205) on one block's
    [512] lane vectors; payload color+weight arrives as the packed
    VoxelRGBW i32 word and leaves the same way (update-selected)."""
    depth = m[0, :]
    d2r = m[1, :]
    r_new, g_new, b_new = m[2, :], m[3, :], m[4, :]
    ht = m[5, :]
    lt = m[6, :]

    sdf = d2r * (depth - z)
    update = (
        live_gate
        & in_patch
        & (depth > 0)
        & (depth <= max_depth)
        & (sdf > -truncation)
    )
    tsdf_new = jnp.minimum(1.0, sdf / truncation)
    w_new = (1.0 - depth / max_depth) * 4.0

    # unpack the RGBW word with LOGICAL shifts (i32 carries the u32 bit
    # pattern; the weight byte rides the sign bits)
    b255 = jnp.int32(0xFF)
    w_old = (lax.shift_right_logical(word, 24) & b255).astype(jnp.float32)
    r_old = (word & b255).astype(jnp.float32)
    g_old = (lax.shift_right_logical(word, 8) & b255).astype(jnp.float32)
    b_old = (lax.shift_right_logical(word, 16) & b255).astype(jnp.float32)

    w_comb = w_old + w_new
    w_safe = jnp.where(w_comb == 0, 1.0, w_comb)
    tsdf_upd = (tsdf_old * w_old + tsdf_new * w_new) / w_safe
    r_upd = _rha((r_old * w_old + r_new * w_new) / w_safe)
    g_upd = _rha((g_old * w_old + g_new * w_new) / w_safe)
    b_upd = _rha((b_old * w_old + b_new * w_new) / w_safe)
    w_upd = jnp.minimum(_rha(w_comb), max_weight)
    # C powf edge semantics (powf(0,0)==1): zero-weight terms contribute
    # nothing even at base 0 — see ops/integrate.py
    e_old = w_old / w_safe
    e_new = w_new / w_safe
    positive = jnp.exp(
        jnp.where(e_old == 0.0, 0.0, e_old * jnp.log(prob_old))
        + jnp.where(e_new == 0.0, 0.0, e_new * jnp.log(ht))
    )
    negative = jnp.exp(
        jnp.where(e_old == 0.0, 0.0, e_old * jnp.log(1.0 - prob_old))
        + jnp.where(e_new == 0.0, 0.0, e_new * jnp.log(lt))
    )
    denom = positive + negative
    prob_upd = jnp.where(
        denom > 0, positive / jnp.where(denom > 0, denom, 1.0), prob_old
    )
    if prob_eps > 0.0:
        prob_upd = jnp.clip(prob_upd, prob_eps, 1.0 - prob_eps)

    new_word = (
        r_upd.astype(jnp.int32)
        | (g_upd.astype(jnp.int32) << 8)
        | (b_upd.astype(jnp.int32) << 16)
        | (w_upd.astype(jnp.int32) << 24)
    )
    t_fin = jnp.where(update, tsdf_upd, tsdf_old)
    word_fin = jnp.where(update, new_word, word)
    p_fin = jnp.where(update, prob_upd, prob_old)
    return t_fin, word_fin, p_fin


def _fuse_kernel_vmem(
    # scalar prefetch
    u0_ref,  # [V] i32 aligned patch origin x
    v0_ref,  # [V] i32 aligned patch origin y
    count_ref,  # [1] i32 live-row count
    # inputs
    img_ref,  # [H, W*C] f32 WHOLE IMAGE, VMEM-resident
    lu_ref,  # [TB, 512] i32 absolute pixel x (clipped)
    lv_ref,  # [TB, 512] i32 absolute pixel y (clipped)
    z_ref,  # [TB, 512] f32 camera-space voxel z
    gate_ref,  # [TB, 512] f32 1.0 where vis.mask & in_img
    tsdf_ref,  # [TB, 512] f32 gathered pool rows
    rgbw_ref,  # [TB, 512] i32 packed VoxelRGBW words
    prob_ref,  # [TB, 512] f32
    # outputs
    tsdf_out,
    rgbw_out,  # i32 packed
    prob_out,
    minabs_out,  # [TB, 128] min |tsdf| per row, lane-broadcast
    *,
    tb: int,
    ph: int,
    pw: int,
    c: int,
    truncation: float,
    max_depth: float,
    max_weight: float,
    prob_eps: float,
    splits: int,
):
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
        # direct aligned slice of the VMEM-resident image (no DMA)
        p_full = img_ref[
            pl.ds(pl.multiple_of(v0, 8), ph),
            pl.ds(pl.multiple_of(u0 * c, 128), pw * c),
        ]
        m = _onehot_select(p_full, lv_c, lu_c, rowsel_i, pcol_i, splits, pw, c)
        t_fin, word_fin, p_fin = _fuse_math(
            m, z_ref[b], gate_ref[b] > 0, in_patch, rgbw_ref[b],
            tsdf_ref[b], prob_ref[b],
            truncation=truncation, max_depth=max_depth,
            max_weight=max_weight, prob_eps=prob_eps,
        )
        tsdf_out[b] = t_fin
        rgbw_out[b] = word_fin
        prob_out[b] = p_fin
        minabs_out[b] = jnp.broadcast_to(jnp.min(jnp.abs(t_fin)), (128,))


@functools.partial(
    jax.jit,
    static_argnames=(
        "ph", "pw", "tb", "truncation", "max_depth", "max_weight",
        "prob_eps", "interpret", "splits",
    ),
)
def fuse_rows_packed(
    img: jnp.ndarray,  # [H, W, C] stacked frame channels
    u0: jnp.ndarray,  # [V]
    v0: jnp.ndarray,  # [V]
    u: jnp.ndarray,  # [V, 512] absolute pixel x (clipped)
    v: jnp.ndarray,  # [V, 512]
    z: jnp.ndarray,  # [V, 512] camera z per voxel
    gate: jnp.ndarray,  # [V, 512] f32 vis&in_img
    tsdf: jnp.ndarray,  # [V, 512] gathered pool rows
    rgbw: jnp.ndarray,  # [V, 512] u32 packed VoxelRGBW words
    prob: jnp.ndarray,
    truncation: float,
    max_depth: float,
    max_weight: float,
    prob_eps: float = 0.0,
    ph: int = DEFAULT_PH,
    pw: int = DEFAULT_PW,
    tb: int = 16,
    interpret: bool = False,
    splits: int = 3,
    count: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, ...]:
    """VMEM-image fused sample+update on packed RGBW rows.  Returns
    (tsdf', rgbw' u32, prob', min|tsdf| [V, 128] — use [:, 0]).

    Requires the stacked image to fit in VMEM (sample_kernel.py
    VMEM_IMG_BYTES); callers route larger frames to the split pipeline
    or the patch-DMA fuse_rows.  Rows past count come back garbage and
    must be masked by the caller."""
    img_h, img_w, c = img.shape
    assert img_h * img_w * c * 4 <= VMEM_IMG_BYTES, (img.shape, "use fuse_rows")
    vcap = u0.shape[0]
    assert vcap % tb == 0
    assert pw & (pw - 1) == 0 and c & (c - 1) == 0, (pw, c)
    assert splits in (1, 2, 3), splits
    if count is None:
        count_arr = jnp.full((1,), vcap, jnp.int32)
    else:
        count_arr = jnp.asarray(count, jnp.int32).reshape(1)

    ualign = max(128 // c, 1)
    u0 = jnp.clip((u0 // ualign) * ualign, 0, ((img_w - pw) // ualign) * ualign)
    v0 = jnp.clip((v0 // 8) * 8, 0, ((img_h - ph) // 8) * 8)
    img_flat = img.reshape(img_h, img_w * c)
    rgbw_i = lax.bitcast_convert_type(rgbw, jnp.int32)

    kernel = functools.partial(
        _fuse_kernel_vmem,
        tb=tb, ph=ph, pw=pw, c=c,
        truncation=truncation, max_depth=max_depth, max_weight=max_weight,
        prob_eps=prob_eps, splits=splits,
    )
    row = lambda i, *_: (i, 0)
    row_spec = pl.BlockSpec((tb, 512), row)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(vcap // tb,),
        in_specs=[pl.BlockSpec((img_h, img_w * c), lambda i, *_: (0, 0))]
        + [row_spec] * 7,
        out_specs=(row_spec, row_spec, row_spec, pl.BlockSpec((tb, 128), row)),
        scratch_shapes=[],
    )
    out_shape = (
        jax.ShapeDtypeStruct((vcap, 512), jnp.float32),
        jax.ShapeDtypeStruct((vcap, 512), jnp.int32),
        jax.ShapeDtypeStruct((vcap, 512), jnp.float32),
        jax.ShapeDtypeStruct((vcap, 128), jnp.float32),
    )
    t_w, w_i, p_w, minabs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(u0, v0, count_arr, img_flat, u, v, z, gate, tsdf, rgbw_i, prob)
    return t_w, lax.bitcast_convert_type(w_i, jnp.uint32), p_w, minabs


def _fuse_kernel(
    # scalar prefetch
    u0_ref,  # [V] i32
    v0_ref,  # [V] i32
    count_ref,  # [1] i32 live-row count (tiles past it skip)
    # inputs
    img_ref,  # [H, W*C] f32 (ANY/HBM) stacked: depth, d2r, r, g, b, ht, lt, 0
    lu_ref,  # [TB, 512] i32
    lv_ref,  # [TB, 512] i32
    z_ref,  # [TB, 512] f32 camera-space voxel z
    gate_ref,  # [TB, 512] f32 1.0 where vis.mask & in_img
    tsdf_ref,  # [TB, 512] f32
    weight_ref,  # [TB, 512] f32
    prob_ref,  # [TB, 512] f32
    # rgb rides as three [TB, 512] planes: a [TB, 512, 3] pallas operand
    # would get its minor dim lane-padded 3 -> 128 at the kernel boundary
    # (8 GB at full scale; this OOM'd the round-2 sweep)
    r_ref,
    g_ref,
    b_ref,
    # outputs
    tsdf_out,
    weight_out,
    prob_out,
    r_out,
    g_out,
    b_out,
    minabs_out,  # [TB, 128] min |tsdf| per updated row, lane-broadcast
    # scratch
    patch_ref,  # [2, TB, PH, PW*C]
    sems,  # [2, TB]
    *,
    tb: int,
    ph: int,
    pw: int,
    c: int,
    truncation: float,
    max_depth: float,
    max_weight: float,
    prob_eps: float,
    splits: int,
):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    count = count_ref[0]

    def _dma(tile, b):
        v0 = pl.multiple_of(v0_ref[tile * tb + b], 8)
        u0c = pl.multiple_of(u0_ref[tile * tb + b] * c, 128)
        slot = jax.lax.rem(tile, 2)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(v0, ph), pl.ds(u0c, pw * c)],
            patch_ref.at[slot, b],
            sems.at[slot, b],
        )

    # live-count early exit (see sample_kernel.py): tiles wholly past
    # count skip DMA and compute; their unwritten outputs are dropped by
    # the caller's masked scatter
    @pl.when((i == 0) & (count > 0))
    def _():
        for b in range(tb):
            _dma(i, b).start()

    @pl.when((i + 1) * tb < count)
    def _():
        for b in range(tb):
            _dma(i + 1, b).start()

    # static selection maps (see sample_kernel.py for the layout and
    # precision rationale — this kernel mirrors its K-stacked matmul +
    # pixel-column-iota select)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (splits * ph, 512), 0)
    rowsel_i = jax.lax.rem(rows_i, jnp.int32(ph)) if splits > 1 else rows_i
    pcol_i = jax.lax.broadcasted_iota(jnp.int32, (pw * c, 512), 0) // c
    slot = jax.lax.rem(i, 2)

    @pl.when(i * tb < count)
    def _compute():
      for b in range(tb):
        u0 = u0_ref[i * tb + b]
        v0 = v0_ref[i * tb + b]
        _dma(i, b).wait()

        lu = lu_ref[b] - u0
        lv = lv_ref[b] - v0
        in_patch = (lu >= 0) & (lu < pw) & (lv >= 0) & (lv < ph)
        lu_c = jnp.clip(lu, 0, pw - 1)
        lv_c = jnp.clip(lv, 0, ph - 1)

        # --- transposed selection, voxels on lanes end-to-end ---
        p_full = patch_ref[slot, b]
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
        # m [C, 512]: single-sublane channel rows feed the fusion math
        # as natural [512] lane vectors — no relayout

        depth = m[0, :]
        d2r = m[1, :]
        r_new, g_new, b_new = m[2, :], m[3, :], m[4, :]
        ht = m[5, :]
        lt = m[6, :]

        # --- fusion math (voxel_tsdf.cu:149-205) ---
        z = z_ref[b]
        sdf = d2r * (depth - z)
        update = (
            (gate_ref[b] > 0)
            & in_patch
            & (depth > 0)
            & (depth <= max_depth)
            & (sdf > -truncation)
        )
        tsdf_new = jnp.minimum(1.0, sdf / truncation)
        w_new = (1.0 - depth / max_depth) * 4.0
        w_old = weight_ref[b]
        w_comb = w_old + w_new
        w_safe = jnp.where(w_comb == 0, 1.0, w_comb)

        tsdf_upd = (tsdf_ref[b] * w_old + tsdf_new * w_new) / w_safe
        r_old, g_old, b_old = r_ref[b], g_ref[b], b_ref[b]
        r_upd = _rha((r_old * w_old + r_new * w_new) / w_safe)
        g_upd = _rha((g_old * w_old + g_new * w_new) / w_safe)
        b_upd = _rha((b_old * w_old + b_new * w_new) / w_safe)
        w_upd = jnp.minimum(_rha(w_comb), max_weight)
        p_old = prob_ref[b]
        # C powf edge semantics (powf(0,0)==1): zero-weight terms must
        # contribute nothing even at base 0 — see ops/integrate.py
        e_old = w_old / w_safe
        e_new = w_new / w_safe
        positive = jnp.exp(
            jnp.where(e_old == 0.0, 0.0, e_old * jnp.log(p_old))
            + jnp.where(e_new == 0.0, 0.0, e_new * jnp.log(ht))
        )
        negative = jnp.exp(
            jnp.where(e_old == 0.0, 0.0, e_old * jnp.log(1.0 - p_old))
            + jnp.where(e_new == 0.0, 0.0, e_new * jnp.log(lt))
        )
        denom = positive + negative
        prob_upd = jnp.where(
            denom > 0, positive / jnp.where(denom > 0, denom, 1.0), p_old
        )
        if prob_eps > 0.0:
            prob_upd = jnp.clip(prob_upd, prob_eps, 1.0 - prob_eps)

        t_fin = jnp.where(update, tsdf_upd, tsdf_ref[b])
        tsdf_out[b] = t_fin
        weight_out[b] = jnp.where(update, w_upd, w_old)
        prob_out[b] = jnp.where(update, prob_upd, p_old)
        r_out[b] = jnp.where(update, r_upd, r_old)
        g_out[b] = jnp.where(update, g_upd, g_old)
        b_out[b] = jnp.where(update, b_upd, b_old)
        # carve input for free: the min-reduce runs on the row already in
        # registers instead of a separate 17M-element pass downstream
        minabs_out[b] = jnp.broadcast_to(jnp.min(jnp.abs(t_fin)), (128,))


@functools.partial(
    jax.jit,
    static_argnames=(
        "ph", "pw", "tb", "truncation", "max_depth", "max_weight",
        "prob_eps", "interpret", "splits",
    ),
)
def fuse_rows(
    img: jnp.ndarray,  # [H, W, C] stacked frame channels
    u0: jnp.ndarray,  # [V]
    v0: jnp.ndarray,  # [V]
    u: jnp.ndarray,  # [V, 512] absolute pixel x
    v: jnp.ndarray,  # [V, 512]
    z: jnp.ndarray,  # [V, 512] camera z per voxel
    gate: jnp.ndarray,  # [V, 512] f32 vis&in_img
    tsdf: jnp.ndarray,  # [V, 512] gathered pool rows
    weight: jnp.ndarray,
    prob: jnp.ndarray,
    r_pl: jnp.ndarray,  # [V, 512] color planes (pre-unpacked RGBW)
    g_pl: jnp.ndarray,
    b_pl: jnp.ndarray,
    truncation: float,
    max_depth: float,
    max_weight: float,
    prob_eps: float = 0.0,
    ph: int = DEFAULT_PH,
    pw: int = DEFAULT_PW,
    tb: int = 16,
    interpret: bool = False,
    splits: int = 3,
    count: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, ...]:
    """Fused sample+update over gathered pool rows; returns updated
    (tsdf, weight, prob, r, g, b) rows plus per-row min |tsdf| (the
    space carve input, [V, 128] lane-broadcast -- use [:, 0]).

    count/splits as in sample_patches: rows past count come back
    garbage and must be masked by the caller."""
    img_h, img_w, c = img.shape
    vcap = u0.shape[0]
    assert vcap % tb == 0
    # the column-select fold tree halves PW*C down to C
    assert pw & (pw - 1) == 0 and c & (c - 1) == 0, (pw, c)
    assert splits in (1, 2, 3), splits
    if count is None:
        count_arr = jnp.full((1,), vcap, jnp.int32)
    else:
        count_arr = jnp.asarray(count, jnp.int32).reshape(1)

    ualign = max(128 // c, 1)
    u0 = jnp.clip((u0 // ualign) * ualign, 0, ((img_w - pw) // ualign) * ualign)
    v0 = jnp.clip((v0 // 8) * 8, 0, ((img_h - ph) // 8) * 8)
    img_flat = img.reshape(img_h, img_w * c)

    kernel = functools.partial(
        _fuse_kernel,
        tb=tb, ph=ph, pw=pw, c=c,
        truncation=truncation, max_depth=max_depth, max_weight=max_weight,
        prob_eps=prob_eps, splits=splits,
    )
    row = lambda i, *_: (i, 0)
    row_spec = pl.BlockSpec((tb, 512), row)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(vcap // tb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [row_spec] * 10,
        out_specs=tuple([row_spec] * 6) + (pl.BlockSpec((tb, 128), row),),
        scratch_shapes=[
            pltpu.VMEM((2, tb, ph, pw * c), jnp.float32),
            pltpu.SemaphoreType.DMA((2, tb)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((vcap, 512), jnp.float32) for _ in range(6)
    ) + (jax.ShapeDtypeStruct((vcap, 128), jnp.float32),)
    t_w, w_w, p_w, r_w, g_w, b_w, minabs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        u0, v0, count_arr, img_flat, u, v, z, gate, tsdf, weight, prob,
        r_pl, g_pl, b_pl,
    )
    return t_w, w_w, p_w, r_w, g_w, b_w, minabs
