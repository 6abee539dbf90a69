"""Pallas TPU kernels: surface-splat z-buffer + payload (scatter-free).

The XLA splat renderer (ops/render_fast.py) builds its z-buffer with an
elementwise scatter-min of ~4 descriptors per visible voxel — the
measured TPU wall for such scatters makes the depth pass the dominant
cost of frame-to-model tracking.  These kernels invert that: the
z-buffer lives in VMEM for the whole pass (full-image output block
revisited by every grid step — sequential TPU grid, so
read-modify-write accumulation is safe) and each surface block
min-merges a COMPACT patch covering its projected footprint.

Layout lessons baked in (PROGRESS.md findings 8-10):
  - voxels stay on LANES end-to-end; patch rows (y) ride sublanes.
    Per patch column qu, a double-masked [CH, 512] lane-reduce computes
    one [CH, 1] column, placed by a static lane mask — no
    sublane<->lane relayouts (the per-voxel-row formulation cost 22
    us/block; this runs ~3 us/block, measured 39.5 ms vs 265 ms for
    12k blocks end-to-end).
  - the compact [CH, CW] patch sits in a [24, 256] scratch whose pad
    area stays BIG from a one-time init; placement into the
    128/8-aligned VMEM window is two dynamic `pltpu.roll`s (traced
    shifts work on both axes on this stack).
  - `pl.multiple_of` annotations on the window origins are mandatory —
    without them Mosaic rejects the dynamic window RMW.

Blocks whose footprint exceeds the compact patch (CW-2 x CH-2 px
before the +1 of the 2x2 splat) fall back to a capped XLA scatter; the
merged result is bit-identical to the XLA z-buffer
(test_splat_kernel.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2**30  # python int: jnp constants would be captured consts in the kernel
# compact patch extent: footprints (bbox + the 2x2 splat's +1) must fit.
# DEFAULTS cover the bench workload's worst case (max 12x12 px) with
# slack; the narrow (16, 16) mode halves the per-block column loop — the
# dominant kernel cost — and still covers the p90 9x9 footprint, pushing
# the tail through the overflow scatter instead.  cw must divide 128
# (the acc lane tile) and ch <= _WIN_H - 8 (roll slack).
CW = 32  # patch columns (x): bbox width <= CW - 2
CH = 16  # patch rows (y): bbox height <= CH - 2
_WIN_H, _WIN_W = 24, 256  # aligned VMEM window (CH + sublane slack, 2 lane tiles)


def _splat_kernel(
    # scalar prefetch
    bu_ref,  # [S] i32 RAW footprint bbox origin x per block
    bv_ref,  # [S] i32 RAW bbox origin y
    n_ref,  # [1] i32 number of live blocks (rest skipped)
    # inputs (blocked rows)
    lu_ref,  # [TB, 512] i32 bbox-relative voxel pixel x (floor)
    lv_ref,  # [TB, 512] i32 bbox-relative voxel pixel y (floor)
    dq_ref,  # [TB, 512] i32 quantized corrected depth (BIG = dead voxel)
    # output
    zbuf_ref,  # [HPAD, WPAD] i32, full image (same block every step)
    # scratch
    patch_ref,  # [TB, 24, 256] i32; pad area stays BIG after init
    *,
    tb: int,
    hpad: int,
    wpad: int,
    cw: int,
    ch: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zbuf_ref[...] = jnp.full(zbuf_ref.shape, BIG, jnp.int32)
        patch_ref[...] = jnp.full(patch_ref.shape, BIG, jnp.int32)

    qv_iota = jax.lax.broadcasted_iota(jnp.int32, (ch, 512), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (ch, 128), 1)
    for b in range(tb):
        idx = i * tb + b

        @pl.when(idx < n_ref[0])
        def _(b=b, idx=idx):
            lu = lu_ref[b]  # [512] voxels on lanes
            lv = lv_ref[b]
            dq = dq_ref[b]
            # voxel contributes to patch row qv iff lv in {qv-1, qv}
            # (the 2x2 footprint); one [ch, 512] mask for all rows
            rmask = (qv_iota == lv[None, :]) | (qv_iota == lv[None, :] + 1)
            vals0 = jnp.where(rmask, dq[None, :], BIG)  # [ch, 512]
            acc = jnp.full((ch, 128), BIG, jnp.int32)
            for qu in range(cw):
                cmask = (lu == qu) | (lu == qu - 1)  # [512]
                col = jnp.min(jnp.where(cmask[None, :], vals0, BIG),
                              axis=1, keepdims=True)  # [ch, 1]
                acc = jnp.minimum(acc, jnp.where(lane_row == qu, col, BIG))
            patch_ref[b, 0:ch, 0:128] = acc

            bu = bu_ref[idx]
            bv = bv_ref[idx]
            u0a = pl.multiple_of(
                jnp.minimum((bu >> 7) << 7, wpad - _WIN_W), 128)
            v0a = pl.multiple_of(
                jnp.minimum((bv >> 3) << 3, hpad - _WIN_H), 8)
            p = patch_ref[b]
            p = pltpu.roll(p, bv - v0a, axis=0)
            p = pltpu.roll(p, bu - u0a, axis=1)
            win = zbuf_ref[pl.ds(v0a, _WIN_H), pl.ds(u0a, _WIN_W)]
            zbuf_ref[pl.ds(v0a, _WIN_H), pl.ds(u0a, _WIN_W)] = jnp.minimum(
                win, p)


@functools.partial(
    jax.jit, static_argnames=("hpad", "wpad", "tb", "interpret", "cw", "ch")
)
def splat_zbuf_rows(
    lu: jnp.ndarray,  # [S, 512] i32 bbox-relative
    lv: jnp.ndarray,  # [S, 512] i32
    dq: jnp.ndarray,  # [S, 512] i32 (BIG = dead)
    bu: jnp.ndarray,  # [S] i32 raw bbox origins
    bv: jnp.ndarray,  # [S] i32
    n_real: jnp.ndarray,  # [] or [1] i32
    hpad: int,
    wpad: int,
    tb: int = 8,
    interpret: bool = False,
    cw: int = CW,
    ch: int = CH,
) -> jnp.ndarray:
    """Min-merge per-block compact patches into a [hpad, wpad] z-buffer."""
    s = lu.shape[0]
    assert s % tb == 0 and hpad % 8 == 0 and wpad % 128 == 0
    assert 128 % cw == 0 and ch <= _WIN_H - 8, (cw, ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s // tb,),
        in_specs=[
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((hpad, wpad), lambda i, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((tb, _WIN_H, _WIN_W), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(
            _splat_kernel, tb=tb, hpad=hpad, wpad=wpad, cw=cw, ch=ch
        ),
        out_shape=jax.ShapeDtypeStruct((hpad, wpad), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bu, bv, n_real.reshape(1), lu, lv, dq)


def _pad_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pads(hgt: int, wid: int) -> Tuple[int, int]:
    """Padded z-buffer dims: every aligned window must fit, and the +1
    splat pixel of edge voxels must land inside the pad."""
    hpad = _pad_up(((hgt - 1) >> 3 << 3) + _WIN_H, 8)
    wpad = _pad_up(((wid - 1) >> 7 << 7) + _WIN_W, 128)
    return hpad, wpad


class _SplatPrep(NamedTuple):
    """Block data prepared for the patch kernels + the overflow fallback."""

    lu: jnp.ndarray  # [S, 512] bbox-relative floor pixel x (kept order)
    lv: jnp.ndarray  # [S, 512]
    dq_k: jnp.ndarray  # [S, 512] quantized depth, BIG = dead (kept order)
    buo: jnp.ndarray  # [S] raw bbox origins (kept order)
    bvo: jnp.ndarray  # [S]
    n_real: jnp.ndarray  # [] live kept-block count
    n_left: jnp.ndarray  # [] leftover (overflow) block count
    order: jnp.ndarray  # [S] block permutation (kept first)
    lorder: jnp.ndarray  # [cap] leftover block indices (into original rows)
    lpix: jnp.ndarray  # [4*cap*512] leftover footprint pixels (n_pix = dead)
    ldqs: jnp.ndarray  # [4*cap*512] leftover quantized depths
    hpad: int
    wpad: int


def _prep_splat_blocks(
    vol, cam, cam_T_world, max_depth, band, overflow_cap,
    surf_cap=None, cw: int = CW, ch: int = CH,
) -> Tuple[_SplatPrep, jnp.ndarray]:
    """Shared host-side prep: project, bbox per block, split into
    patch-kernel blocks (footprint fits the compact patch) and overflow
    blocks (compacted XLA scatter, capped).  Returns the prep plus the
    visible-set pool indices for payload packing."""
    from ..render_fast import _project_for_splat

    cfg = vol.cfg
    hgt, wid = cam.img_h, cam.img_w
    n_pix = hgt * wid

    uf, vf, depth_q, surf, vis, sv_overflow = _project_for_splat(
        vol, cam, cam_T_world, max_depth, band, surf_cap
    )  # [V,512] f32, f32, i32, bool; VisibleSet; [] i32

    u0px = jnp.floor(uf).astype(jnp.int32)
    v0px = jnp.floor(vf).astype(jnp.int32)
    dq = jnp.where(surf, depth_q, BIG)

    # per-block footprint bbox over live voxels (+1 px in each direction
    # from the 2x2 splat)
    bu_min = jnp.min(jnp.where(surf, u0px, BIG), axis=1)
    bu_max = jnp.max(jnp.where(surf, u0px + 1, -BIG), axis=1)
    bv_min = jnp.min(jnp.where(surf, v0px, BIG), axis=1)
    bv_max = jnp.max(jnp.where(surf, v0px + 1, -BIG), axis=1)
    nonempty = vis.mask & (bu_min <= bu_max)

    hpad, wpad = _pads(hgt, wid)
    fits = (
        (bu_max - bu_min < cw - 1)
        & (bv_max - bv_min < ch - 1)
        & (bu_min >= 0)
        & (bv_min >= 0)
    )
    keep = nonempty & fits
    leftover = nonempty & ~fits

    # compact kept blocks to the front (stable), pass live count
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    n_real = jnp.sum(keep).astype(jnp.int32)
    bu_k = jnp.take(jnp.maximum(bu_min, 0), order)
    bv_k = jnp.take(jnp.maximum(bv_min, 0), order)
    lu = jnp.take(u0px, order, axis=0) - bu_k[:, None]
    lv = jnp.take(v0px, order, axis=0) - bv_k[:, None]
    dq_k = jnp.take(dq, order, axis=0)

    # overflow blocks: footprint pixel indices for the XLA scatter
    lorder = jnp.argsort(jnp.where(leftover, 0, 1), stable=True)[:overflow_cap]
    lmask = jnp.take(leftover, lorder)
    lu0 = jnp.take(u0px, lorder, axis=0)
    lv0 = jnp.take(v0px, lorder, axis=0)
    ldq = jnp.where(lmask[:, None], jnp.take(dq, lorder, axis=0), BIG)
    pix4, dq4 = [], []
    for du in (0, 1):
        for dv in (0, 1):
            uu_ = lu0 + du
            vv_ = lv0 + dv
            ok = (ldq < BIG) & (uu_ >= 0) & (uu_ < wid) & (vv_ >= 0) & (vv_ < hgt)
            pix4.append(jnp.where(ok, vv_ * wid + uu_, n_pix).reshape(-1))
            dq4.append(ldq.reshape(-1))
    prep = _SplatPrep(
        lu=lu, lv=lv, dq_k=dq_k,
        buo=bu_k, bvo=bv_k,
        n_real=n_real,
        n_left=jnp.sum(leftover).astype(jnp.int32),
        order=order, lorder=lorder,
        lpix=jnp.concatenate(pix4), ldqs=jnp.concatenate(dq4),
        hpad=hpad, wpad=wpad,
    )
    pool = jnp.clip(vis.pool_idx, 0, cfg.num_blocks - 1)
    return prep, pool, sv_overflow


def _zbuf_pallas(prep: _SplatPrep, hgt, wid, tb, interpret, cw=CW, ch=CH):
    """Kernel pass + overflow scatter -> merged flat z-buffer [n_pix]."""
    zpad = splat_zbuf_rows(
        prep.lu, prep.lv, prep.dq_k, prep.buo, prep.bvo, prep.n_real,
        prep.hpad, prep.wpad, tb=tb, interpret=interpret, cw=cw, ch=ch,
    )
    zbuf = zpad[:hgt, :wid].reshape(-1)
    # the overflow scatter's 4*cap*512 descriptors are only worth paying
    # when some block actually overflowed the compact patch (the common
    # steady-state frame has none; a scatter of all-dropped indices
    # still walks every descriptor)
    return jax.lax.cond(
        prep.n_left > 0,
        lambda z: z.at[prep.lpix].min(prep.ldqs, mode="drop"),
        lambda z: z,
        zbuf,
    )


def splat_depth_pallas(
    vol,
    cam,
    cam_T_world,
    max_depth: float,
    band: float = 1.25,
    overflow_cap: int = 512,
    tb: int = 8,
    interpret: bool = False,
    surf_cap=None,
    cw: int = CW,
    ch: int = CH,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth + hit images via the Pallas splat z-buffer.

    Matches render_fast.splat_render's pass-1 z-buffer exactly (same
    projection, band, 2x2 footprint, depth quantization).  Blocks whose
    footprint does not fit the compact patch (or that touch negative
    pixel coords) go through a compacted XLA scatter capped at
    `overflow_cap` blocks; blocks beyond the cap are dropped (they only
    occur when the camera is inside/next to geometry).
    """
    hgt, wid = cam.img_h, cam.img_w
    if surf_cap is None:
        from ..render_fast import DEFAULT_SURF_CAP

        surf_cap = DEFAULT_SURF_CAP
    prep, _pool, _overflow = _prep_splat_blocks(
        vol, cam, cam_T_world, max_depth, band, overflow_cap, surf_cap,
        cw=cw, ch=ch,
    )
    zbuf = _zbuf_pallas(prep, hgt, wid, tb, interpret, cw=cw, ch=ch)
    hit = (zbuf < BIG).reshape(hgt, wid)
    depth = jnp.where(hit, zbuf.reshape(hgt, wid).astype(jnp.float32) / 4096.0, 0.0)
    return depth, hit


# ----------------------------------------------------------------------
# Pass 2: payload (rgb + ht probability) patch kernel
# ----------------------------------------------------------------------
_PMIN = -(2**31)  # int32 sentinel == (uint32 0) ^ 0x80000000


def _payload_kernel(
    # scalar prefetch
    bu_ref,
    bv_ref,
    n_ref,
    # inputs
    lu_ref,  # [TB, 512] i32 bbox-relative
    lv_ref,  # [TB, 512] i32
    dq_ref,  # [TB, 512] i32 (BIG = dead)
    pk_ref,  # [TB, 512] i32 sign-flipped packed payload
    zbuf_ref,  # [HPAD, WPAD] i32 final z-buffer (read-only, full block)
    # output
    pbuf_ref,  # [HPAD, WPAD] i32 sign-flipped payload buffer
    # scratch
    patch_ref,  # [TB, 24, 256] i32; pad area stays _PMIN after init
    *,
    tb: int,
    hpad: int,
    wpad: int,
    cw: int,
    ch: int,
):
    """Winner-takes-max payload splat: a voxel paints a patch pixel only
    when its quantized depth equals the final z-buffer there (same rule
    as the XLA pass 2); ties resolve by max packed value.  uint32
    ordering is preserved by the ^0x80000000 sign flip on the host.
    Transposed like the z pass; the final z window is back-rolled into
    compact patch coords for the equality test."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pbuf_ref[...] = jnp.full(pbuf_ref.shape, _PMIN, jnp.int32)
        patch_ref[...] = jnp.full(patch_ref.shape, _PMIN, jnp.int32)

    qv_iota = jax.lax.broadcasted_iota(jnp.int32, (ch, 512), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (ch, 128), 1)
    for b in range(tb):
        idx = i * tb + b

        @pl.when(idx < n_ref[0])
        def _(b=b, idx=idx):
            bu = bu_ref[idx]
            bv = bv_ref[idx]
            u0a = pl.multiple_of(
                jnp.minimum((bu >> 7) << 7, wpad - _WIN_W), 128)
            v0a = pl.multiple_of(
                jnp.minimum((bv >> 3) << 3, hpad - _WIN_H), 8)
            rx = bu - u0a
            ry = bv - v0a
            zwin = zbuf_ref[pl.ds(v0a, _WIN_H), pl.ds(u0a, _WIN_W)]
            # back-roll the window so compact patch coords line up
            zc = pltpu.roll(zwin, _WIN_H - ry, axis=0)
            zc = pltpu.roll(zc, _WIN_W - rx, axis=1)  # [24, 256]
            zc16 = zc[0:ch, 0:128]

            lu = lu_ref[b]
            lv = lv_ref[b]
            dq = dq_ref[b]
            pk = pk_ref[b]
            rmask = (qv_iota == lv[None, :]) | (qv_iota == lv[None, :] + 1)
            vals0 = jnp.where(rmask, dq[None, :], BIG)  # [ch, 512]
            pk0 = pk[None, :]  # [1, 512] broadcast over rows
            acc = jnp.full((ch, 128), _PMIN, jnp.int32)
            for qu in range(cw):
                cmask = (lu == qu) | (lu == qu - 1)  # [512]
                # z value of this patch column, one per row
                zcol = jnp.min(
                    jnp.where(lane_row == qu, zc16, BIG),
                    axis=1, keepdims=True)  # [ch, 1]
                win = cmask[None, :] & (vals0 == zcol) & (vals0 < BIG)
                pcol = jnp.max(jnp.where(win, pk0, _PMIN),
                               axis=1, keepdims=True)  # [ch, 1]
                acc = jnp.maximum(
                    acc, jnp.where(lane_row == qu, pcol, _PMIN))
            patch_ref[b, 0:ch, 0:128] = acc

            p = patch_ref[b]
            p = pltpu.roll(p, ry, axis=0)
            p = pltpu.roll(p, rx, axis=1)
            cur = pbuf_ref[pl.ds(v0a, _WIN_H), pl.ds(u0a, _WIN_W)]
            pbuf_ref[pl.ds(v0a, _WIN_H), pl.ds(u0a, _WIN_W)] = jnp.maximum(
                cur, p)


@functools.partial(
    jax.jit, static_argnames=("hpad", "wpad", "tb", "interpret", "cw", "ch")
)
def splat_payload_rows(
    lu, lv, dq, pk, bu, bv, n_real, zpad,
    hpad: int, wpad: int, tb: int = 8,
    interpret: bool = False,
    cw: int = CW, ch: int = CH,
) -> jnp.ndarray:
    """Max-merge winner payload patches against the final padded z-buffer."""
    s = lu.shape[0]
    assert s % tb == 0
    assert 128 % cw == 0 and ch <= _WIN_H - 8, (cw, ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s // tb,),
        in_specs=[
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
            pl.BlockSpec((hpad, wpad), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((hpad, wpad), lambda i, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((tb, _WIN_H, _WIN_W), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(
            _payload_kernel, tb=tb, hpad=hpad, wpad=wpad, cw=cw, ch=ch
        ),
        out_shape=jax.ShapeDtypeStruct((hpad, wpad), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bu, bv, n_real.reshape(1), lu, lv, dq, pk, zpad)


def splat_render_pallas(
    vol,
    cam,
    cam_T_world,
    max_depth: float,
    band: float = 1.25,
    overflow_cap: int = 512,
    tb: int = 8,
    interpret: bool = False,
    surf_cap=None,
    cw: int = CW,
    ch: int = CH,
):
    """Full splat render (rgba + normal + depth + hit) without scatters:
    the z-buffer and payload passes both run as compact patch kernels,
    with the same capped XLA fallback for oversized footprints.  Output
    equals render_fast.splat_render bit-for-bit (shared projection,
    packing, winner rule, and image assembly)."""
    from ..render_fast import images_from_buffers, pack_payload_rgbw

    hgt, wid = cam.img_h, cam.img_w
    n_pix = hgt * wid
    if surf_cap is None:
        from ..render_fast import DEFAULT_SURF_CAP

        surf_cap = DEFAULT_SURF_CAP
    prep, pool, sv_overflow = _prep_splat_blocks(
        vol, cam, cam_T_world, max_depth, band, overflow_cap, surf_cap,
        cw=cw, ch=ch,
    )
    zbuf = _zbuf_pallas(prep, hgt, wid, tb, interpret, cw=cw, ch=ch)

    # re-pad the merged z-buffer so the payload kernel sees the leftover
    # depths too (pad area stays BIG => never matched)
    zpad = jnp.full((prep.hpad, prep.wpad), BIG, jnp.int32)
    zpad = zpad.at[:hgt, :wid].set(zbuf.reshape(hgt, wid))

    packed = pack_payload_rgbw(
        vol.rgbw[pool].reshape(-1), vol.prob[pool].reshape(-1)
    )
    pk_flip = jax.lax.bitcast_convert_type(
        packed ^ jnp.uint32(0x80000000), jnp.int32
    ).reshape(pool.shape[0], 512)
    ppad = splat_payload_rows(
        prep.lu, prep.lv, prep.dq_k,
        jnp.take(pk_flip, prep.order, axis=0),
        prep.buo, prep.bvo, prep.n_real, zpad,
        prep.hpad, prep.wpad, tb=tb, interpret=interpret, cw=cw, ch=ch,
    )
    pbuf = jax.lax.bitcast_convert_type(
        ppad[:hgt, :wid].reshape(-1), jnp.uint32
    ) ^ jnp.uint32(0x80000000)

    # leftover payload: winner check against the final z-buffer (gated
    # like the z-pass overflow scatter — descriptors cost even when all
    # indices drop)
    def _with_leftover(pb):
        won = (prep.lpix < n_pix) & (
            prep.ldqs == zbuf[jnp.clip(prep.lpix, 0, n_pix - 1)]
        )
        lpk = jnp.tile(
            jnp.take(packed.reshape(-1, 512), prep.lorder, axis=0).reshape(-1), 4
        )
        wpix = jnp.where(won, prep.lpix, n_pix)
        return pb.at[wpix].max(lpk, mode="drop")

    pbuf = jax.lax.cond(prep.n_left > 0, _with_leftover, lambda pb: pb, pbuf)

    return images_from_buffers(zbuf, pbuf, cam, surf_overflow=sv_overflow)
