"""Pallas TPU kernel: surface-splat z-buffer (depth-only render).

The XLA splat renderer (ops/render_fast.py) builds its z-buffer with an
elementwise scatter-min of ~4 descriptors per visible voxel — the
measured TPU wall for such scatters is ~140M descriptors/s, which makes
the depth pass the dominant cost of frame-to-model tracking.  This
kernel inverts that: the z-buffer lives in VMEM for the whole pass
(full-image output block revisited by every grid step — sequential TPU
grid, so read-modify-write accumulation is safe), and each visible
block min-merges a [PH, PW] patch covering its projected footprint:

  patch[qv, qu] = min over the block's 512 voxels k of
                  dq_k  where (qv - lv_k) in {0, 1} and (qu - lu_k) in {0, 1}

i.e. the same 2x2 pixel footprint per voxel as the reference path
(render_fast.py splat pass 1), computed as a broadcast compare +
min-reduce on the VPU instead of a scatter.  Blocks whose footprint
exceeds the aligned patch window (very close to the camera) fall back
to the XLA scatter on a small compacted set; the merged result is
bit-identical to the XLA z-buffer (test_splat_kernel.py).

Alignment: patch window origins are tile-aligned (v0 % 8 == 0,
u0 % 128 == 0 — Mosaic dynamic-slice rule) and the z-buffer is padded
to multiples of (8, 128) and cropped after.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2**30  # python int: jnp constants would be captured consts in the kernel
DEFAULT_PH = 32
DEFAULT_PW = 256


def _splat_kernel(
    # scalar prefetch
    u0_ref,  # [S] i32, 128-aligned patch window origin per block
    v0_ref,  # [S] i32, 8-aligned
    n_ref,  # [1] i32, number of live blocks (rest skipped)
    # inputs (blocked rows)
    lu_ref,  # [TB, 512] i32, window-relative voxel pixel x (floor)
    lv_ref,  # [TB, 512] i32, window-relative voxel pixel y (floor)
    dq_ref,  # [TB, 512] i32, quantized corrected depth (BIG = dead voxel)
    # output
    zbuf_ref,  # [HPAD, WPAD] i32, full image (same block every step)
    *,
    tb: int,
    ph: int,
    pw: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zbuf_ref[...] = jnp.full(zbuf_ref.shape, BIG, jnp.int32)

    for b in range(tb):
        idx = i * tb + b

        @pl.when(idx < n_ref[0])
        def _(b=b, idx=idx):
            u0 = pl.multiple_of(u0_ref[idx], 128)
            v0 = pl.multiple_of(v0_ref[idx], 8)
            lu = lu_ref[b]  # [512]
            lv = lv_ref[b]
            dq = dq_ref[b]
            cols = jax.lax.broadcasted_iota(jnp.int32, (512, pw), 1)
            mcol = (cols == lu[:, None]) | (cols == lu[:, None] + 1)
            rows = []
            for qv in range(ph):
                rmask = (lv == qv) | (lv == qv - 1)
                vals = jnp.where(rmask, dq, BIG)  # [512]
                rows.append(jnp.min(jnp.where(mcol, vals[:, None], BIG), axis=0))
            patch = jnp.stack(rows)  # [PH, PW]
            win = zbuf_ref[pl.ds(v0, ph), pl.ds(u0, pw)]
            zbuf_ref[pl.ds(v0, ph), pl.ds(u0, pw)] = jnp.minimum(win, patch)


@functools.partial(
    jax.jit,
    static_argnames=("hpad", "wpad", "ph", "pw", "tb", "interpret"),
)
def splat_zbuf_rows(
    lu: jnp.ndarray,  # [S, 512] i32 window-relative
    lv: jnp.ndarray,  # [S, 512] i32
    dq: jnp.ndarray,  # [S, 512] i32 (BIG = dead)
    u0: jnp.ndarray,  # [S] i32 aligned window origins
    v0: jnp.ndarray,  # [S] i32
    n_real: jnp.ndarray,  # [] or [1] i32
    hpad: int,
    wpad: int,
    ph: int = DEFAULT_PH,
    pw: int = DEFAULT_PW,
    tb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Min-merge per-block footprint patches into a [hpad, wpad] z-buffer."""
    s = lu.shape[0]
    assert s % tb == 0 and hpad % 8 == 0 and wpad % 128 == 0
    assert ph % 8 == 0 and pw % 128 == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s // tb,),
        in_specs=[
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, 512), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((hpad, wpad), lambda i, *_: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_splat_kernel, tb=tb, ph=ph, pw=pw),
        out_shape=jax.ShapeDtypeStruct((hpad, wpad), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(u0, v0, n_real.reshape(1), lu, lv, dq)


def _pad_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class _SplatPrep(NamedTuple):
    """Block data prepared for the patch kernels + the overflow fallback."""

    lu: jnp.ndarray  # [S, 512] window-relative floor pixel x (kept order)
    lv: jnp.ndarray  # [S, 512]
    dq_k: jnp.ndarray  # [S, 512] quantized depth, BIG = dead (kept order)
    u0o: jnp.ndarray  # [S] aligned window origins (kept order)
    v0o: jnp.ndarray  # [S]
    n_real: jnp.ndarray  # [] live kept-block count
    order: jnp.ndarray  # [S] block permutation (kept first)
    lorder: jnp.ndarray  # [cap] leftover block indices (into original rows)
    lpix: jnp.ndarray  # [4*cap*512] leftover footprint pixels (n_pix = dead)
    ldqs: jnp.ndarray  # [4*cap*512] leftover quantized depths
    hpad: int
    wpad: int


def _prep_splat_blocks(
    vol, cam, cam_T_world, max_depth, band, overflow_cap, ph, pw,
    surf_cap=None,
) -> Tuple[_SplatPrep, jnp.ndarray]:
    """Shared host-side prep: project, bbox per block, split into
    patch-kernel blocks (footprint fits an aligned [ph, pw] window) and
    overflow blocks (compacted XLA scatter, capped).  Returns the prep
    plus the visible-set pool indices for payload packing."""
    from ..render_fast import _project_for_splat

    cfg = vol.cfg
    hgt, wid = cam.img_h, cam.img_w
    n_pix = hgt * wid

    uf, vf, depth_q, surf, vis = _project_for_splat(
        vol, cam, cam_T_world, max_depth, band, surf_cap
    )  # [V,512] f32, f32, i32, bool; VisibleSet

    u0px = jnp.floor(uf).astype(jnp.int32)
    v0px = jnp.floor(vf).astype(jnp.int32)
    dq = jnp.where(surf, depth_q, BIG)

    # per-block footprint bbox over live voxels (footprint = +1 px in each
    # direction for the 2x2 splat)
    bu_min = jnp.min(jnp.where(surf, u0px, BIG), axis=1)
    bu_max = jnp.max(jnp.where(surf, u0px + 1, -BIG), axis=1)
    bv_min = jnp.min(jnp.where(surf, v0px, BIG), axis=1)
    bv_max = jnp.max(jnp.where(surf, v0px + 1, -BIG), axis=1)
    nonempty = vis.mask & (bu_min <= bu_max)

    hpad = _pad_up(hgt + 1, max(ph, 8))
    wpad = _pad_up(wid + 1, max(pw, 128))
    u0b = jnp.clip((bu_min >> 7) << 7, 0, wpad - pw)
    v0b = jnp.clip((bv_min >> 3) << 3, 0, hpad - ph)
    fits = (
        (bu_min >= u0b)
        & (bu_max < u0b + pw)
        & (bv_min >= v0b)
        & (bv_max < v0b + ph)
        & (bu_min >= 0)
        & (bv_min >= 0)
    )
    keep = nonempty & fits
    leftover = nonempty & ~fits

    # compact kept blocks to the front (stable), pass live count
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    n_real = jnp.sum(keep).astype(jnp.int32)
    lu = jnp.take(u0px - u0b[:, None], order, axis=0)
    lv = jnp.take(v0px - v0b[:, None], order, axis=0)
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
        u0o=jnp.take(u0b, order), v0o=jnp.take(v0b, order),
        n_real=n_real, order=order, lorder=lorder,
        lpix=jnp.concatenate(pix4), ldqs=jnp.concatenate(dq4),
        hpad=hpad, wpad=wpad,
    )
    pool = jnp.clip(vis.pool_idx, 0, cfg.num_blocks - 1)
    return prep, pool


def _zbuf_pallas(prep: _SplatPrep, hgt, wid, ph, pw, tb, interpret):
    """Kernel pass + overflow scatter -> merged flat z-buffer [n_pix]."""
    zpad = splat_zbuf_rows(
        prep.lu, prep.lv, prep.dq_k, prep.u0o, prep.v0o, prep.n_real,
        prep.hpad, prep.wpad, ph=ph, pw=pw, tb=tb, interpret=interpret,
    )
    zbuf = zpad[:hgt, :wid].reshape(-1)
    return zbuf.at[prep.lpix].min(prep.ldqs, mode="drop")


def splat_depth_pallas(
    vol,
    cam,
    cam_T_world,
    max_depth: float,
    band: float = 1.25,
    overflow_cap: int = 512,
    ph: int = DEFAULT_PH,
    pw: int = DEFAULT_PW,
    tb: int = 8,
    interpret: bool = False,
    surf_cap=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth + hit images via the Pallas splat z-buffer.

    Matches render_fast.splat_render's pass-1 z-buffer exactly (same
    projection, band, 2x2 footprint, depth quantization).  Blocks whose
    footprint does not fit an aligned [ph, pw] window (or that touch
    negative pixel coords) go through a compacted XLA scatter capped at
    `overflow_cap` blocks; blocks beyond the cap are dropped (they only
    occur when the camera is inside/next to geometry).
    """
    hgt, wid = cam.img_h, cam.img_w
    if surf_cap is None:
        from ..render_fast import DEFAULT_SURF_CAP

        surf_cap = DEFAULT_SURF_CAP
    prep, _pool = _prep_splat_blocks(
        vol, cam, cam_T_world, max_depth, band, overflow_cap, ph, pw,
        surf_cap,
    )
    zbuf = _zbuf_pallas(prep, hgt, wid, ph, pw, tb, interpret)
    hit = (zbuf < BIG).reshape(hgt, wid)
    depth = jnp.where(hit, zbuf.reshape(hgt, wid).astype(jnp.float32) / 4096.0, 0.0)
    return depth, hit


# ----------------------------------------------------------------------
# Pass 2: payload (rgb + ht probability) patch kernel
# ----------------------------------------------------------------------
_PMIN = -(2**31)  # int32 sentinel == (uint32 0) ^ 0x80000000


def _payload_kernel(
    # scalar prefetch
    u0_ref,
    v0_ref,
    n_ref,
    # inputs
    lu_ref,  # [TB, 512] i32
    lv_ref,  # [TB, 512] i32
    dq_ref,  # [TB, 512] i32 (BIG = dead)
    pk_ref,  # [TB, 512] i32 sign-flipped packed payload
    zbuf_ref,  # [HPAD, WPAD] i32 final z-buffer (read-only, full block)
    # output
    pbuf_ref,  # [HPAD, WPAD] i32 sign-flipped payload buffer
    *,
    tb: int,
    ph: int,
    pw: int,
):
    """Winner-takes-max payload splat: a voxel paints a patch pixel only
    when its quantized depth equals the final z-buffer there (same rule
    as the XLA pass 2); ties resolve by max packed value.  uint32
    ordering is preserved by the ^0x80000000 sign flip on the host."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pbuf_ref[...] = jnp.full(pbuf_ref.shape, _PMIN, jnp.int32)

    for b in range(tb):
        idx = i * tb + b

        @pl.when(idx < n_ref[0])
        def _(b=b, idx=idx):
            u0 = pl.multiple_of(u0_ref[idx], 128)
            v0 = pl.multiple_of(v0_ref[idx], 8)
            lu = lu_ref[b]
            lv = lv_ref[b]
            dq = dq_ref[b]
            pk = pk_ref[b]
            zwin = zbuf_ref[pl.ds(v0, ph), pl.ds(u0, pw)]  # [PH, PW]
            cols = jax.lax.broadcasted_iota(jnp.int32, (512, pw), 1)
            mcol = (cols == lu[:, None]) | (cols == lu[:, None] + 1)
            rows = []
            for qv in range(ph):
                rmask = (lv == qv) | (lv == qv - 1)
                vdq = jnp.where(rmask, dq, BIG)  # [512]
                win = mcol & (vdq[:, None] == zwin[qv][None, :]) & (
                    vdq[:, None] < BIG
                )
                rows.append(
                    jnp.max(jnp.where(win, pk[:, None], _PMIN), axis=0)
                )
            patch = jnp.stack(rows)  # [PH, PW]
            cur = pbuf_ref[pl.ds(v0, ph), pl.ds(u0, pw)]
            pbuf_ref[pl.ds(v0, ph), pl.ds(u0, pw)] = jnp.maximum(cur, patch)


@functools.partial(
    jax.jit,
    static_argnames=("hpad", "wpad", "ph", "pw", "tb", "interpret"),
)
def splat_payload_rows(
    lu, lv, dq, pk, u0, v0, n_real, zpad,
    hpad: int, wpad: int,
    ph: int = DEFAULT_PH, pw: int = DEFAULT_PW, tb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Max-merge winner payload patches against the final padded z-buffer."""
    s = lu.shape[0]
    assert s % tb == 0
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
    )
    return pl.pallas_call(
        functools.partial(_payload_kernel, tb=tb, ph=ph, pw=pw),
        out_shape=jax.ShapeDtypeStruct((hpad, wpad), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(u0, v0, n_real.reshape(1), lu, lv, dq, pk, zpad)


def splat_render_pallas(
    vol,
    cam,
    cam_T_world,
    max_depth: float,
    band: float = 1.25,
    overflow_cap: int = 512,
    ph: int = DEFAULT_PH,
    pw: int = DEFAULT_PW,
    tb: int = 8,
    interpret: bool = False,
    surf_cap=None,
):
    """Full splat render (rgba + normal + depth + hit) without scatters:
    the z-buffer and payload passes both run as patch kernels, with the
    same capped XLA fallback for oversized footprints.  Output equals
    render_fast.splat_render bit-for-bit (shared projection, packing,
    winner rule, and image assembly)."""
    from ..render_fast import images_from_buffers, pack_payload

    hgt, wid = cam.img_h, cam.img_w
    n_pix = hgt * wid
    if surf_cap is None:
        from ..render_fast import DEFAULT_SURF_CAP

        surf_cap = DEFAULT_SURF_CAP
    prep, pool = _prep_splat_blocks(
        vol, cam, cam_T_world, max_depth, band, overflow_cap, ph, pw,
        surf_cap,
    )
    zbuf = _zbuf_pallas(prep, hgt, wid, ph, pw, tb, interpret)

    # re-pad the merged z-buffer so the payload kernel sees the leftover
    # depths too (pad area stays BIG => never matched)
    zpad = jnp.full((prep.hpad, prep.wpad), BIG, jnp.int32)
    zpad = zpad.at[:hgt, :wid].set(zbuf.reshape(hgt, wid))

    packed = pack_payload(vol.rgb[pool].reshape(-1, 3), vol.prob[pool].reshape(-1))
    pk_flip = jax.lax.bitcast_convert_type(
        packed ^ jnp.uint32(0x80000000), jnp.int32
    ).reshape(pool.shape[0], 512)
    ppad = splat_payload_rows(
        prep.lu, prep.lv, prep.dq_k,
        jnp.take(pk_flip, prep.order, axis=0),
        prep.u0o, prep.v0o, prep.n_real, zpad,
        prep.hpad, prep.wpad, ph=ph, pw=pw, tb=tb, interpret=interpret,
    )
    pbuf = jax.lax.bitcast_convert_type(
        ppad[:hgt, :wid].reshape(-1), jnp.uint32
    ) ^ jnp.uint32(0x80000000)

    # leftover payload: winner check against the final z-buffer
    won = (prep.lpix < n_pix) & (
        prep.ldqs == zbuf[jnp.clip(prep.lpix, 0, n_pix - 1)]
    )
    lpk = jnp.tile(jnp.take(packed.reshape(-1, 512), prep.lorder, axis=0).reshape(-1), 4)
    wpix = jnp.where(won, prep.lpix, n_pix)
    pbuf = pbuf.at[wpix].max(lpk, mode="drop")

    return images_from_buffers(zbuf, pbuf, cam)
