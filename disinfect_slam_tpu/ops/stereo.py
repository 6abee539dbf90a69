"""Stereo disparity -> depth as batched XLA ops.

The reference's online pipeline is *driven* by a stereo camera but never
computes depth from it — ZEDNative::GetStereoFrame feeds rectified pairs
straight to SLAM (cameras/zed_native.cc:24-33 -> modules/slam_module.cc:
100-120) and depth comes from a separate RGBD sensor.  This module makes
stereo-only sensors first-class: rectified pairs (ops/image_ops.py) in,
metric depth out, so DenseSLAM / the TSDF pipeline can run without an
L515.

TPU-first design — no per-pixel loops, everything is a fused stack of
shifts, windowed reductions, and argmins over a static-size cost volume:

  - cost volume: zero-mean SAD over a (ph, pw) window, one lane-shifted
    image difference per disparity hypothesis, aggregated with a
    separable `lax.reduce_window` (the VPU eats these; no gathers).
  - winner-take-all argmin + parabolic sub-pixel refinement.
  - validity: left-right consistency (the right-view cost volume is a
    shear of the left one — no recompute), uniqueness ratio, and border
    masking.

depth = fx * baseline / disparity, the rectified-pinhole relation.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class StereoDepthResult(NamedTuple):
    depth: jnp.ndarray  # f32 [H, W] metres; 0 where invalid
    disparity: jnp.ndarray  # f32 [H, W] pixels (sub-pixel)
    valid: jnp.ndarray  # bool [H, W]


def _to_gray(img: jnp.ndarray) -> jnp.ndarray:
    if img.ndim == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
        return img @ w
    return img


def _box(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Windowed sum over the trailing two axes, SAME padding.

    Separable: two 1-D reduce_windows (ph + pw adds per output) instead
    of one 2-D window (ph * pw adds) — 4x fewer ops at the default 7x9
    patch, and XLA vectorizes 1-D windows better."""
    dims_v = (1,) * (x.ndim - 2) + (ph, 1)
    dims_h = (1,) * (x.ndim - 2) + (1, pw)
    x = jax.lax.reduce_window(
        x, jnp.asarray(0, x.dtype), jax.lax.add, dims_v, (1,) * x.ndim, "SAME"
    )
    return jax.lax.reduce_window(
        x, jnp.asarray(0, x.dtype), jax.lax.add, dims_h, (1,) * x.ndim, "SAME"
    )


def _shift_right_image(right: jnp.ndarray, d: int) -> jnp.ndarray:
    """right[y, x - d] with replicate padding on the left edge."""
    if d == 0:
        return right
    pad = jnp.repeat(right[:, :1], d, axis=1)
    return jnp.concatenate([pad, right[:, :-d]], axis=1)


def cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    max_disp: int,
    patch: Tuple[int, int] = (7, 9),
) -> jnp.ndarray:
    """Zero-mean SAD cost volume [D, H, W] for the *left* view.

    Zero-mean (local window mean subtracted per image) buys exposure/gain
    invariance for nearly the cost of plain SAD.
    """
    ph, pw = patch
    area = float(ph * pw)
    gl = _to_gray(left.astype(jnp.float32))
    gr = _to_gray(right.astype(jnp.float32))
    gl = gl - _box(gl, ph, pw) / area
    gr = gr - _box(gr, ph, pw) / area
    # [D, H, W] stack of shifted differences; D is static so XLA unrolls
    # the shifts into cheap slices
    diffs = jnp.stack(
        [jnp.abs(gl - _shift_right_image(gr, d)) for d in range(max_disp)]
    )
    return _box(diffs, ph, pw)


def _subpixel(cost: jnp.ndarray, best: jnp.ndarray) -> jnp.ndarray:
    """Parabola fit through (c[d-1], c[d], c[d+1]) around the argmin."""
    d_max = cost.shape[0] - 1
    bm = jnp.clip(best - 1, 0, d_max)
    bp = jnp.clip(best + 1, 0, d_max)
    c0 = jnp.take_along_axis(cost, bm[None], axis=0)[0]
    c1 = jnp.take_along_axis(cost, best[None], axis=0)[0]
    c2 = jnp.take_along_axis(cost, bp[None], axis=0)[0]
    denom = c0 - 2.0 * c1 + c2
    offset = jnp.where(
        jnp.abs(denom) > 1e-9, 0.5 * (c0 - c2) / jnp.maximum(denom, 1e-9), 0.0
    )
    return best.astype(jnp.float32) + jnp.clip(offset, -1.0, 1.0)


@partial(jax.jit, static_argnames=("max_disp", "patch", "lr_tol", "unique_ratio"))
def block_match(
    left: jnp.ndarray,
    right: jnp.ndarray,
    max_disp: int = 64,
    patch: Tuple[int, int] = (7, 9),
    lr_tol: float = 1.0,
    unique_ratio: float = 0.98,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense sub-pixel disparity for the left view + validity mask."""
    cost = cost_volume(left, right, max_disp, patch)  # [D, H, W]
    best = jnp.argmin(cost, axis=0).astype(jnp.int32)  # [H, W]
    disp = _subpixel(cost, best)

    # --- left-right consistency without recomputing: the right-view cost
    # volume is the left one sheared along x: cost_R[d, y, x] =
    # cost_L[d, y, x + d].  The shear is D static left-shifts (slices),
    # not a [D, H, W] gather — the gather form was ~20M descriptors
    # (~140 ms on v5e), the slices fuse for free.
    d_idx = jnp.arange(max_disp, dtype=jnp.int32)
    h, w = best.shape
    x_idx = jnp.arange(w, dtype=jnp.int32)
    cost_r = jnp.stack(
        [
            jnp.concatenate(
                [cost[d, :, d:], jnp.repeat(cost[d, :, -1:], d, axis=1)],
                axis=1,
            ) if d else cost[0]
            for d in range(max_disp)
        ]
    )
    best_r = jnp.argmin(cost_r, axis=0).astype(jnp.int32)  # [H, W]
    # disparity the right view assigns to the pixel that left matched
    match_x = jnp.clip(
        x_idx[None, :] - best, 0, w - 1
    )  # left pixel x matched right pixel x-d
    d_from_r = jnp.take_along_axis(best_r, match_x, axis=1)
    lr_ok = jnp.abs(d_from_r.astype(jnp.float32) - best.astype(jnp.float32)) <= lr_tol

    # --- uniqueness: the winning cost must beat the best cost outside a
    # +-1 disparity neighborhood by the given ratio
    c_best = jnp.take_along_axis(cost, best[None], axis=0)[0]
    near = jnp.abs(d_idx[:, None, None] - best[None]) <= 1
    c_second = jnp.min(jnp.where(near, jnp.inf, cost), axis=0)
    uniq_ok = c_best <= unique_ratio * c_second

    # --- borders: pixels whose hypothesis range ran off the image
    border_ok = x_idx[None, :] >= best
    valid = lr_ok & uniq_ok & border_ok & (best > 0) & (best < max_disp - 1)
    return disp, valid


# ----------------------------------------------------------------------
# Coarse-to-fine block matching (the frame-rate path)
# ----------------------------------------------------------------------
def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling; odd dims edge-pad to even first."""
    h, w = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, h % 2), (0, w % 2)), mode="edge")
    return x.reshape(x.shape[0] // 2, 2, x.shape[1] // 2, 2).mean(axis=(1, 3))


def _upsample2_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest 2x upsample cropped to (h, w) — the refinement band
    absorbs the half-pixel placement error of nearest vs linear."""
    return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)[:h, :w]


@partial(jax.jit, static_argnames=("max_disp", "patch", "levels", "band",
                                   "lr_tol", "unique_ratio"))
def block_match_pyramid(
    left: jnp.ndarray,
    right: jnp.ndarray,
    max_disp: int = 64,
    patch: Tuple[int, int] = (7, 9),
    levels: int = 2,
    band: int = 2,
    lr_tol: float = 1.0,
    unique_ratio: float = 0.98,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse-to-fine dense disparity: full-band match at 1/2^levels
    resolution, then a +-band refinement per finer level.

    Work vs the flat `block_match`: the full-band cost volume shrinks by
    8x per level (half the pixels in each dimension, half the
    hypotheses), and each refinement level touches only 2*band+1
    hypotheses instead of max_disp — at the default 64-disparity VGA
    config that is ~9x less cost-volume work.  The refinement's
    per-pixel data-dependent shift is a take_along_axis gather of the
    right image (one [H, W] gather per hypothesis, 2*band+1 total) —
    the only gathers in the path; everything else is convs and argmins.

    MEASURED CAVEAT (v5e, idle host, chained): the gathers are the wall
    on TPU — 33.1 ms vs the flat path's 24.6 ms at VGA/64, 100 vs 80 ms
    at HD/128 — TPU gathers run at ~140M descriptors/s while the flat
    path's shifts are free slices the VPU streams.  On TPU the flat
    matcher is therefore the default (`stereo_depth(method="flat")`);
    this path is the low-WORK formulation for gather-cheap backends
    (CPU) and the seed machinery for future per-tile static-shift
    kernels.

    Validity: the coarse level runs the full left-right + uniqueness
    battery of `block_match`; intermediate refinement levels apply the
    band-edge argmin check only, and the FINEST level adds band-local
    uniqueness, border, and disparity-range checks.  A pixel is valid
    iff its coarse seed was valid and every refinement kept a
    discriminative minimum.  Note the left-right consistency check runs
    only on the coarse seed: an occlusion visible only at full
    resolution can survive into the final mask if it also passes the
    band-edge and uniqueness guards — acceptable for TSDF fusion (a few
    wrong samples are outvoted by the weighted running average), and a
    fine-level band-local LR check is the known fix if invalid-pixel
    leakage ever shows up on real sensors.
    """
    ph, pw = patch
    area = float(ph * pw)
    gl = _to_gray(left.astype(jnp.float32))
    gr = _to_gray(right.astype(jnp.float32))
    pyr = [(gl, gr)]
    for _ in range(levels):
        pyr.append((_downsample2(pyr[-1][0]), _downsample2(pyr[-1][1])))

    # coarse seed: the flat matcher at the top of the pyramid
    cd = max(4, -(-max_disp // (1 << levels)))
    d, valid = block_match(
        pyr[-1][0], pyr[-1][1], max_disp=cd, patch=patch,
        lr_tol=lr_tol, unique_ratio=unique_ratio,
    )

    for lvl in range(levels - 1, -1, -1):
        # Discontinuity guard: where the seed's 3x3 neighborhood spread
        # exceeds the band, the true disparity of some pixel under this
        # seed is unreachable by the refinement — report no-measurement
        # (TSDF treats depth<=0 as no sample) instead of a confidently
        # wrong local minimum.  Coarse-to-fine's classic failure mode is
        # exactly these depth edges; smooth regions are unaffected.
        dmax = jax.lax.reduce_window(
            d, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
        dmin = -jax.lax.reduce_window(
            -d, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
        valid = valid & ((dmax - dmin) * 2.0 <= band)

        glz, grz = pyr[lvl]
        h, w = glz.shape
        d = 2.0 * _upsample2_to(d, h, w)
        valid = _upsample2_to(valid, h, w)
        glz = glz - _box(glz, ph, pw) / area
        grz = grz - _box(grz, ph, pw) / area
        di = jnp.round(d).astype(jnp.int32)
        x_idx = jnp.arange(w, dtype=jnp.int32)[None, :]
        costs = []
        for j in range(-band, band + 1):
            idx = jnp.clip(x_idx - di - j, 0, w - 1)
            rj = jnp.take_along_axis(grz, idx, axis=1)
            costs.append(jnp.abs(glz - rj))
        cost = _box(jnp.stack(costs), ph, pw)  # [2B+1, H, W]
        bj = jnp.argmin(cost, axis=0).astype(jnp.int32)
        d_int = di + bj - band
        # a minimum on the band edge means the seed error exceeded the
        # band (coarse matching near depth discontinuities): the true
        # minimum may lie outside — drop the pixel rather than report a
        # confidently-wrong disparity
        valid = valid & (bj > 0) & (bj < 2 * band)
        if lvl == 0:
            # sub-pixel + band-local uniqueness only at the finest level
            sub = _subpixel(cost, bj)  # band coords + offset
            d = d_int.astype(jnp.float32) + (sub - bj.astype(jnp.float32))
            j_rel = jnp.arange(2 * band + 1, dtype=jnp.int32)
            c_best = jnp.take_along_axis(cost, bj[None], axis=0)[0]
            near = jnp.abs(j_rel[:, None, None] - bj[None]) <= 1
            c_second = jnp.min(jnp.where(near, jnp.inf, cost), axis=0)
            uniq_ok = c_best <= unique_ratio * c_second
            border_ok = x_idx >= d_int
            valid = (
                valid & uniq_ok & border_ok
                & (d_int > 0) & (d_int < max_disp - 1)
            )
        else:
            d = d_int.astype(jnp.float32)
    return d, valid


def stereo_depth(
    left: jnp.ndarray,
    right: jnp.ndarray,
    fx: float,
    baseline_m: float,
    max_disp: int = 64,
    patch: Tuple[int, int] = (7, 9),
    min_depth: float = 0.1,
    max_depth: float = 10.0,
    method: str = "flat",
) -> StereoDepthResult:
    """Rectified stereo pair -> metric depth (left view).

    fx is the rectified focal length (StereoRectifier.rectified_intrinsics
    / the P2 matrix of stereo_rectifier.cc:78); baseline_m the camera
    separation (|t| of the extrinsics, e.g. 0.12 m for a ZED).

    method "flat" = full cost volume (the parity/oracle path);
    "pyramid" = coarse-to-fine (the frame-rate path, ~9x less work).
    """
    if method not in ("flat", "pyramid"):
        raise ValueError(
            f"stereo method must be 'flat' or 'pyramid', got {method!r}"
        )
    matcher = block_match_pyramid if method == "pyramid" else block_match
    disp, valid = matcher(left, right, max_disp=max_disp, patch=patch)
    depth = fx * baseline_m / jnp.maximum(disp, 1e-6)
    valid = valid & (depth >= min_depth) & (depth <= max_depth)
    return StereoDepthResult(
        depth=jnp.where(valid, depth, 0.0), disparity=disp, valid=valid
    )


class StereoDepthEstimator:
    """Host-facing wrapper: fixes the geometry once, jits per image size.

    Drop-in depth source: (left, right) uint8/float arrays -> depth in
    metres with invalid pixels zeroed (the TSDF integrate path already
    treats depth<=0 as no-measurement, matching the reference's zeroed
    masked depth, disinfect_slam.cc:55-58).
    """

    def __init__(
        self,
        fx: float,
        baseline_m: float,
        max_disp: int = 64,
        patch: Tuple[int, int] = (7, 9),
        min_depth: float = 0.1,
        max_depth: float = 10.0,
        method: str = "flat",
    ):
        if method not in ("flat", "pyramid"):
            raise ValueError(
                f"stereo method must be 'flat' or 'pyramid', got {method!r}"
            )
        self.fx = float(fx)
        self.baseline_m = float(baseline_m)
        self._fn = jax.jit(
            partial(
                stereo_depth,
                fx=float(fx),
                baseline_m=float(baseline_m),
                max_disp=max_disp,
                patch=patch,
                min_depth=min_depth,
                max_depth=max_depth,
                method=method,
            )
        )

    def depth_device(self, left, right) -> jnp.ndarray:
        """Device-resident depth: feed this straight into integrate /
        DenseSLAM without a host round trip (the D2H of a VGA depth map
        through the device tunnel costs more than the matching)."""
        return self._fn(jnp.asarray(left), jnp.asarray(right)).depth

    def __call__(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        res = self._fn(jnp.asarray(left), jnp.asarray(right))
        return np.asarray(res.depth)
