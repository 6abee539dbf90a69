"""Hardware kernel-parity checks (VERDICT r2 #7).

The f32-MXU miscompile found in round 2 (output lanes broadcasting a
single element) is the class of failure these checks exist for: silent
numerical corruption that only appears on real hardware.  Each check
runs a Pallas kernel against its XLA reference ON THE CURRENT BACKEND
and returns (ok, max_err, detail).  `verify_all` is the <60 s gate run
by scripts/tpu_verify.py and by bench.py before it trusts the kernels
for the headline number.

All checks are backend-agnostic (they interpret on CPU), so the same
suite doubles as a CPU sanity check.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Tuple

import numpy as np


def _interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------------
def verify_sample_kernel(
    w: int = 640, h: int = 480, v_blocks: int = 256, splits: int = 3,
    seed: int = 0,
) -> Tuple[bool, float, str]:
    """Pallas patch sampler vs a plain XLA gather on random in-patch
    indices.  splits=3 must be bit-exact; splits=2 within 2^-15 rel."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas.sample_kernel import sample_patches

    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(0, 255, (h, w, 8)).astype(np.float32))
    u0 = rng.integers(0, w - 32, v_blocks).astype(np.int32)
    v0 = rng.integers(0, h - 24, v_blocks).astype(np.int32)
    u = (u0[:, None] + rng.integers(0, 16, (v_blocks, 512))).astype(np.int32)
    v = (v0[:, None] + rng.integers(0, 16, (v_blocks, 512))).astype(np.int32)
    s, valid = sample_patches(
        img, jnp.asarray(u0), jnp.asarray(v0), jnp.asarray(u), jnp.asarray(v),
        splits=splits, interpret=_interpret(),
    )
    ref = np.asarray(img)[v, u]
    val = np.asarray(valid)
    if val.mean() < 0.99:
        return False, 1.0, f"validity {val.mean():.3f} < 0.99"
    got = np.asarray(s)[val]
    want = ref[val]
    if splits >= 3:
        err = float(np.abs(got - want).max())
        return err == 0.0, err, "bit-exact required"
    rel = float((np.abs(got - want) / np.maximum(np.abs(want), 1e-3)).max())
    return rel < 2 ** -15, rel, "rel err < 2^-15 required"


def verify_count_exit(seed: int = 1) -> Tuple[bool, float, str]:
    """Rows below `count` must be identical with and without early exit."""
    import jax.numpy as jnp

    from ..ops.pallas.sample_kernel import sample_patches

    rng = np.random.default_rng(seed)
    w, h, vb = 320, 240, 64
    img = jnp.asarray(rng.uniform(0, 255, (h, w, 8)).astype(np.float32))
    u0 = rng.integers(0, w - 32, vb).astype(np.int32)
    v0 = rng.integers(0, h - 24, vb).astype(np.int32)
    u = (u0[:, None] + rng.integers(0, 16, (vb, 512))).astype(np.int32)
    v = (v0[:, None] + rng.integers(0, 16, (vb, 512))).astype(np.int32)
    args = (img, jnp.asarray(u0), jnp.asarray(v0), jnp.asarray(u), jnp.asarray(v))
    full, _ = sample_patches(*args, interpret=_interpret())
    cut, _ = sample_patches(*args, count=jnp.int32(37), interpret=_interpret())
    # tile size 16 -> rows [0, 48) live with count=37 (ceil to tile)
    err = float(np.abs(np.asarray(full)[:32] - np.asarray(cut)[:32]).max())
    return err == 0.0, err, "live rows must match bit-exactly"


def _small_scene_step(
    sampler: str,
    splits: int = 3,
    index_hints: bool = True,
    scatter_window_log2: int = 0,
):
    """One integrate step on a small synthetic scene under `sampler`."""
    import jax
    import jax.numpy as jnp

    from ..config import TSDFConfig
    from ..core.geometry import SE3, CameraIntrinsics, CameraParams
    from ..core.state import TSDFVolume
    from ..ops.integrate import FrameInput, integrate

    w, h = 160, 128
    K = (131.3, 131.3, 79.9, 63.9)
    # voxel/depth chosen so block footprints stay well inside the
    # sampler patch: fx * block * sqrt(3) / depth ~= 7 px at 2 m —
    # the pallas path must not hit its (legitimate, fail-open)
    # patch-overflow skip here, else parity vs gather can't be exact
    cfg = TSDFConfig(
        voxel_size=0.008, truncation=0.048,
        num_blocks_log2=12, max_candidates=8192, max_visible=2048,
        max_new_per_round=2048, backend="dense", grid_log2=6,
        sampler=sampler, sampler_splits=splits, index_hints=index_hints,
        scatter_window_log2=scatter_window_log2,
    )
    rng = np.random.default_rng(7)
    depth = (2.0 + 0.8 * rng.random((h, w))).astype(np.float32)
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    ht = rng.random((h, w)).astype(np.float32)
    frame = FrameInput(
        rgb=jnp.asarray(rgb), depth=jnp.asarray(depth),
        ht=jnp.asarray(ht), lt=jnp.asarray(1.0 - ht),
    )
    cam = CameraParams.create(CameraIntrinsics.create(*K), h, w)
    pose = SE3.from_matrix(jnp.eye(4, dtype=jnp.float32))
    vol = TSDFVolume.create(cfg)
    step = jax.jit(
        lambda v: integrate(v, frame, cam, pose, 4.0, return_stats=True),
        donate_argnums=0,
    )
    vol, _ = step(vol)
    vol, stats = step(vol)  # second pass exercises nonzero weights
    jax.block_until_ready(vol.tsdf)
    skipped = int(np.asarray(stats.sampler_skipped))
    assert skipped == 0, (
        f"verify scene hit the patch-overflow skip ({skipped} blocks): "
        "shrink voxels or increase depth so parity can be exact"
    )
    return vol


def verify_integrate_parity(splits: int = 3) -> Tuple[bool, float, str]:
    """Full integrate: pallas sampler vs XLA gather, voxel-for-voxel."""
    a = _small_scene_step("gather")
    b = _small_scene_step("pallas", splits=splits)
    terr = float(np.abs(np.asarray(a.tsdf) - np.asarray(b.tsdf)).max())
    werr = int(np.abs(
        np.asarray(a.weight, np.int32) - np.asarray(b.weight, np.int32)
    ).max())
    rerr = int(np.abs(
        np.asarray(a.rgb, np.int32) - np.asarray(b.rgb, np.int32)
    ).max())
    perr = float(np.abs(np.asarray(a.prob) - np.asarray(b.prob)).max())
    if splits >= 3:
        ok = terr == 0.0 and werr == 0 and rerr == 0 and perr == 0.0
        return ok, max(terr, perr, float(rerr), float(werr)), "bit-exact"
    ok = terr < 1e-4 and werr == 0 and rerr <= 1 and perr < 1e-4
    return ok, max(terr, perr), "tolerance mode"


def verify_index_hints() -> Tuple[bool, float, str]:
    """integrate with indices_are_sorted/unique_indices promises vs
    without: the promises provably hold (see TSDFConfig.index_hints), so
    any divergence means this backend's hinted gather/scatter emitters
    miscompile and the flag must be turned off."""
    a = _small_scene_step("gather", index_hints=True)
    b = _small_scene_step("gather", index_hints=False)
    terr = float(np.abs(np.asarray(a.tsdf) - np.asarray(b.tsdf)).max())
    rerr = int(
        np.abs(
            np.asarray(a.rgbw, np.int64) - np.asarray(b.rgbw, np.int64)
        ).max()
    )
    perr = float(np.abs(np.asarray(a.prob) - np.asarray(b.prob)).max())
    ok = terr == 0.0 and rerr == 0 and perr == 0.0
    return ok, max(terr, float(rerr), perr), "hints on/off bit-exact"


def verify_scatter_window() -> Tuple[bool, float, str]:
    """Windowed vs plain fuse scatter, two checks.

    (1) Placement: with the payload values as fixed INPUTS the windowed
    routing must write a bit-identical pool — any diff means the
    dynamic_slice / windowed scatter / dynamic_update_slice lowering
    miscompiles on this backend and the flag must stay off.

    (2) End-to-end integrate: the fuse math is a shared subgraph of two
    DIFFERENT programs, which XLA may compile with different FMA /
    division contractions (observed ~14 ulp on XLA:CPU even behind
    optimization_barrier fences) — so float drift is bounded, not
    pinned to zero; integral payload bytes (rgbw) may round one step
    differently on exact .5 boundaries."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from ..config import TSDFConfig
    from ..core.state import TSDFVolume
    from ..ops.integrate import VisibleSet, _scatter_payload_rows

    # --- (1) placement, bit-exact ---
    rng = np.random.default_rng(11)
    base_cfg = TSDFConfig(
        voxel_size=0.008, truncation=0.048, num_blocks_log2=12,
        max_candidates=2048, max_visible=512, max_new_per_round=512,
        backend="dense", grid_log2=6,
    )
    vcap, bv = base_cfg.max_visible, base_cfg.block_volume
    n_live = vcap - 5
    pool = np.sort(rng.choice(900, n_live, replace=False)).astype(np.int32)
    pool_full = np.concatenate(
        [pool, np.full(vcap - n_live, base_cfg.num_blocks, np.int32)]
    )
    mask = np.arange(vcap) < n_live
    tsdf_w = rng.standard_normal((vcap, bv)).astype(np.float32)
    rgbw_w = rng.integers(0, 2 ** 32, (vcap, bv), dtype=np.uint32)
    prob_w = rng.random((vcap, bv)).astype(np.float32)

    def place(wlog2):
        cfg = _dc.replace(base_cfg, scatter_window_log2=wlog2)
        vol = TSDFVolume.create(cfg)
        vis = VisibleSet(
            entry_idx=jnp.full((vcap,), cfg.num_entries, jnp.int32),
            block_pos=jnp.zeros((vcap, 3), jnp.int32),
            pool_idx=jnp.asarray(pool_full),
            mask=jnp.asarray(mask),
            count=jnp.int32(n_live),
        )
        out = jax.jit(_scatter_payload_rows)(
            vol, vis, jnp.asarray(tsdf_w), jnp.asarray(rgbw_w),
            jnp.asarray(prob_w),
        )
        return np.asarray(out.tsdf), np.asarray(out.rgbw), np.asarray(out.prob)

    ref = place(0)
    for wlog2 in (10, 4):  # windowed branch; in-program fallback branch
        got = place(wlog2)
        for x, y in zip(ref, got):
            if not np.array_equal(x, y):
                return False, float("inf"), f"placement diverged (w={wlog2})"

    # --- (2) end-to-end values, ulp-bounded ---
    a = _small_scene_step("gather", scatter_window_log2=0)
    b = _small_scene_step("gather", scatter_window_log2=10)
    terr = float(np.abs(np.asarray(a.tsdf) - np.asarray(b.tsdf)).max())
    ra, rb = np.asarray(a.rgbw, np.int64), np.asarray(b.rgbw, np.int64)
    rerr = 0
    for shift in (0, 8, 16):  # r/g/b bytes: .5-boundary rounding slack
        rerr = max(rerr, int(np.abs((ra >> shift) % 256 - (rb >> shift) % 256).max()))
    # the WEIGHT byte is integral accumulation — bit-exact, no rounding
    # excuse (ADVICE r3: a +-1 tolerance here would wave through a real
    # weight-accumulation miscompile; the CPU contract test pins it too)
    werr = int(np.abs((ra >> 24) % 256 - (rb >> 24) % 256).max())
    perr = float(np.abs(np.asarray(a.prob) - np.asarray(b.prob)).max())
    ok = terr < 2e-6 and rerr <= 1 and werr == 0 and perr < 2e-6
    return ok, max(terr, perr), "placement bit-exact; values ulp-bounded"


def verify_fused_kernel() -> Tuple[bool, float, str]:
    """Fused sample+math kernel vs the gather path (~1 ulp fma slack;
    rgb may round one step differently on exact .5 boundaries)."""
    a = _small_scene_step("gather")
    b = _small_scene_step("pallas_fused")
    terr = float(np.abs(np.asarray(a.tsdf) - np.asarray(b.tsdf)).max())
    rerr = int(np.abs(
        np.asarray(a.rgb, np.int32) - np.asarray(b.rgb, np.int32)
    ).max())
    perr = float(np.abs(np.asarray(a.prob) - np.asarray(b.prob)).max())
    ok = terr < 1e-5 and rerr <= 1 and perr < 1e-5
    return ok, max(terr, perr), "~1 ulp slack"


def verify_splat() -> Tuple[bool, float, str]:
    """Pallas splat renderer vs the XLA scatter splat: bit-identical."""
    import jax
    import jax.numpy as jnp

    from ..core.geometry import SE3, CameraIntrinsics, CameraParams
    from ..ops.pallas.splat_kernel import splat_render_pallas
    from ..ops.render_fast import splat_render

    vol = _small_scene_step("gather")
    w, h = 160, 128
    cam = CameraParams.create(
        CameraIntrinsics.create(131.3, 131.3, 79.9, 63.9), h, w
    )
    pose = SE3.from_matrix(jnp.eye(4, dtype=jnp.float32))
    interp = _interpret()
    a = jax.jit(lambda v: splat_render(v, cam, pose, 4.0))(vol)
    b = jax.jit(
        lambda v: splat_render_pallas(v, cam, pose, 4.0, interpret=interp)
    )(vol)
    err = max(
        int(np.abs(np.asarray(a.rgba, np.int32) - np.asarray(b.rgba, np.int32)).max()),
        int(np.abs(np.asarray(a.normal, np.int32) - np.asarray(b.normal, np.int32)).max()),
    )
    derr = float(np.abs(np.asarray(a.depth) - np.asarray(b.depth)).max())
    return err == 0 and derr == 0.0, float(err) + derr, "bit-identical"


CHECKS: List[Tuple[str, Callable[[], Tuple[bool, float, str]]]] = [
    ("sample_kernel splits=3 (bit-exact)", lambda: verify_sample_kernel(splits=3)),
    ("sample_kernel splits=2 (tolerance)", lambda: verify_sample_kernel(splits=2)),
    ("index_hints on/off (bit-exact)", verify_index_hints),
    ("scatter_window on/off (placement exact, values ulp-bounded)",
     verify_scatter_window),
    # 1920x1080 exceeds the whole-image-in-VMEM threshold, forcing the
    # double-buffered patch-DMA path (the reference's max frame size,
    # voxel_tsdf.cu:10-12) — without this the DMA path has zero
    # hardware coverage since the VMEM path took over at bench scale
    (
        "sample_kernel 1080p patch-DMA path (bit-exact)",
        lambda: verify_sample_kernel(w=1920, h=1080, v_blocks=64, splits=3),
    ),
    ("count early-exit", verify_count_exit),
    ("integrate pallas vs gather (bit-exact)", verify_integrate_parity),
    ("integrate fused kernel (~1 ulp)", verify_fused_kernel),
    ("splat pallas vs xla (bit-identical)", verify_splat),
]


def verify_all(verbose: bool = True) -> bool:
    import sys
    import time

    all_ok = True
    for name, fn in CHECKS:
        t0 = time.perf_counter()
        try:
            ok, err, detail = fn()
        except Exception as e:  # pragma: no cover
            ok, err, detail = False, float("nan"), f"EXCEPTION: {e}"
        dt = time.perf_counter() - t0
        all_ok &= ok
        if verbose:
            print(
                f"[tpu_verify] {'PASS' if ok else 'FAIL'}  {name}: "
                f"err={err:.3g} ({detail}) [{dt:.1f}s]",
                file=sys.stderr, flush=True,
            )
    return all_ok
