#!/usr/bin/env python
"""Train the high-touch/low-touch segmentation model.

The reference consumes a pre-trained TorchScript model and ships no
training pipeline; this closes that gap.  Data: directories of
{name}_rgb.png + {name}_ht.png + {name}_no_ht.png (16-bit probability
masks, the dataset layout the FrameLogger/offline replay already use),
or --synthetic for a procedural sanity run.

Supports single-chip and multi-chip (data+tensor parallel) training:
  python apps/train_seg.py --synthetic --steps 200 --out seg.msgpack
  python apps/train_seg.py --data DIR --steps 5000 --mesh 2x4
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_batch(rng, n, h, w):
    """Blobs of 'high touch' on textured background."""
    imgs = rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32)
    labels = np.zeros((n, h, w, 2), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        cx, cy = rng.uniform(0.2, 0.8) * w, rng.uniform(0.2, 0.8) * h
        r = rng.uniform(0.1, 0.25) * min(h, w)
        mask = ((xx - cx) ** 2 + (yy - cy) ** 2) < r * r
        imgs[i][mask] = imgs[i][mask] * 0.3 + np.array([0.8, 0.2, 0.2]) * 0.7
        labels[i, ..., 0] = mask
        labels[i, ..., 1] = ~mask
    return imgs, labels


def load_dataset(data_dir, h, w):
    import cv2

    xs, ys = [], []
    for rgb_path in sorted(glob.glob(os.path.join(data_dir, "*_rgb.png"))):
        base = rgb_path[: -len("_rgb.png")]
        ht_p, lt_p = base + "_ht.png", base + "_no_ht.png"
        if not (os.path.exists(ht_p) and os.path.exists(lt_p)):
            continue
        rgb = cv2.cvtColor(cv2.imread(rgb_path), cv2.COLOR_BGR2RGB)
        ht = cv2.imread(ht_p, cv2.IMREAD_UNCHANGED).astype(np.float32) / 65535.0
        lt = cv2.imread(lt_p, cv2.IMREAD_UNCHANGED).astype(np.float32) / 65535.0
        rgb = cv2.resize(rgb, (w, h)).astype(np.float32) / 255.0
        ht = cv2.resize(ht, (w, h))
        lt = cv2.resize(lt, (w, h))
        xs.append(rgb)
        ys.append(np.stack([ht, lt], -1))
    return np.stack(xs), np.stack(ys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", help="dataset dir ({id}_rgb/_ht/_no_ht.png)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--widths", default="32,64,128,256")
    ap.add_argument("--out", default="seg_checkpoint.msgpack")
    ap.add_argument("--mesh", help="dp x tp mesh, e.g. 2x4 (default single chip)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from disinfect_slam_tpu.utils.cache import enable as _cache

    _cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from disinfect_slam_tpu.models.segmentation import create_model
    from disinfect_slam_tpu.models.train import (
        TrainState,
        create_train_state,
        make_train_step,
        save_checkpoint,
    )

    widths = tuple(int(x) for x in args.widths.split(","))
    model = create_model(widths=widths)
    rng = np.random.default_rng(0)

    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), lr=args.lr, h=args.height, w=args.width
    )

    if args.mesh:
        from disinfect_slam_tpu.parallel.seg_parallel import (
            make_mesh_2d,
            make_sharded_train_step,
            shard_params,
        )

        dp, tp = (int(x) for x in args.mesh.split("x"))
        mesh = make_mesh_2d(dp * tp, data=dp)
        params = shard_params(state.params, mesh)
        state = TrainState(params, tx.init(params), state.step)
        step = make_sharded_train_step(model, tx, mesh)
        print(f"[train] mesh {mesh.devices.shape} over {mesh.devices.size} devices")
    else:
        step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    if args.data:
        xs, ys = load_dataset(args.data, args.height, args.width)
        print(f"[train] {len(xs)} labeled frames from {args.data}")
    else:
        xs = ys = None
        print("[train] synthetic blob dataset")

    t0 = time.perf_counter()
    for i in range(args.steps):
        if xs is None:
            bx, by = synthetic_batch(rng, args.batch, args.height, args.width)
        else:
            idx = rng.integers(0, len(xs), args.batch)
            bx, by = xs[idx], ys[idx]
        state, loss = step(state, jnp.asarray(bx), jnp.asarray(by))
        if (i + 1) % 25 == 0 or i == 0:
            dt = time.perf_counter() - t0
            print(f"[train] step {i+1}/{args.steps} loss {float(loss):.4f} "
                  f"({(i+1)/dt:.1f} steps/s)")

    save_checkpoint(args.out, state)
    print(f"[train] saved {args.out}")


if __name__ == "__main__":
    main()
