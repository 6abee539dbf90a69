#!/usr/bin/env python
"""Run the reconstruction HTTP service.

  python apps/serve.py --port 8800 --mode slam --voxel 0.01
  # clients: POST /frame npz{rgb, depth, timestamp_ms[, pose]},
  #          GET /stats /pose /query /mesh /render
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8800)
    ap.add_argument("--mode", choices=["disinf", "slam"], default="disinf")
    ap.add_argument("--fx", type=float, default=517.3)
    ap.add_argument("--fy", type=float, default=516.5)
    ap.add_argument("--cx", type=float, default=318.6)
    ap.add_argument("--cy", type=float, default=255.3)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--voxel", type=float, default=0.01)
    ap.add_argument("--trunc", type=float, default=0.06)
    ap.add_argument("--max-depth", type=float, default=4.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from disinfect_slam_tpu.utils.cache import enable as _cache

    _cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from disinfect_slam_tpu.systems.server import ReconstructionService, make_server

    intr = (args.fx, args.fy, args.cx, args.cy)
    if args.mode == "slam":
        from disinfect_slam_tpu.systems.dense_slam import DenseSLAM

        system = DenseSLAM(
            intr, args.height, args.width,
            voxel_size=args.voxel, truncation=args.trunc, max_depth=args.max_depth,
        )
    else:
        from disinfect_slam_tpu.systems.disinf_system import DISINFSystem

        system = DISINFSystem(
            intr, voxel_size=args.voxel, truncation=args.trunc,
            max_depth=args.max_depth, half_scale=False,
        )

    svc = ReconstructionService(system, mode=args.mode)
    httpd = make_server(svc, args.host, args.port)
    print(f"[serve] {args.mode} reconstruction on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
