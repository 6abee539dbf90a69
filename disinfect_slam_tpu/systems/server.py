"""Reconstruction service: HTTP frontend over the DISINF/DenseSLAM stack.

Production-facing analogue of the reference's ROS topic surface
(ros_offline.cc subscribers/publishers) for environments without ROS:
clients stream RGB-D frames and pull poses, bbox voxel queries, meshes,
and rendered views.  Payloads are npz/np binary (no external
dependencies; stdlib http.server with a worker thread pool of 1 —
reconstruction itself is serialized by the TSDF queue anyway).

Endpoints:
  POST /frame   npz{rgb, depth, timestamp_ms[, ht, lt, pose]} -> {pose, ok}
  GET  /pose?t=MS                -> npz{pose}
  GET  /stats                    -> json
  GET  /query?bbox=x0,x1,y0,y1,z0,z1 -> npz{records [N,4]}
  GET  /mesh                     -> npz{verts, faces}
  GET  /render?fx=..&w=..&h=..   -> npz{rgba, normal, depth}
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..ops.gather import BoundingCube


class ReconstructionService:
    """Wraps either a DISINFSystem (poses provided) or DenseSLAM
    (self-tracking) behind frame-in / artifacts-out methods."""

    def __init__(self, system, mode: str = "disinf"):
        self.system = system
        self.mode = mode
        self._lock = threading.Lock()
        self.frames = 0

    def process_frame(self, rgb, depth, timestamp_ms, ht=None, lt=None, pose=None):
        with self._lock:
            self.frames += 1
            if self.mode == "slam":
                est, ok = self.system.process_frame(rgb, depth, ht, lt)
                return est, bool(ok)
            if pose is not None:
                self.system.feed_pose(int(timestamp_ms), pose)
            self.system.feed_rgbd_frame(rgb, depth, int(timestamp_ms))
            return self.system.query_camera_pose(int(timestamp_ms)), True

    def pose(self, timestamp_ms):
        if self.mode == "slam":
            return np.linalg.inv(self.system.world_T_cam)
        return self.system.query_camera_pose(int(timestamp_ms))

    def _volume(self):
        if self.mode == "slam":
            return self.system.volume
        self.system.tsdf.flush()
        return self.system.tsdf.tsdf.snapshot()

    def stats(self):
        vol = self._volume()
        return {
            "frames": self.frames,
            "active_blocks": int(vol.num_active_blocks),
            "voxel_size": vol.cfg.voxel_size,
            "mode": self.mode,
        }

    def query(self, bbox: BoundingCube):
        from ..ops.gather import gather_voxels, to_numpy_records

        return to_numpy_records(gather_voxels(self._volume(), bbox))

    def mesh(self):
        from ..ops.mesh import extract_mesh_chunked, merge_vertices

        tris = extract_mesh_chunked(self._volume())
        return merge_vertices(tris)

    def render(self, fx, img_h, img_w, pose=None, max_depth=10.0):
        import jax.numpy as jnp

        from ..core.geometry import SE3, CameraIntrinsics, CameraParams
        from ..ops.render_fast import splat_render

        if pose is None:
            pose = self.pose(0)
        cam = CameraParams.create(
            CameraIntrinsics.create(fx, fx, (img_w - 1) / 2, (img_h - 1) / 2),
            img_h, img_w,
        )
        res = splat_render(
            self._volume(), cam, SE3.from_matrix(jnp.asarray(pose)), max_depth
        )
        return (
            np.asarray(res.rgba),
            np.asarray(res.normal),
            np.asarray(res.depth),
        )


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def make_server(service: ReconstructionService, host="127.0.0.1", port=0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if urlparse(self.path).path != "/frame":
                return self._send(404, b"not found", "text/plain")
            n = int(self.headers.get("Content-Length", 0))
            data = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
            pose, ok = service.process_frame(
                data["rgb"],
                data["depth"],
                int(data["timestamp_ms"]),
                data["ht"] if "ht" in data else None,
                data["lt"] if "lt" in data else None,
                data["pose"] if "pose" in data else None,
            )
            self._send(200, _npz_bytes(pose=pose, ok=np.asarray(ok)))

        def do_GET(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            if url.path == "/stats":
                self._send(
                    200, json.dumps(service.stats()).encode(), "application/json"
                )
            elif url.path == "/pose":
                t = int(q.get("t", ["0"])[0])
                self._send(200, _npz_bytes(pose=service.pose(t)))
            elif url.path == "/query":
                vals = [float(x) for x in q["bbox"][0].split(",")]
                rec = service.query(BoundingCube(*vals))
                self._send(200, _npz_bytes(records=rec))
            elif url.path == "/mesh":
                verts, faces = service.mesh()
                self._send(200, _npz_bytes(verts=verts, faces=faces))
            elif url.path == "/render":
                fx = float(q.get("fx", ["525"])[0])
                w = int(q.get("w", ["640"])[0])
                h = int(q.get("h", ["360"])[0])
                rgba, normal, depth = service.render(fx, h, w)
                self._send(200, _npz_bytes(rgba=rgba, normal=normal, depth=depth))
            else:
                self._send(404, b"not found", "text/plain")

    return ThreadingHTTPServer((host, port), Handler)
