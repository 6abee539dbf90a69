"""YAML config parsing: intrinsics, depth factor, extrinsics.

Mirrors utils/config_reader.hpp:13-30 and the camera YAML layout in
configs/*.yaml (Camera.fx/.fy/.cx/.cy, depthmap_factor, Extrinsics as a
row-major 4x4).
"""

from __future__ import annotations

import numpy as np
import yaml


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def get_intrinsics(config: dict) -> tuple[float, float, float, float]:
    """(fx, fy, cx, cy) from Camera.* keys (config_reader.hpp:13-17)."""
    return (
        float(config["Camera.fx"]),
        float(config["Camera.fy"]),
        float(config["Camera.cx"]),
        float(config["Camera.cy"]),
    )


def get_depth_factor(config: dict) -> float:
    """depthmap_factor (config_reader.hpp:19-22)."""
    return float(config["depthmap_factor"])


def get_extrinsics(config: dict) -> np.ndarray:
    """4x4 cam_T_posecam from the row-major 'Extrinsics' list
    (config_reader.hpp:24-30); identity when absent (offline.cc:40-43)."""
    ext = config.get("Extrinsics")
    if ext is None:
        return np.eye(4, dtype=np.float32)
    return np.asarray(ext, np.float32).reshape(4, 4)


def get_image_size(config: dict) -> tuple[int, int]:
    """(height, width) from Camera.rows / Camera.cols."""
    return int(config["Camera.rows"]), int(config["Camera.cols"])
