"""Volume checkpoint / resume.

The reference has no live resume — its persistence is the raw voxel dump
+ trajectory export (SURVEY.md §5 "Checkpoint/resume").  Because the TPU
volume is a plain pytree of arrays, full checkpointing is trivial: this
module saves/loads the complete TSDFVolume (hash entries, free heap,
payloads) so a reconstruction session can stop and resume exactly.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..config import TSDFConfig
from ..core.state import TSDFVolume

_FIELDS = (
    "entry_pos",
    "entry_block",
    "block_table",
    "heap",
    "num_free",
    "tsdf",
    "weight",
    "rgb",
    "prob",
)


def save_volume(path: str, vol: TSDFVolume) -> None:
    """Write the full volume state + config to one .npz file."""
    arrays = {f: np.asarray(getattr(vol, f)) for f in _FIELDS}
    arrays["__config__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(vol.cfg)).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_volume(path: str) -> TSDFVolume:
    data = np.load(path)
    fields = json.loads(bytes(data["__config__"]).decode())
    # JSON has no tuples; restore tuple-typed fields exactly
    if "visible_buckets" in fields:
        fields["visible_buckets"] = tuple(fields["visible_buckets"])
    cfg = TSDFConfig(**fields)
    kwargs = {f: jnp.asarray(data[f]) for f in _FIELDS}
    # forward-compat: checkpoints written before the u8 payload layout
    # (VoxelRGBW parity) stored integral f32 rgb/weight — narrow exactly
    for f, dt in (("weight", jnp.uint8), ("rgb", jnp.uint8)):
        if kwargs[f].dtype != dt:
            kwargs[f] = kwargs[f].astype(dt)
    return TSDFVolume(cfg=cfg, **kwargs)
