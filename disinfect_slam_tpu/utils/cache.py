"""Persistent XLA compilation cache setup.

The full-scale integrate program takes minutes to build through the
remote compiler; caching compiled executables on disk makes every
process after the first start in seconds.  Call enable() before the
first jit dispatch.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "DSTPU_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # NOTE: tempting to set this to 0 so sub-second eager ops cache
        # too, but a 0-threshold run deadlocked inside the remote-compile
        # client on this stack; 2.0 s is the proven setting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
