"""Persistent XLA compilation cache setup.

The full-scale integrate program takes minutes to build through the
remote compiler; caching compiled executables on disk makes every
process after the first start in seconds.  Call enable() before the
first jit dispatch.

CPU caches are machine-specific: XLA:CPU caches AOT machine code keyed
WITHOUT the host's CPU feature set, so an entry compiled on one machine
loads on another with a "machine type doesn't match" warning and
different codegen — observed as 1-ulp FMA divergence between a stale
cached program and a freshly compiled one (breaking the cross-program
bit-equality tests pin), and XLA itself warns it can SIGILL.  TPU
executables come out of the remote compiler keyed by the TPU target and
are host-independent, so they share one directory.
"""

from __future__ import annotations

import hashlib
import os


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _cpu_fingerprint() -> str:
    """Stable per-machine id from the CPU model + feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            lines = sorted({
                ln.strip() for ln in f
                if ln.startswith(("flags", "model name"))
            })
        return hashlib.sha1("\n".join(lines).encode()).hexdigest()[:12]
    except Exception:
        import platform

        return platform.machine() or "unknown"


def resolve_dir(platform_name: str | None = None) -> str:
    """Cache directory for the given (or configured) platform."""
    env = os.environ.get("DSTPU_JAX_CACHE")
    if env:
        return env
    if platform_name is None:
        try:
            import jax

            platform_name = getattr(jax.config, "jax_platforms", None)
        except Exception:
            platform_name = None
        platform_name = platform_name or os.environ.get("JAX_PLATFORMS") or ""
    first = platform_name.split(",")[0].strip().lower()
    if first == "cpu":
        return os.path.join(_repo_root(), ".jax_cache_cpu", _cpu_fingerprint())
    return os.path.join(_repo_root(), ".jax_cache")


def enable(cache_dir: str | None = None, platform_name: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = resolve_dir(platform_name)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # NOTE: tempting to set this to 0 so sub-second eager ops cache
        # too, but a 0-threshold run deadlocked inside the remote-compile
        # client on this stack; 2.0 s is the proven setting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
