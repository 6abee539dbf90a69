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
    """Stable per-(machine, jaxlib) id.

    cpuinfo alone is NOT enough: /root/repo persists across driver
    machines, two VMs of the same family have identical cpuinfo, and a
    different jaxlib/XLA build bakes different target features
    (+prefer-no-scatter etc.) into its AOT entries — observed loading
    with "machine type doesn't match" SIGILL warnings.  Keying on the
    jax+jaxlib versions too keeps foreign-build entries out, and the
    kernel boot id scopes the cache to this machine boot outright —
    /proc/cpuinfo can collide across same-family VMs while their XLA
    target-feature detection still differs, and a poisoned entry can
    crash the driver's dryrun contract.  One cold compile per machine
    (~4 min for the dryrun programs) is the accepted price.
    """
    parts = []
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read().strip())
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            parts.extend(sorted({
                ln.strip() for ln in f
                if ln.startswith(("flags", "model name"))
            }))
    except Exception:
        import platform

        parts.append(platform.machine() or "unknown")
    try:
        import jax

        parts.append(f"jax={jax.__version__}")
        import jaxlib

        parts.append(f"jaxlib={getattr(jaxlib, '__version__', '?')}")
    except Exception:
        pass
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:12]


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


def _scrub_stale_siblings(cache_dir: str) -> None:
    """Remove other fingerprints' CPU cache dirs.

    The repo directory outlives the machine, so orphaned per-boot dirs
    would otherwise pile up (~30 MB each).  Every live process on this
    boot resolves to the same fingerprint, so siblings are dead.
    """
    parent = os.path.dirname(cache_dir)
    if os.path.basename(parent) != ".jax_cache_cpu":
        return
    try:
        import shutil

        for name in os.listdir(parent):
            p = os.path.join(parent, name)
            if p != cache_dir and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
    except Exception:
        pass


def enable(cache_dir: str | None = None, platform_name: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = resolve_dir(platform_name)
        _scrub_stale_siblings(cache_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # NOTE: tempting to set this to 0 so sub-second eager ops cache
        # too, but a 0-threshold run deadlocked inside the remote-compile
        # client on this stack; 2.0 s is the proven setting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
