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


def _boot_id() -> str:
    """This machine boot's id, hashed to a 12-hex dir name."""
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            raw = f.read().strip()
    except Exception:
        raw = "noboot"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def _build_fingerprint() -> str:
    """Stable per-(cpu family, jaxlib build) id.

    cpuinfo alone is NOT enough: /root/repo persists across driver
    machines, two VMs of the same family have identical cpuinfo, and a
    different jaxlib/XLA build bakes different target features
    (+prefer-no-scatter etc.) into its AOT entries — observed loading
    with "machine type doesn't match" SIGILL warnings.  Keying on the
    jax+jaxlib versions too keeps foreign-build entries out.  One cold
    compile per (boot, build) (~4 min for the dryrun programs) is the
    accepted price.
    """
    parts = []
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


def _cpu_fingerprint() -> str:
    """(boot, build) composite id, as a two-level relative path.

    The boot id scopes the cache to this machine boot outright —
    /proc/cpuinfo can collide across same-family VMs while their XLA
    target-feature detection still differs, and a poisoned entry can
    crash the driver's dryrun contract.  The build id is a SEPARATE
    path level so the scrub (below) can reclaim dead boots without
    touching a live sibling venv's cache on THIS boot (ADVICE r3: two
    jaxlib builds on one boot must coexist, not rmtree each other)."""
    return os.path.join(_boot_id(), _build_fingerprint())


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
    """Remove DEAD BOOTS' CPU cache trees (cache_dir is
    .jax_cache_cpu/<boot>/<build>).

    The repo directory outlives the machine, so orphaned per-boot dirs
    would otherwise pile up (~30 MB each).  Only boot-level siblings are
    scrubbed: every process on this boot shares one boot id, so a
    different boot dir is provably dead, while a different BUILD dir
    under the CURRENT boot may belong to a live process in another venv
    (ADVICE r3) and is left alone.
    """
    boot_dir = os.path.dirname(cache_dir)
    parent = os.path.dirname(boot_dir)
    if os.path.basename(parent) != ".jax_cache_cpu":
        return
    try:
        import shutil

        for name in os.listdir(parent):
            p = os.path.join(parent, name)
            if p != boot_dir and os.path.isdir(p):
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
