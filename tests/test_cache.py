"""Persistent-compile-cache keying and scrubbing (utils/cache.py).

The CPU cache must be scoped to (machine boot, jaxlib build): the repo
directory outlives the driver machine, /proc/cpuinfo collides across
same-family VMs, and a foreign XLA:CPU AOT entry loads with SIGILL
warnings and ulp-different codegen.  The two ids are SEPARATE path
levels (.jax_cache_cpu/<boot>/<build>) so reclaiming dead boots never
touches a live sibling venv's cache on this boot.  Pure-unit: no jit
dispatch.
"""

import os

from disinfect_slam_tpu.utils import cache


def test_cpu_dir_is_fingerprinted_under_repo():
    d = cache.resolve_dir("cpu")
    boot = os.path.dirname(d)
    parent = os.path.dirname(boot)
    assert os.path.basename(parent) == ".jax_cache_cpu"
    assert len(os.path.basename(d)) == 12  # build id
    assert len(os.path.basename(boot)) == 12  # boot id


def test_fingerprint_includes_boot_id(monkeypatch):
    fp1 = cache._cpu_fingerprint()
    real_open = open

    def fake_open(path, *a, **k):
        if path == "/proc/sys/kernel/random/boot_id":

            class F:
                def __enter__(self):
                    return self

                def __exit__(self, *exc):
                    return False

                def read(self):
                    return "00000000-feed-face-0000-000000000000\n"

            return F()
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", fake_open)
    fp2 = cache._cpu_fingerprint()
    assert fp1 != fp2, "boot id must key the fingerprint"
    # ... by changing the BOOT level only; the build level is boot-free
    assert os.path.basename(fp1) == os.path.basename(fp2)
    assert os.path.dirname(fp1) != os.path.dirname(fp2)


def test_tpu_dir_is_shared_and_never_scrubbed(tmp_path, monkeypatch):
    assert cache.resolve_dir("axon").endswith(".jax_cache")
    # scrub only operates inside a .jax_cache_cpu grandparent
    other = tmp_path / "keepme"
    other.mkdir()
    cache._scrub_stale_siblings(str(tmp_path / "bootdir" / "current"))
    assert other.exists()


def test_scrub_removes_only_dead_boots(tmp_path):
    parent = tmp_path / ".jax_cache_cpu"
    cur = parent / "aaaaaaaaaaaa" / "bbbbbbbbbbbb"
    # a second build (another venv) on the SAME boot: must survive
    sibling_build = parent / "aaaaaaaaaaaa" / "cccccccccccc"
    dead_boot = parent / "dddddddddddd"
    cur.mkdir(parents=True)
    sibling_build.mkdir()
    dead_boot.mkdir()
    (dead_boot / "entry").write_text("x")
    cache._scrub_stale_siblings(str(cur))
    assert cur.exists()
    assert sibling_build.exists(), "live-boot sibling build must survive"
    assert not dead_boot.exists(), "dead boot must be reclaimed"


def test_env_override_wins(monkeypatch, tmp_path):
    monkeypatch.setenv("DSTPU_JAX_CACHE", str(tmp_path))
    assert cache.resolve_dir("cpu") == str(tmp_path)
