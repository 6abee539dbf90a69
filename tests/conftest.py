"""Test environment: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon at interpreter startup, so env vars alone are not
enough — the platform must be overridden through jax.config before any
backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

# Machine-fingerprinted CPU cache dir: XLA:CPU AOT entries are not
# portable across hosts (stale entries load with a feature-mismatch
# warning and ulp-different codegen — see utils/cache.py docstring).
from disinfect_slam_tpu.utils import cache  # noqa: E402

cache.enable(platform_name="cpu")
