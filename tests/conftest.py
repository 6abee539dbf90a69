"""Test environment: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU even when the session exports JAX_PLATFORMS=axon (tests must
# not grab the tunneled TPU chip).
os.environ["JAX_PLATFORMS"] = "cpu"
