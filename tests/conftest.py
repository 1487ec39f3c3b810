"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the standard way to exercise
TPU-style multi-device sharding without a pod). The axon PJRT plugin
registers itself in sitecustomize and overrides JAX_PLATFORMS, so the
platform must be forced through jax.config before any backend is
initialized. Set PCT_TEST_PLATFORM=tpu to run against the real chip.
"""

import os

platform = os.environ.get("PCT_TEST_PLATFORM", "cpu")
if platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
