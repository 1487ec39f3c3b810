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

# skip the CLI's bounded device-reachability probe (a subprocess jax
# import per --device/--mesh CLI invocation): the suite pins the cpu
# platform, which is always "reachable". The probe's own behavior is
# covered by monkeypatched tests in test_resilience.py.
os.environ.setdefault("PCT_DEVICE_PROBE_S", "0")
