"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Multi-device sharding tests run on host CPU devices (SURVEY.md §4) so no TPU
pod is needed; single-chip TPU benchmarking happens in bench.py instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset a TPU platform
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
