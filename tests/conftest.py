"""Test env: force an 8-device virtual CPU mesh before the JAX backend
initializes.

Multi-device sharding tests run on host CPU devices (SURVEY.md §4) so no TPU
pod is needed; single-chip TPU benchmarking happens in bench.py instead.

NOTE: in this environment jax is pre-imported at interpreter startup with
JAX_PLATFORMS=axon, so env vars alone are not enough -- the platform must be
overridden through jax.config before first backend use.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective" not in xla_flags:
    # 8 virtual devices share ONE physical core here; under load a CPU
    # collective rendezvous can exceed the default stuck/terminate timeouts
    # and XLA LOG(FATAL)s the whole pytest process ("Fatal Python error:
    # Aborted" mid-suite, passes in isolation). Give the rendezvous ample
    # time instead of dying.
    xla_flags += (" --xla_cpu_collective_timeout_seconds=1800"
                  " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = xla_flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache for the suite (machine-fingerprinted CPU
# dir, utils/runtime.py): XLA:CPU segfaulted reproducibly (3/3 full-suite
# runs, r5) compiling test_render_nrc's in-program-spp banded render
# AFTER ~150 in-process compiles -- the same program compiles fine in
# isolation, so warming it into the cache makes the fragile compile a
# cache hit on subsequent full-suite runs.
from neuralradiancecaching_tpu.utils import setup_cache  # noqa: E402

setup_cache()
