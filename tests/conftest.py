"""Test env: force a CPU backend with 8 virtual devices BEFORE jax imports.

SURVEY.md §4: multi-chip logic must be testable without a pod — a virtual
8-device CPU mesh exercises the same shard_map/pjit code paths.  Pallas kernels
run in interpreter mode on CPU (spray_tpu.kernels picks that automatically).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")  # axon plugin ignores JAX_PLATFORMS
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
