"""Test harness config: run on CPU with 8 virtual devices.

Multi-chip sharding tests run against a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the TPU-native answer to
"test multi-node without a cluster" (SURVEY.md §4). Must be set before jax
initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("FASTDM_PALLAS_INTERPRET", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# xla_force_host_platform_device_count is ignored when the axon TPU plugin is
# installed; jax_num_cpu_devices (together with jax_platforms=cpu, set via
# config — the env var alone is not honored) is the reliable knob.
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

# Pallas kernels honor FASTDM_PALLAS_INTERPRET (set above) and run through the
# lightweight Pallas interpreter on CPU; on a real TPU run, unset it.
