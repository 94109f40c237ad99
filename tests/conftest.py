"""Test harness config: CPU backend with 8 virtual devices, float64 numerics.

The container's sitecustomize imports jax and registers the axon TPU plugin before
pytest starts, so env vars alone cannot steer the platform — we must set
``jax_platforms`` through the config API before any backend is initialized.

Multi-chip sharding tests run on the virtual CPU mesh (the standard
``xla_force_host_platform_device_count`` pattern); numerics tests use x64 to compare
against float64 NumPy oracles.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# TRAJOPT_TEST_TPU=1 leaves the attached accelerator active (f32) so the
# device-only engine tests (tests/test_tpu.py) can run:
#   TRAJOPT_TEST_TPU=1 python -m pytest tests/test_tpu.py -q
if os.environ.get("TRAJOPT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
