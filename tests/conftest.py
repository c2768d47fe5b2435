"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per SURVEY.md §4 the
multi-device story is tested with XLA's host-platform device virtualization.

Note: the environment's axon sitecustomize registers a TPU PJRT plugin and
sets jax_platforms='axon,cpu' at interpreter start, overriding JAX_PLATFORMS
from the environment -- so we must override via jax.config AFTER import.
XLA_FLAGS must still be set before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The real-TPU lane (pytest -m tpu, see tests/test_tpu.py) keeps the live
# backend; everything else runs on the virtual CPU mesh.
if os.environ.get("TPU_OFDM_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
