"""Test harness: run everything on CPU with 8 fake devices.

The reference never tested multi-device semantics (SURVEY.md §4); we do, via
XLA's host-platform device-count override — sharding/collective behavior is
identical to a real 8-chip slice modulo speed.
"""

import os

# Force CPU even when the session environment points JAX at a real TPU
# (JAX_PLATFORMS=axon): tests must be hermetic and multi-device.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
