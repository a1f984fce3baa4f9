"""Test harness: run everything on CPU with 8 fake devices.

The reference never tested multi-device semantics (SURVEY.md §4); we do, via
XLA's host-platform device-count override — sharding/collective behavior is
identical to a real 8-chip slice modulo speed.
"""

import os

# Force CPU even when the session environment points JAX at a real TPU
# (JAX_PLATFORMS=axon): tests must be hermetic and multi-device.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep sitecustomize from grabbing the TPU
os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: fail fast to fallback
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize (axon TPU plugin) sets jax_platforms directly at interpreter
# start; backend init is lazy, so overriding the config here still wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, (
    "test harness expects 8 fake CPU devices; got "
    f"{jax.device_count()} on {jax.default_backend()}"
)
