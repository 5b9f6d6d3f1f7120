"""Test harness: force an 8-virtual-device CPU platform before jax imports.

Mirrors how the driver validates multi-chip sharding
(``xla_force_host_platform_device_count``); every test sees 8 devices so
mesh/sharding tests run without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image pins jax_platforms to "axon,cpu" (tunneled TPU) outside of env
# vars, so pin the config explicitly — tests must run on the virtual 8-device
# CPU platform.
import jax

jax.config.update("jax_platforms", "cpu")

