"""Test harness: run everything on a virtual 8-device CPU mesh in float64.

Real-TPU behaviour is exercised by bench.py and __graft_entry__.py; unit
tests validate numerics (which need f64) and multi-chip sharding (which needs
multiple devices) on the CPU backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
