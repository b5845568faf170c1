"""Test harness: run everything on a virtual 8-device CPU mesh in float64.

Real-TPU behaviour is exercised by bench.py and __graft_entry__.py; unit
tests validate numerics (which need f64) and multi-chip sharding (which needs
multiple devices) on the CPU backend.

IMPORTANT: in this environment a sitecustomize may import jax and establish
the remote-TPU (axon) backend before pytest loads this file, in which case
setting JAX_PLATFORMS here is too late — tests would silently compile on the
remote chip, where f64 linear algebra (LuDecomposition) is unsupported. So
besides setting the env vars we force the platform through jax.config and
clear any already-created backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb  # noqa: E402

    _jeb.clear_backends()
except Exception:  # pragma: no cover - older jax without the API
    pass

assert jax.devices()[0].platform == "cpu", (
    f"test harness failed to pin the CPU backend; got {jax.devices()}"
)
assert len(jax.devices()) == 8, (
    "virtual 8-device CPU mesh not active; XLA_FLAGS was applied too late"
)

jax.config.update("jax_enable_x64", True)
