"""Force tests onto a virtual 8-device CPU platform.

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the tunneled TPU), so env vars set here are too late —
we must override through jax.config instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
