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

# persistent compile cache: the slow tier's big programs (the fused train
# step, 8-way SPMD) dominate suite runtime on this 1-core CPU — cache them
# across runs so repeat suites are minutes, not tens of minutes
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
