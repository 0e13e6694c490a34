"""Test configuration: force an 8-device virtual CPU mesh (the standard JAX
way to exercise pjit/shard_map sharding without a real TPU slice — SURVEY §4).

Note: this image registers a TPU ('axon') PJRT plugin from sitecustomize at
interpreter start, so JAX_PLATFORMS alone is not enough — we also flip the
default platform through jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip XLA recompiles
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
