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

# NOTE: do NOT enable the persistent compilation cache here.  This image
# routes compiles through a remote compile service (PALLAS_AXON_REMOTE_COMPILE)
# whose host has different CPU features; cached CPU AOT executables then run
# miscompiled locally and silently corrupt numerics (observed: LayerNorm
# returning garbage after a cache hit).
