"""Test configuration: force an 8-device virtual CPU mesh (the standard JAX
way to exercise pjit/shard_map sharding without a real TPU slice — SURVEY §4).

Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Keep test compiles fast and deterministic.
os.environ.setdefault("JAX_ENABLE_X64", "0")
