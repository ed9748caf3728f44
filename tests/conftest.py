"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Standard JAX trick for testing pjit/shard_map without TPU hardware
(SURVEY.md §4): XLA fakes 8 host devices, so every sharding test exercises
real collectives.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
