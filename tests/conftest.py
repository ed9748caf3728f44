"""Test configuration: force an 8-device virtual CPU mesh.

Standard JAX trick for testing pjit/shard_map without TPU hardware
(SURVEY.md §4): XLA fakes 8 host devices, so every sharding test exercises
real collectives.

Note: the ambient environment presets JAX_PLATFORMS=axon (real TPU) and a
sitecustomize imports jax before conftest runs, so env vars alone are too
late — we must also flip the config flags before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the suite's wall-clock is dominated by XLA
# compiles of the fused train step (VERDICT r1 weak #4); cached re-runs of
# identical programs skip compilation entirely.
from dwcgan_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()


def pytest_configure(config):
    # fail fast if the CPU mesh didn't materialize
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()}"
    )
    assert len(jax.devices()) == 8, f"expected 8 virtual devices, got {len(jax.devices())}"
