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

# NOTE: the persistent compile cache is deliberately NOT enabled here.
# XLA:CPU persistent-cache reloads corrupt executables (nondeterministic
# native aborts — see utils/compile_cache.py), so compile_cache.enable() is
# a no-op on the CPU backend this suite forces (pinned by
# tests/test_utils.py::test_compile_cache_disabled_on_cpu); the suite pays
# fresh compiles by design.


def pytest_configure(config):
    # fail fast if the CPU mesh didn't materialize
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()}"
    )
    assert len(jax.devices()) == 8, f"expected 8 virtual devices, got {len(jax.devices())}"
