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


# ---- test tiers (pytest.ini documents the three; VERDICT r4 weak #5) ----
# Modules whose tests build/compile full G/D models or jitted train steps.
# They are auto-marked `compile` (tier 2) so the default run (tier 1) stays
# within its <=5-minute budget on this 1-core host.  Explicitly slow-marked
# tests remain tier 3 regardless of module.
COMPILE_MODULES = {
    "test_models", "test_ops", "test_norm_stats", "test_train_step",
    "test_pass_batching", "test_parallel", "test_tp_parity",
    "test_flagship_tp", "test_full_step_parity", "test_eval", "test_vgg",
    "test_sampler_checkpoint", "test_integration_images",
    "test_entry_and_dryrun", "test_cross_topology_ckpt", "test_legacy",
    "test_pallas_kernels", "test_parity_conv", "test_convert_weights",
    "test_torch_import", "test_warm_start", "test_stem_kernels",
    "test_run_determinism",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in COMPILE_MODULES:
            item.add_marker(pytest.mark.compile)


def pytest_configure(config):
    # fail fast if the CPU mesh didn't materialize
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()}"
    )
    assert len(jax.devices()) == 8, f"expected 8 virtual devices, got {len(jax.devices())}"
