"""Test configuration: force an 8-device virtual CPU mesh.

Must set XLA flags before jax is imported anywhere in the test session so
sharding tests can exercise real multi-device paths without TPU hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: model-forward compiles dominate test time
# on CPU; cache them across runs.
import jax  # noqa: E402

# The TPU plugin rewrites JAX_PLATFORMS=cpu to "axon,cpu", silently putting
# tests on the (single-tenant!) TPU; the explicit config update wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run @pytest.mark.slow suites (full-model parity, "
        "multi-process multihost, L-scale compiles) — the heavy lane; "
        "without it `pytest -q` is the fast default profile (<5 min)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or config.getoption("-m"):
        # explicit -m overrides the gate (e.g. `-m slow` to run ONLY them)
        return
    skip = pytest.mark.skip(reason="slow suite (run with --slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
