"""Test configuration: force a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin and pins
JAX_PLATFORMS=axon, so the env var alone can't select CPU; we override via
jax.config before the backend is initialized. Sharding/pjit logic is
validated on XLA's host-platform virtual devices (multi-chip TPU hardware is
not available in CI). Set TUBER_TEST_TPU=1 to run the suite on the real chip.
"""

import os

if os.environ.get("TUBER_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules whose tests run multi-minute on a single core: real 2-process
# multihost runs, e2e training loops, the composed torch-vs-jax pipeline,
# and the DPxTPxSP engine parity sweeps. `pytest -m "not slow"` (or
# `make test-fast`) skips them; run `make test-all` for the full suite.
SLOW_MODULES = {
    "test_multihost",
    "test_e2e",
    "test_engine",
    "test_composed_pipeline",
    # pipeline-parallel exactness + checkpoint-layout roundtrips run the
    # tiny model many times over shard_map meshes (~2 min on one core)
    "test_pipeline",
    # Pallas kernels run in (slow) interpret mode on the CPU-only CI mesh;
    # they execute for real under TUBER_TEST_TPU=1
    "test_pallas_stem",
    "test_pallas_stage",
    "test_pallas_bottleneck",
    "test_pallas_depthwise",
    "test_lfb_learning",
    # real CSN-50 at IMG 128/T=16 over a 4-device mesh (~minutes on CPU)
    "test_flagship_shapes",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
