"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is imported anywhere, so the env vars are set at
conftest import time (pytest imports conftest first).
"""

import os

# force-override: the session environment pins JAX_PLATFORMS=axon (the
# remote TPU tunnel) and sitecustomize.py imports jax at interpreter
# start, so plain env edits are too late — update the jax config too.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (multi-process spawns, interpreted-"
        "Pallas real-image runs); deselected by default — run the full "
        "pass with `pytest -m 'slow or not slow'`")


def pytest_collection_modifyitems(config, items):
    """Keep the default edit-loop run fast: tests marked ``slow`` are
    skipped unless an explicit -m expression selects them. The full
    pass is `pytest -m "slow or not slow"` (documented in README)."""
    if config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow; run with -m 'slow or not slow' for the full pass")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def reference_dir():
    return REFERENCE_DIR
